from .wireframe import WireframeGraph
from .encodels import encode_line_attraction, attraction_support
from .datasets import SceneData, load_blender_scene, load_dtu_scene, load_scene
