from .model_io import (
    Camera,
    Image,
    Point3D,
    read_model,
    write_model,
    qvec2rotmat,
    rotmat2qvec,
)
from .convert import colmap_to_cameras_npz, normalize_cameras
