from .embedder import positional_encoding, encoding_dim
from .density import LaplaceDensityParams, laplace_density, get_beta
from .camera import (
    lift,
    get_camera_params,
    project2d,
    quat_to_rot,
    rot_to_quat,
    get_sphere_intersections,
    psnr,
)
from .render import volume_rendering_weights, render_weights_from_density
