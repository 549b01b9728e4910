from .finalize import (
    wireframe_recon,
    initial_recon,
    visibility_checking,
    newton_refine_junctions,
    wireframe_from_lines_and_junctions,
)
