from .eval_abc import eval_abc
from .eval_dtu import eval_dtu_mesh, eval_dtu_points, downsample_points
from .eval_lsr import eval_wfr_junctions, eval_lsr_lines, resample_lines
from .render_eval import render_views_psnr, export_scene_mesh
