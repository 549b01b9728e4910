from .fused_sdf import fused_sdf_eval, supports_fused_sdf
