from .samplers import (
    UniformSamplerConfig,
    ErrorBoundSamplerConfig,
    uniform_z_vals,
    error_bound_z_vals,
    sample_pdf,
)
