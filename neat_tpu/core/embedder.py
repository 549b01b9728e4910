"""NeRF-style sinusoidal positional encoding.

Behavioral parity with the reference embedder (reference:
code/model/embedder.py:5-50): include-input, log-sampled frequency bands
``2**linspace(0, multires-1, multires)``, and per-frequency [sin, cos]
ordering, concatenated along the last axis.

TPU note: the encoding is a pure elementwise op; XLA fuses it into the first
matmul of the consuming MLP, so there is no separate kernel cost.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def encoding_dim(multires: int, input_dims: int = 3) -> int:
    """Output dimension of :func:`positional_encoding`."""
    if multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Encode ``x`` (..., D) -> (..., D * (1 + 2*multires)).

    Layout matches the reference: ``[x, sin(2^0 x), cos(2^0 x), ...,
    sin(2^{m-1} x), cos(2^{m-1} x)]``.
    """
    if multires <= 0:
        return x
    # log-sampled bands: 2 ** linspace(0, multires-1, multires). Computed
    # as trace-time numpy constants so the encoding lowers inside Pallas
    # kernels too (Mosaic has no float iota).
    freqs = jnp.asarray(
        2.0 ** np.linspace(0.0, multires - 1, multires), dtype=x.dtype
    )
    # (..., 1, D) * (M, 1) -> (..., M, D)
    xb = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # interleave per frequency: sin_f, cos_f
    sc = jnp.concatenate([sin[..., None, :], cos[..., None, :]], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * multires * x.shape[-1])
    return jnp.concatenate([x, sc], axis=-1)
