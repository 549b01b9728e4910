"""Pallas TPU kernel: fused SDF-MLP evaluation for the ray sampler.

The error-bounded sampler evaluates the 9-layer weight-normalized SDF MLP
on ~6.5e5 points per training step with no gradient (SURVEY.md §3.2 hot
loop). Under plain XLA every layer's activations round-trip through HBM
(~2.4 GB per round at f32); this kernel keeps the full weight set
(~1.2 MB in bf16) and the per-tile activations resident in VMEM and runs
the whole layer chain per point-tile, so HBM traffic drops to the input
points and output sdf values only.

Scope: the canonical architecture (8 x 256 hidden, skip concat at layer 4,
positional encoding multires 6, softplus beta=100, final layer sliced to
the sdf channel). ``supports_fused_sdf`` guards the fast path; anything
else falls back to the reference XLA implementation in fields/mlp.py.
The positional encoding and the bounding-sphere clamp stay in XLA (they
fuse with neighbors and the encoding is phase-sensitive in bf16).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mlp import ImplicitNetConfig
from ..core.embedder import positional_encoding, encoding_dim

TILE = 1024


def supports_fused_sdf(cfg: ImplicitNetConfig) -> bool:
    return (
        tuple(cfg.dims) == (256,) * 8
        and tuple(cfg.skip_in) == (4,)
        and cfg.multires == 6
        and cfg.d_in == 3
        and not cfg.inside_out
    )


def _effective_weights(params, cfg: ImplicitNetConfig, dtype=jnp.bfloat16):
    """Resolve weight norm -> transposed (in, out) matrices, cast, and
    slice the final layer to the sdf channel."""
    ws, bs = [], []
    n_layers = len(cfg.layer_dims())
    for l in range(n_layers - 1):
        p = params[f"lin{l}"]
        if "v" in p:
            v = p["v"]
            w = p["g"][:, None] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
        else:
            w = p["w"]
        b = p["b"]
        if l == n_layers - 2:
            w = w[:1]  # sdf channel only
            b = b[:1]
        ws.append(w.T.astype(dtype))  # (in, out)
        bs.append(b.astype(jnp.float32))
    return ws, bs


def _kernel(x_ref, *refs):
    ws = refs[:9]
    bs = refs[9:18]
    out_ref = refs[18]

    def mm(h, w, b):
        return (
            jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]
        )

    def softplus100(h):
        return jax.nn.softplus(100.0 * h) / 100.0

    inp = x_ref[:]  # (TILE, 39) bf16
    h = inp
    for l in range(4):
        h = softplus100(mm(h, ws[l], bs[l])).astype(inp.dtype)
    # skip concat (reference neat_wfr_rend_a.py:87-88)
    h = jnp.concatenate([h, inp], axis=-1) * (1.0 / math.sqrt(2))
    for l in range(4, 8):
        h = softplus100(mm(h, ws[l], bs[l])).astype(inp.dtype)
    out_ref[:] = mm(h, ws[8], bs[8])  # (TILE, 1) f32


def _fused_sdf_impl(
    params,
    points: jnp.ndarray,
    cfg: ImplicitNetConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Clamped SDF values (N,) for (N, 3) points via the fused kernel."""
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except ImportError:  # pragma: no cover
        vmem = None

    n = points.shape[0]
    emb_dim = encoding_dim(cfg.multires, 3)  # 39
    emb = positional_encoding(points, cfg.multires).astype(jnp.bfloat16)
    pad = (-n) % TILE
    if pad:
        emb = jnp.concatenate([emb, jnp.zeros((pad, emb_dim), emb.dtype)], axis=0)
    n_padded = emb.shape[0]

    ws, bs = _effective_weights(params, cfg)

    def spec(block=None, im=None):
        kwargs = {"memory_space": vmem} if vmem is not None else {}
        if block is None:
            return pl.BlockSpec(**kwargs)
        return pl.BlockSpec(block, im, **kwargs)

    grid = (n_padded // TILE,)
    in_specs = [spec((TILE, emb_dim), lambda i: (i, 0))]
    in_specs += [spec() for _ in range(18)]
    out_spec = spec((TILE, 1), lambda i: (i, 0))

    from neat_tpu.ops._vma import out_struct

    sdf = pl.pallas_call(
        _kernel,
        out_shape=out_struct((n_padded, 1), jnp.float32, emb),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(emb, *ws, *bs)
    sdf = sdf[:n, 0]

    # bounding-sphere clamp in XLA (reference neat_wfr_rend_a.py:115-118)
    if cfg.sdf_bounding_sphere > 0.0:
        sphere = cfg.sphere_scale * (
            cfg.sdf_bounding_sphere - jnp.linalg.norm(points, axis=-1)
        )
        sdf = jnp.minimum(sdf, sphere)
    return sdf


# The kernel is used ONLY for the sampler's z proposals, which are
# autodiff constants by design (the reference evaluates them under
# torch.no_grad()). pallas_call has no linearization rule, so declare a
# zero tangent instead of letting grad tracing fail.
_fused_custom = jax.custom_jvp(_fused_sdf_impl, nondiff_argnums=(2, 3))


@_fused_custom.defjvp
def _fused_sdf_jvp(cfg, interpret, primals, tangents):
    params, points = primals
    out = _fused_sdf_impl(params, points, cfg, interpret)
    return out, jnp.zeros_like(out)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_sdf_eval(
    params,
    points: jnp.ndarray,
    cfg: ImplicitNetConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    return _fused_custom(params, points, cfg, interpret)
