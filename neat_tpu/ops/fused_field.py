"""Pallas TPU kernel: fused NEAT field evaluation (forward + backward).

The training step's dominant cost is the main differentiated field pass:
implicit SDF MLP + inner spatial gradient + rendering MLP + attraction MLP
on the R*S ~ 1e5 point batch. Under plain XLA every layer activation
round-trips HBM and the step is pinned at the v5e HBM roof (RESULTS.md
roofline: 820 GB/s at f32, 812 GB/s at bf16 — bandwidth-bound either way).

This kernel evaluates the whole pipeline per point-tile with all weights
and activations resident in VMEM, so HBM traffic collapses to the points,
view dirs, and the four small outputs. The 256-wide feature vector — the
single largest XLA-path tensor — never leaves VMEM at all.

Design notes:
  * The per-tile math is a pure jnp function (`_field_math`) over
    weight-norm-RESOLVED parameters; the kernels trace `jax.vjp` of it
    directly, so the backward (including the second-order terms from
    differentiating through the inner SDF gradient) is derived by jax
    autodiff inside the kernel — no hand-written adjoints to get wrong.
  * Weight-norm resolution (g * v / ||v||) happens OUTSIDE the kernel in
    XLA on the tiny (256, 256) tensors; jax autodiff composes it with the
    kernel's custom_vjp.
  * Parameter gradients are accumulated across the grid in VMEM output
    blocks with a constant index_map (TPU grid steps run sequentially, so
    += accumulation is race-free) and stored f32.
  * compute dtype bf16 with f32 accumulation mirrors the XLA
    field_compute_dtype="bfloat16" path; f32 mode exists for validation.

Parity scope: the canonical architecture only (guarded by
``supports_fused_field``) — implicit 8x256/skip-4/multires-6 (reference
neat_wfr_rend_a.py:14-137), rendering IDR 4x256/multires_view-4
(:199-255), attraction IDR 4x256 offsets head (:139-197).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mlp import ImplicitNetConfig, RenderNetConfig
from ..core.embedder import positional_encoding, encoding_dim

TILE = 256
# the backward kernel's nested-vjp residuals need ~27 MB of scoped VMEM at
# tile 256 / f32; v5e has 128 MB of VMEM, so raise the scoped limit past
# the 16 MB default instead of shrinking the tile
BWD_VMEM_LIMIT = 100 * 1024 * 1024

# Validated ceiling for DIFFERENTIATED fused-field calls. Measured on a
# real v5e (2026-08-20, docs/batch_frontier_r5.md): both backward kernels
# (stash and recompute) hard-fault the TPU worker at 802,816 points
# (8192 rays x 98 samples, grid 3136) while 401,408 points (4096 rays,
# grid 1568) trains correctly; the FORWARD kernels run fine at 802,816.
# Training above this ceiling must refuse at trace time instead of
# crashing the worker (neat.forward enforces it).
MAX_FUSED_FIELD_BWD_POINTS = 4096 * 98

N_IMPLICIT_LAYERS = 9
N_HEAD_LAYERS = 5  # rendering / attraction MLPs: 4 hidden + 1 out


def supports_fused_field(
    icfg: ImplicitNetConfig, rcfg: RenderNetConfig, acfg: RenderNetConfig
) -> bool:
    return (
        tuple(icfg.dims) == (256,) * 8
        and tuple(icfg.skip_in) == (4,)
        and icfg.multires == 6
        and icfg.d_in == 3
        and icfg.d_out == 1
        and icfg.feature_vector_size == 256
        and not icfg.inside_out
        and rcfg.mode == "idr"
        and tuple(rcfg.dims) == (256,) * 4
        and rcfg.d_out == 3
        and acfg.mode == "idr"
        and tuple(acfg.dims) == (256,) * 4
        and acfg.d_out == 6
        and acfg.multires_view == 0
    )


def _resolve_weights(params: Dict[str, Any], n_layers: int) -> List[Tuple]:
    """Weight-norm resolution -> [(W (in, out), b (out,)), ...] in f32.
    Differentiable; runs in XLA outside the kernel."""
    out = []
    for l in range(n_layers):
        p = params[f"lin{l}"]
        if "v" in p:
            v = p["v"]
            w = p["g"][:, None] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
        else:
            w = p["w"]
        out.append((w.T, p["b"]))
    return out


def _flatten_eff(params: Dict[str, Any]):
    """Resolve all three nets into a flat tuple of arrays (kernel operands)."""
    iw = _resolve_weights(params["implicit"], N_IMPLICIT_LAYERS)
    rw = _resolve_weights(params["rendering"], N_HEAD_LAYERS)
    aw = _resolve_weights(params["attraction"], N_HEAD_LAYERS)
    flat = []
    for w, b in iw + rw + aw:
        flat.append(w)
        flat.append(b[None, :])  # biases 2-D: TPU VMEM wants >= 2 dims
    return tuple(flat)


def _unflatten_eff(flat) -> Tuple[List, List, List]:
    pairs = [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]
    iw = pairs[:N_IMPLICIT_LAYERS]
    rw = pairs[N_IMPLICIT_LAYERS : N_IMPLICIT_LAYERS + N_HEAD_LAYERS]
    aw = pairs[N_IMPLICIT_LAYERS + N_HEAD_LAYERS :]
    return iw, rw, aw


def _softplus100(x):
    return jax.nn.softplus(100.0 * x) / 100.0


def _pe(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Positional encoding with the embedder's exact layout
    ([x, sin f0 x, cos f0 x, ...]) written as a flat concat loop — no 3-D
    intermediates, so it lowers cleanly inside Mosaic kernels."""
    if multires <= 0:
        return x
    outs = [x]
    for k in range(multires):
        f = float(2.0**k)
        outs.append(jnp.sin(f * x))
        outs.append(jnp.cos(f * x))
    return jnp.concatenate(outs, axis=-1)


def _field_math(
    flat_eff,
    x: jnp.ndarray,
    d: jnp.ndarray,
    icfg: ImplicitNetConfig,
    rcfg: RenderNetConfig,
    compute_dtype,
):
    """Pure per-tile math: (sdf (T,1), grads (T,3), rgb (T,3), att (T,6)).

    ``att`` is the raw 6-dim offset head output; endpoints = x +/- offsets
    are assembled by the caller (attraction_forward semantics,
    reference neat_wfr_rend_a.py:195).
    """
    iw, rw, aw = _unflatten_eff(flat_eff)
    cd = compute_dtype

    def implicit_with_clamp(pts):
        e = _pe(pts, icfg.multires)
        h = e.astype(cd)
        e_cd = h
        for l in range(N_IMPLICIT_LAYERS):
            if l == 4:
                h = jnp.concatenate([h, e_cd], axis=-1) * (1.0 / math.sqrt(2))
            w, b = iw[l]
            h = jnp.dot(h, w.astype(cd), preferred_element_type=jnp.float32) + b
            if l < N_IMPLICIT_LAYERS - 1:
                h = _softplus100(h).astype(cd)
        sdf_raw = h[..., :1]
        feats = h[..., 1:]
        if icfg.sdf_bounding_sphere > 0.0:
            sphere = icfg.sphere_scale * (
                icfg.sdf_bounding_sphere
                - jnp.linalg.norm(pts, axis=-1, keepdims=True)
            )
            sdf = jnp.minimum(sdf_raw, sphere)
        else:
            sdf = sdf_raw
        return sdf, feats

    # inner spatial gradient (reference get_outputs: grad of the clamped sdf)
    (sdf, feats), inner_vjp = jax.vjp(implicit_with_clamp, x)
    (grads,) = inner_vjp((jnp.ones_like(sdf), jnp.zeros_like(feats)))

    def head(weights, inp):
        h = inp.astype(cd)
        for l in range(N_HEAD_LAYERS):
            w, b = weights[l]
            h = jnp.dot(h, w.astype(cd), preferred_element_type=jnp.float32) + b
            if l < N_HEAD_LAYERS - 1:
                h = jnp.maximum(h, 0.0).astype(cd)
        return h

    d_enc = _pe(d, rcfg.multires_view) if rcfg.multires_view > 0 else d
    feats_f = feats.astype(jnp.float32)
    grads_f = grads.astype(jnp.float32)
    r_in = jnp.concatenate([x, d_enc, grads_f, feats_f], axis=-1)
    rgb = jax.nn.sigmoid(head(rw, r_in))
    a_in = jnp.concatenate([x, d, grads_f, feats_f], axis=-1)
    att = head(aw, a_in)
    return sdf, grads_f, rgb, att


# ---------------------------------------------------------------------------
# pallas kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(icfg, rcfg, compute_dtype, x_ref, d_ref, *refs):
    n_eff = 2 * (N_IMPLICIT_LAYERS + 2 * N_HEAD_LAYERS)
    eff = tuple(r[:] for r in refs[:n_eff])
    sdf_ref, grads_ref, rgb_ref, att_ref = refs[n_eff:]
    sdf, grads, rgb, att = _field_math(
        eff, x_ref[:], d_ref[:], icfg, rcfg, compute_dtype
    )
    sdf_ref[:] = sdf.astype(jnp.float32)
    grads_ref[:] = grads
    rgb_ref[:] = rgb.astype(jnp.float32)
    att_ref[:] = att.astype(jnp.float32)


def _bwd_kernel(icfg, rcfg, compute_dtype, x_ref, d_ref, *refs):
    import jax.experimental.pallas as pl

    n_eff = 2 * (N_IMPLICIT_LAYERS + 2 * N_HEAD_LAYERS)
    eff = tuple(r[:] for r in refs[:n_eff])
    c_sdf, c_grads, c_rgb, c_att = (r[:] for r in refs[n_eff : n_eff + 4])
    out_refs = refs[n_eff + 4 :]
    dx_ref, dd_ref = out_refs[:2]
    deff_refs = out_refs[2:]

    # Under shard_map the cotangent ref reads keep the outer trace's vma
    # while the recomputed primal outputs get this nested context's set;
    # jax.vjp rejects the aval mismatch. Align each cotangent to the
    # primal output aval (no-op outside shard_map) — ops/_vma.py.
    from neat_tpu.ops._vma import align_cotangent

    fn = lambda e, x, d: _field_math(e, x, d, icfg, rcfg, compute_dtype)
    x_in, d_in = x_ref[:], d_ref[:]
    out_avals = jax.eval_shape(fn, eff, x_in, d_in)
    cots = tuple(
        align_cotangent(c, a)
        for c, a in zip((c_sdf, c_grads, c_rgb, c_att), out_avals)
    )
    _, vjp_fn = jax.vjp(fn, eff, x_in, d_in)
    deff, dx, dd = vjp_fn(cots)
    dx_ref[:] = dx.astype(jnp.float32)
    dd_ref[:] = dd.astype(jnp.float32)

    first = pl.program_id(0) == 0
    for r, g in zip(deff_refs, deff):
        g32 = g.astype(jnp.float32)

        @pl.when(first)
        def _(r=r, g32=g32):
            r[:] = g32

        @pl.when(jnp.logical_not(first))
        def _(r=r, g32=g32):
            r[:] = r[:] + g32


def _pad_to_tile(a, n_padded, pad_value=0.0):
    """Pad rows to the tile multiple. Point inputs must pad with a
    NONZERO value: the sphere-clamp VJP differentiates ||x|| whose
    gradient at x=0 is NaN, and although pad-row cotangents are zero,
    NaN activations would still poison the accumulated weight gradients
    (NaN * 0 = NaN in dW = h^T @ delta)."""
    pad = n_padded - a.shape[0]
    if pad:
        a = jnp.concatenate(
            [a, jnp.full((pad, *a.shape[1:]), pad_value, a.dtype)], axis=0
        )
    return a


def _pallas_specs(n_eff, interpret):
    import jax.experimental.pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = {"memory_space": pltpu.VMEM}
    except ImportError:  # pragma: no cover
        vmem = {}

    def tile_spec(width):
        return pl.BlockSpec((TILE, width), lambda i: (i, 0), **vmem)

    def full_spec():
        return pl.BlockSpec(**vmem)

    def acc_spec(shape):
        # constant index_map: every grid step sees the same block ->
        # sequential accumulation
        if len(shape) == 1:
            return pl.BlockSpec(shape, lambda i: (0,), **vmem)
        return pl.BlockSpec(shape, lambda i: (0, 0), **vmem)

    return pl, tile_spec, full_spec, acc_spec


def _fwd_pallas(flat_eff, x, d, icfg, rcfg, compute_dtype, interpret):
    n = x.shape[0]
    n_padded = -(-n // TILE) * TILE
    xp = _pad_to_tile(x, n_padded, pad_value=1.0)
    dp = _pad_to_tile(d, n_padded)
    n_eff = len(flat_eff)
    pl, tile_spec, full_spec, _ = _pallas_specs(n_eff, interpret)

    from neat_tpu.ops._vma import out_struct

    out_shapes = (
        out_struct((n_padded, 1), jnp.float32, xp, dp),
        out_struct((n_padded, 3), jnp.float32, xp, dp),
        out_struct((n_padded, 3), jnp.float32, xp, dp),
        out_struct((n_padded, 6), jnp.float32, xp, dp),
    )
    in_specs = [tile_spec(3), tile_spec(3)] + [full_spec() for _ in range(n_eff)]
    out_specs = (tile_spec(1), tile_spec(3), tile_spec(3), tile_spec(6))
    sdf, grads, rgb, att = pl.pallas_call(
        partial(_fwd_kernel, icfg, rcfg, compute_dtype),
        out_shape=out_shapes,
        grid=(n_padded // TILE,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(xp, dp, *flat_eff)
    return sdf[:n], grads[:n], rgb[:n], att[:n]


def _bwd_pallas(flat_eff, x, d, cots, icfg, rcfg, compute_dtype, interpret):
    if interpret:
        # The compiled kernel accumulates parameter gradients across grid
        # steps in a revisited VMEM block — valid because TPU grid steps
        # run sequentially. The interpreter gives no such ordering
        # guarantee (observed: garbage reads under a multi-device CPU
        # env), so interpret mode differentiates the identical math
        # directly; the accumulation pattern itself is validated on
        # hardware (tested vs the XLA path on the real chip).
        fn = lambda e, xx, dd: _field_math(e, xx, dd, icfg, rcfg, compute_dtype)
        _, vjp_fn = jax.vjp(fn, flat_eff, x, d)
        return vjp_fn(tuple(cots))
    n = x.shape[0]
    n_padded = -(-n // TILE) * TILE
    xp = _pad_to_tile(x, n_padded, pad_value=1.0)
    dp = _pad_to_tile(d, n_padded)
    cots_p = tuple(_pad_to_tile(c, n_padded) for c in cots)
    n_eff = len(flat_eff)
    pl, tile_spec, full_spec, acc_spec = _pallas_specs(n_eff, interpret)

    from neat_tpu.ops._vma import out_struct

    # Param cotangents are per-shard partials (psum'ed by the caller's
    # autodiff), so every output varies over the data axes of the inputs.
    out_shapes = [
        out_struct((n_padded, 3), jnp.float32, xp, dp, *cots_p),
        out_struct((n_padded, 3), jnp.float32, xp, dp, *cots_p),
    ] + [out_struct(w.shape, jnp.float32, xp, dp, *cots_p) for w in flat_eff]
    out_specs = [tile_spec(3), tile_spec(3)] + [
        acc_spec(w.shape) for w in flat_eff
    ]
    cot_widths = (1, 3, 3, 6)
    in_specs = (
        [tile_spec(3), tile_spec(3)]
        + [full_spec() for _ in range(n_eff)]
        + [tile_spec(w) for w in cot_widths]
    )
    kwargs = {}
    if not interpret:
        try:
            from jax.experimental.pallas import tpu as pltpu

            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=BWD_VMEM_LIMIT
            )
        except (ImportError, AttributeError):  # pragma: no cover
            pass
    outs = pl.pallas_call(
        partial(_bwd_kernel, icfg, rcfg, compute_dtype),
        out_shape=tuple(out_shapes),
        grid=(n_padded // TILE,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
        **kwargs,
    )(xp, dp, *flat_eff, *cots_p)
    dx, dd = outs[0][:n], outs[1][:n]
    deff = tuple(outs[2:])
    return deff, dx, dd


# ---------------------------------------------------------------------------
# custom-vjp op over resolved weights
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_op(flat_eff, x, d, icfg, rcfg, compute_dtype_name, interpret):
    cd = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    return _fwd_pallas(flat_eff, x, d, icfg, rcfg, cd, interpret)


def _fused_op_fwd(flat_eff, x, d, icfg, rcfg, compute_dtype_name, interpret):
    out = _fused_op(flat_eff, x, d, icfg, rcfg, compute_dtype_name, interpret)
    return out, (flat_eff, x, d)


def _fused_op_bwd(icfg, rcfg, compute_dtype_name, interpret, res, cots):
    flat_eff, x, d = res
    cd = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    deff, dx, dd = _bwd_pallas(
        flat_eff, x, d, cots, icfg, rcfg, cd, interpret
    )
    return deff, dx, dd


_fused_op.defvjp(_fused_op_fwd, _fused_op_bwd)


def fused_field_eval(
    params: Dict[str, Any],
    points: jnp.ndarray,
    dirs: jnp.ndarray,
    icfg: ImplicitNetConfig,
    rcfg: RenderNetConfig,
    compute_dtype: str = "bfloat16",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused main-pass field evaluation.

    points, dirs: (N, 3) f32. Returns (sdf (N, 1), grads (N, 3),
    rgb (N, 3), lines3d (N, 2, 3)) — exactly the XLA-path composition of
    implicit_sdf_feat_grad + render_forward + attraction_forward, with the
    256-dim feature vector kept internal to the kernel.
    """
    flat_eff = _flatten_eff(params)
    sdf, grads, rgb, att = _fused_op(
        flat_eff, points, dirs, icfg, rcfg, compute_dtype, interpret
    )
    offsets = att.reshape(*points.shape[:-1], 2, 3)
    lines3d = points[..., None, :] + offsets
    return sdf, grads, rgb, lines3d
