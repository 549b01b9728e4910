"""Hand-derived stashed-residual backward for the fused field kernel.

The shipped fused kernel (ops/fused_field.py) derives its backward by
tracing ``jax.vjp(_field_math)`` INSIDE the kernel — correct by
construction, but it (a) recomputes the whole forward (implicit chain,
inner spatial-gradient sweep, both heads) before the cotangent sweeps, and
(b) jax's dot transpose rules promote every backward matmul to f32 when
the forward ran bf16, so the backward never uses the bf16 MXU rate.

This module implements the alternative VERDICT round-2 #4 asked for: the
forward returns a compact residual set, and a HAND-WRITTEN backward
consumes it with zero recompute of forward matmuls and with every large
dot in the compute dtype (f32 accumulation). Key identities that keep the
residuals small:

  * softplus100 chain: storing the post-activation i = softplus(100 z)/100
    is enough — sigma' = sigmoid(100 z) = 1 - exp(-100 i) exactly, and
    sigma'' = 100 sigma' (1 - sigma'), so neither z nor sigma' is stored.
  * relu heads: the stored post-activation doubles as the derivative mask
    (i > 0) and as the weight-gradient operand.
  * PE values: the stashed embedding e already contains sin/cos(2^k x), so
    both the PE transpose and its second derivative (the tangent-PE
    x-dependence) reuse them with no transcendentals.
  * the second-order term through the inner gradient uses the JVP
    identity  C_g . grad(sdf) = d/dt sdf(x + t C_g): one tangent forward
    over stored activations, then ONE combined reverse sweep that carries
    the primal and tangent cotangent chains together.

Residual cost per point: 16 x 256 activations in compute dtype + 302 f32
scalars (~9.6 KB at bf16) — written once by the forward, read once by the
backward, vs. the recompute path's full re-evaluation.

Validated against jax.vjp of ``fused_field._field_math`` in f32/f64
(tests/test_ops.py::TestStashedBackward), including clamp-active and
clamp-tie points.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..fields.mlp import ImplicitNetConfig, RenderNetConfig
from .fused_field import (
    N_HEAD_LAYERS,
    N_IMPLICIT_LAYERS,
    _pe,
    _softplus100,
    _unflatten_eff,
)

INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _balanced(a, b):
    """lax.min's subgradient multiplier for operand ``a`` of min(a, b):
    1 where a < b, 0.5 at ties, 0 otherwise (matches jax's _balanced_eq)."""
    eq = a == b
    lt = a < b
    return jnp.where(lt, 1.0, jnp.where(eq, 0.5, 0.0))


def field_fwd_res(
    flat_eff,
    x: jnp.ndarray,
    d: jnp.ndarray,
    icfg: ImplicitNetConfig,
    rcfg: RenderNetConfig,
    compute_dtype,
):
    """Forward pass returning (sdf, grads, rgb, att) plus the residuals
    field_bwd_stashed consumes. Outputs match fused_field._field_math.

    The spatial gradient is computed by an EXPLICIT reverse sweep (the
    same math jax.vjp derives for _field_math's inner vjp), so its
    intermediate values line up with the backward's reconstruction.
    """
    iw, rw, aw = _unflatten_eff(flat_eff)
    cd = compute_dtype
    # accumulation dtype: f32 for bf16/f32 compute, f64 under x64 tests
    el = jnp.promote_types(jnp.float32, cd)

    e = _pe(x, icfg.multires)  # (T, 39) f32
    e_cd = e.astype(cd)

    # implicit chain, saving post-activations
    i_post: List[jnp.ndarray] = []  # sigma(z_0) .. sigma(z_7), cd
    h = e_cd
    inp_l = []  # actual layer inputs (cd), for the inner reverse sweep
    for l in range(N_IMPLICIT_LAYERS):
        if l == 4:
            h = jnp.concatenate([h, e_cd], axis=-1) * INV_SQRT2
        inp_l.append(h)
        w, b = iw[l]
        z = jnp.dot(h, w.astype(cd), preferred_element_type=el) + b
        if l < N_IMPLICIT_LAYERS - 1:
            h = _softplus100(z).astype(cd)
            i_post.append(h)
    z8 = z  # (T, 257) f32
    sdf_raw = z8[..., :1]
    feats = z8[..., 1:]

    if icfg.sdf_bounding_sphere > 0.0:
        norm_x = jnp.linalg.norm(x, axis=-1, keepdims=True)
        sphere = icfg.sphere_scale * (icfg.sdf_bounding_sphere - norm_x)
        sdf = jnp.minimum(sdf_raw, sphere)
        m_raw = _balanced(sdf_raw, sphere)
        m_sph = _balanced(sphere, sdf_raw)
    else:
        norm_x = None
        sdf = sdf_raw
        m_raw = jnp.ones_like(sdf_raw)
        m_sph = jnp.zeros_like(sdf_raw)

    # ---- inner spatial gradient: explicit reverse sweep --------------
    # sigma'(z_l) = 1 - exp(-100 i_l). Written with exp (not expm1)
    # because Pallas TPU has no expm1 lowering; the cancellation at
    # saturated-negative units (i ~ 0, sigma' ~ 100 i) costs ~1e-7
    # absolute in f32 — far below the bf16 compute noise floor.
    s = [1.0 - jnp.exp(-100.0 * ip.astype(el)) for ip in i_post]
    # ones-seeded sweep: the min-clamp multiplier is applied ONCE, below at
    # the grads assembly (m_raw * g_mlp + m_sph * g_sphere) — seeding with
    # m_raw here would square it, which differs from jax.vjp's balanced-eq
    # convention at exact clamp ties (0.25 vs 0.5 on the mlp branch); the
    # stashed backward (field_bwd_stashed) assumes the single-multiplier form
    v = jnp.concatenate(
        [jnp.ones_like(sdf_raw), jnp.zeros_like(feats)], axis=-1
    )  # cot on z8, f32
    cot_e = jnp.zeros_like(e)
    for l in range(N_IMPLICIT_LAYERS - 1, -1, -1):
        w, _ = iw[l]
        u = jnp.dot(
            v.astype(cd), w.astype(cd).T, preferred_element_type=el
        )  # cot on inp_l
        if l == 0:
            cot_e = cot_e + u
        elif l == 4:
            # the pre-skip layer outputs dims[4] - encoding_dim channels;
            # the skip concat restores full width with the embedding
            ne = e.shape[-1]
            u_h = u[..., :-ne] * INV_SQRT2
            cot_e = cot_e + u[..., -ne:] * INV_SQRT2
            v = u_h * s[l - 1]
        else:
            v = u * s[l - 1]
    g_mlp = _pe_transpose(cot_e, e, x, icfg.multires)
    if norm_x is not None:
        g_sphere = -icfg.sphere_scale * x / norm_x
        grads = m_raw * g_mlp + m_sph * g_sphere
    else:
        grads = g_mlp

    # ---- heads --------------------------------------------------------
    d_enc = _pe(d, rcfg.multires_view) if rcfg.multires_view > 0 else d
    r_in = jnp.concatenate([x, d_enc, grads, feats], axis=-1)
    a_in = jnp.concatenate([x, d, grads, feats], axis=-1)

    def head_fwd(weights, inp):
        posts = []
        h = inp.astype(cd)
        for l in range(N_HEAD_LAYERS):
            w, b = weights[l]
            h = jnp.dot(h, w.astype(cd), preferred_element_type=el) + b
            if l < N_HEAD_LAYERS - 1:
                h = jnp.maximum(h, 0.0).astype(cd)
                posts.append(h)
        return h, posts

    zr, i_r = head_fwd(rw, r_in)
    rgb = jax.nn.sigmoid(zr)
    att, i_a = head_fwd(aw, a_in)

    res = (e, tuple(i_post), tuple(i_r), tuple(i_a), z8, rgb, grads)
    return (sdf, grads, rgb, att), res


def _pe_transpose(cot_e, e, x, multires):
    """J_PE(x)^T @ cot_e using the stashed sin/cos columns of e."""
    out = cot_e[..., : x.shape[-1]]
    for k in range(multires):
        f = float(2.0**k)
        sin_k = e[..., 3 + 6 * k : 6 + 6 * k]
        cos_k = e[..., 6 + 6 * k : 9 + 6 * k]
        c_sin = cot_e[..., 3 + 6 * k : 6 + 6 * k]
        c_cos = cot_e[..., 6 + 6 * k : 9 + 6 * k]
        out = out + f * (c_sin * cos_k - c_cos * sin_k)
    return out


def field_bwd_stashed(
    flat_eff,
    x: jnp.ndarray,
    d: jnp.ndarray,
    res,
    cots,
    icfg: ImplicitNetConfig,
    rcfg: RenderNetConfig,
    compute_dtype,
):
    """Backward from residuals: returns (deff, dx, dd) matching
    jax.vjp(_field_math, flat_eff, x, d) cotangent application."""
    iw, rw, aw = _unflatten_eff(flat_eff)
    cd = compute_dtype
    el = jnp.promote_types(jnp.float32, cd)
    c_sdf, c_g, c_rgb, c_att = (c.astype(el) for c in cots)
    e, i_post, i_r, i_a, z8, rgb, grads = res
    e_cd = e.astype(cd)

    sdf_raw = z8[..., :1]
    feats = z8[..., 1:]
    if icfg.sdf_bounding_sphere > 0.0:
        norm_x = jnp.linalg.norm(x, axis=-1, keepdims=True)
        sphere = icfg.sphere_scale * (icfg.sdf_bounding_sphere - norm_x)
        m_raw = _balanced(sdf_raw, sphere)
        m_sph = _balanced(sphere, sdf_raw)
    else:
        norm_x = None
        m_raw = jnp.ones_like(sdf_raw)
        m_sph = jnp.zeros_like(sdf_raw)

    em = [jnp.exp(-100.0 * ip.astype(el)) for ip in i_post]
    s = [1.0 - emi for emi in em]  # no expm1 in Pallas TPU lowering
    # sigma'' = 100 sigma' (1 - sigma'); em is the accurate (1 - sigma')
    spp = [100.0 * si * emi for si, emi in zip(s, em)]

    # ---- heads backward ----------------------------------------------
    d_enc = _pe(d, rcfg.multires_view) if rcfg.multires_view > 0 else d
    r_in = jnp.concatenate([x, d_enc, grads, feats], axis=-1)
    a_in = jnp.concatenate([x, d, grads, feats], axis=-1)

    def head_bwd(weights, posts, inp0, delta):
        dws = [None] * N_HEAD_LAYERS
        for l in range(N_HEAD_LAYERS - 1, -1, -1):
            i_l = inp0.astype(cd) if l == 0 else posts[l - 1]
            w, _ = weights[l]
            dws[l] = (
                jnp.dot(
                    i_l.T, delta.astype(cd),
                    preferred_element_type=el,
                ),
                jnp.sum(delta, axis=0, keepdims=True),
            )
            t = jnp.dot(
                delta.astype(cd), w.astype(cd).T,
                preferred_element_type=el,
            )
            if l > 0:
                # relu mask computed at el: Mosaic has no bf16 cmpf
                delta = t * (posts[l - 1].astype(el) > 0)
        return dws, t  # t = cot on inp0

    delta_r = c_rgb * rgb * (1.0 - rgb)
    dws_r, cot_rin = head_bwd(rw, i_r, r_in, delta_r)
    dws_a, cot_ain = head_bwd(aw, i_a, a_in, c_att)

    n_enc = d_enc.shape[-1]
    cx_r = cot_rin[..., :3]
    c_denc = cot_rin[..., 3 : 3 + n_enc]
    cg_r = cot_rin[..., 3 + n_enc : 6 + n_enc]
    cf_r = cot_rin[..., 6 + n_enc :]
    cx_a = cot_ain[..., :3]
    cd_a = cot_ain[..., 3:6]
    cg_a = cot_ain[..., 6:9]
    cf_a = cot_ain[..., 9:]

    if rcfg.multires_view > 0:
        dd = cd_a + _pe_transpose(c_denc, d_enc, d, rcfg.multires_view)
    else:
        dd = cd_a + c_denc
    C_g = c_g + cg_r + cg_a  # cotangent on grads, f32
    C_f = cf_r + cf_a
    dx = cx_r + cx_a

    # split C_g between the mlp-gradient and sphere-gradient branches
    Cg_mlp = C_g * m_raw

    # ---- tangent forward (xdot = Cg_mlp) over stored activations ------
    edot = _pe_tangent(e, x, Cg_mlp, icfg.multires)  # (T, 39) f32
    edot_cd = edot.astype(cd)
    hdot = edot_cd
    tinp = []  # tangent layer inputs (cd)
    zdots = []  # f32
    for l in range(N_IMPLICIT_LAYERS):
        if l == 4:
            hdot = jnp.concatenate([hdot, edot_cd], axis=-1) * INV_SQRT2
        tinp.append(hdot)
        w, _ = iw[l]
        zdot = jnp.dot(
            hdot, w.astype(cd), preferred_element_type=el
        )
        zdots.append(zdot)
        if l < N_IMPLICIT_LAYERS - 1:
            hdot = (s[l] * zdot).astype(cd)

    # ---- combined reverse sweep (primal + tangent chains) -------------
    # seeds at z8: primal v gets the sdf_raw/min branch + feats cotangent;
    # tangent vdot gets the C_g.grad objective's d/d zdot_8 = [1, 0...]
    # (the Cg magnitude already rode in through xdot)
    v = jnp.concatenate([c_sdf * m_raw, C_f], axis=-1)
    vdot = jnp.concatenate(
        [jnp.ones_like(sdf_raw), jnp.zeros_like(feats)], axis=-1
    )
    cot_e = jnp.zeros_like(e)
    cot_edot = jnp.zeros_like(e)
    d_iw = [None] * N_IMPLICIT_LAYERS
    for l in range(N_IMPLICIT_LAYERS - 1, -1, -1):
        w, _ = iw[l]
        inp_l = (
            e_cd if l == 0
            else jnp.concatenate([i_post[3], e_cd], axis=-1) * INV_SQRT2
            if l == 4
            else i_post[l - 1]
        )
        v_cd = v.astype(cd)
        vdot_cd = vdot.astype(cd)
        dw = jnp.dot(
            inp_l.T, v_cd, preferred_element_type=el
        ) + jnp.dot(tinp[l].T, vdot_cd, preferred_element_type=el)
        db = jnp.sum(v, axis=0, keepdims=True)
        d_iw[l] = (dw, db)
        wt = w.astype(cd).T
        u = jnp.dot(v_cd, wt, preferred_element_type=el)
        udot = jnp.dot(vdot_cd, wt, preferred_element_type=el)
        if l == 0:
            cot_e = cot_e + u
            cot_edot = cot_edot + udot
        elif l == 4:
            ne = e.shape[-1]
            cot_e = cot_e + u[..., -ne:] * INV_SQRT2
            cot_edot = cot_edot + udot[..., -ne:] * INV_SQRT2
            u_h = u[..., :-ne] * INV_SQRT2
            ud_h = udot[..., :-ne] * INV_SQRT2
            v = u_h * s[l - 1] + ud_h * spp[l - 1] * zdots[l - 1]
            vdot = ud_h * s[l - 1]
        else:
            v = u * s[l - 1] + udot * spp[l - 1] * zdots[l - 1]
            vdot = udot * s[l - 1]

    dx = dx + _pe_transpose(cot_e, e, x, icfg.multires)
    dx = dx + _pe_tangent_x_transpose(cot_edot, e, x, Cg_mlp, icfg.multires)

    if norm_x is not None:
        # c_sdf through min's sphere branch, and C_g through the sphere
        # gradient's x-dependence
        dx = dx + c_sdf * m_sph * (-icfg.sphere_scale) * x / norm_x
        xdotC = jnp.sum(x * C_g, axis=-1, keepdims=True)
        dx = dx + m_sph * (-icfg.sphere_scale) * (
            C_g / norm_x - x * xdotC / norm_x**3
        )

    deff = []
    for dw, db in d_iw + dws_r + dws_a:
        deff.append(dw)
        deff.append(db)
    return tuple(deff), dx, dd


def _pe_tangent(e, x, xdot, multires):
    """J_PE(x) @ xdot using the stashed sin/cos columns of e."""
    outs = [xdot]
    for k in range(multires):
        f = float(2.0**k)
        sin_k = e[..., 3 + 6 * k : 6 + 6 * k]
        cos_k = e[..., 6 + 6 * k : 9 + 6 * k]
        outs.append(f * cos_k * xdot)
        outs.append(-f * sin_k * xdot)
    return jnp.concatenate(outs, axis=-1)


def _pe_tangent_x_transpose(cot_edot, e, x, xdot, multires):
    """d/dx of (cot_edot . J_PE(x) xdot) with xdot held constant: the
    tangent embedding's second-derivative terms -f^2 sin/cos."""
    out = jnp.zeros_like(x)
    for k in range(multires):
        f = float(2.0**k)
        sin_k = e[..., 3 + 6 * k : 6 + 6 * k]
        cos_k = e[..., 6 + 6 * k : 9 + 6 * k]
        c_sin = cot_edot[..., 3 + 6 * k : 6 + 6 * k]
        c_cos = cot_edot[..., 6 + 6 * k : 9 + 6 * k]
        out = out + f * f * (-c_sin * sin_k - c_cos * cos_k) * xdot
    return out


# ---------------------------------------------------------------------------
# pallas wiring: forward kernel stashes residuals, backward consumes them
# ---------------------------------------------------------------------------
#
# Residual packing per point-tile:
#   * stash_cd (T, W_CD): all post-activations in compute dtype —
#     implicit sigma(z_0..z_7) (7x256 + 217 at the pre-skip layer) then the
#     two heads' relu outputs (2 x 4 x 256)
#   * stash_f32 (T, 296): the embedding e (39) and z8 (257)
#   rgb and grads ride through the custom_vjp residuals as ordinary
#   forward outputs — no extra stores.

from functools import partial as _partial

from .fused_field import (  # noqa: E402
    TILE,
    BWD_VMEM_LIMIT,
    _pad_to_tile,
    _pallas_specs,
)


def _stash_widths(icfg: ImplicitNetConfig):
    dims = icfg.layer_dims()
    i_widths = []
    for l in range(N_IMPLICIT_LAYERS - 1):
        w = dims[l + 1] - dims[0] if (l + 1) in icfg.skip_in else dims[l + 1]
        i_widths.append(w)
    head_w = 4 * 256 * 2
    return i_widths, sum(i_widths) + head_w


def _pack_res(res, icfg):
    e, i_post, i_r, i_a, z8, rgb, grads = res
    stash_cd = jnp.concatenate(list(i_post) + list(i_r) + list(i_a), axis=-1)
    stash_f32 = jnp.concatenate([e, z8], axis=-1)
    return stash_cd, stash_f32


def _unpack_res(stash_cd, stash_f32, rgb, grads, icfg):
    i_widths, _ = _stash_widths(icfg)
    i_post = []
    o = 0
    for w in i_widths:
        i_post.append(stash_cd[..., o : o + w])
        o += w
    i_r = [stash_cd[..., o + k * 256 : o + (k + 1) * 256] for k in range(4)]
    o += 4 * 256
    i_a = [stash_cd[..., o + k * 256 : o + (k + 1) * 256] for k in range(4)]
    ne = encoding_dim_39(icfg)
    e = stash_f32[..., :ne]
    z8 = stash_f32[..., ne:]
    return (e, tuple(i_post), tuple(i_r), tuple(i_a), z8, rgb, grads)


def encoding_dim_39(icfg):
    from ..core.embedder import encoding_dim

    return encoding_dim(icfg.multires, icfg.d_in)


def _fwd_stash_kernel(icfg, rcfg, compute_dtype, x_ref, d_ref, *refs):
    n_eff = 2 * (N_IMPLICIT_LAYERS + 2 * N_HEAD_LAYERS)
    eff = tuple(r[:] for r in refs[:n_eff])
    sdf_ref, grads_ref, rgb_ref, att_ref, scd_ref, sf32_ref = refs[n_eff:]
    out, res = field_fwd_res(
        eff, x_ref[:], d_ref[:], icfg, rcfg, compute_dtype
    )
    sdf, grads, rgb, att = out
    sdf_ref[:] = sdf.astype(jnp.float32)
    grads_ref[:] = grads.astype(jnp.float32)
    rgb_ref[:] = rgb.astype(jnp.float32)
    att_ref[:] = att.astype(jnp.float32)
    stash_cd, stash_f32 = _pack_res(res, icfg)
    scd_ref[:] = stash_cd
    sf32_ref[:] = stash_f32.astype(jnp.float32)


def _bwd_stash_kernel(icfg, rcfg, compute_dtype, x_ref, d_ref, *refs):
    import jax.experimental.pallas as pl

    n_eff = 2 * (N_IMPLICIT_LAYERS + 2 * N_HEAD_LAYERS)
    eff = tuple(r[:] for r in refs[:n_eff])
    scd, sf32, rgb, grads = (r[:] for r in refs[n_eff : n_eff + 4])
    cots = tuple(r[:] for r in refs[n_eff + 4 : n_eff + 8])
    out_refs = refs[n_eff + 8 :]
    dx_ref, dd_ref = out_refs[:2]
    deff_refs = out_refs[2:]

    res = _unpack_res(scd, sf32, rgb, grads, icfg)
    deff, dx, dd = field_bwd_stashed(
        eff, x_ref[:], d_ref[:], res, cots, icfg, rcfg, compute_dtype
    )
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


def _fwd_stash_pallas(flat_eff, x, d, icfg, rcfg, compute_dtype, interpret):
    # unlike the backward (whose revisited-block grid accumulation the
    # interpreter cannot order — see _bwd_stash_pallas), the forward is
    # pure per-tile, so interpret mode runs the REAL pallas_call wiring:
    # the 6-output spec ordering, stash-width tiles, and padding/slicing
    # get off-TPU coverage instead of a plain-jnp shortcut
    n = x.shape[0]
    n_padded = -(-n // TILE) * TILE
    xp = _pad_to_tile(x, n_padded, pad_value=1.0)
    dp = _pad_to_tile(d, n_padded)
    n_eff = len(flat_eff)
    pl, tile_spec, full_spec, _ = _pallas_specs(n_eff, interpret)
    _, w_cd = _stash_widths(icfg)
    w_f32 = encoding_dim_39(icfg) + 1 + icfg.feature_vector_size

    from neat_tpu.ops._vma import out_struct

    out_shapes = (
        out_struct((n_padded, 1), jnp.float32, xp, dp),
        out_struct((n_padded, 3), jnp.float32, xp, dp),
        out_struct((n_padded, 3), jnp.float32, xp, dp),
        out_struct((n_padded, 6), jnp.float32, xp, dp),
        out_struct((n_padded, w_cd), compute_dtype, xp, dp),
        out_struct((n_padded, w_f32), jnp.float32, xp, dp),
    )
    in_specs = [tile_spec(3), tile_spec(3)] + [full_spec() for _ in range(n_eff)]
    out_specs = (
        tile_spec(1), tile_spec(3), tile_spec(3), tile_spec(6),
        tile_spec(w_cd), tile_spec(w_f32),
    )
    outs = pl.pallas_call(
        _partial(_fwd_stash_kernel, icfg, rcfg, compute_dtype),
        out_shape=out_shapes,
        grid=(n_padded // TILE,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(xp, dp, *flat_eff)
    sdf, grads, rgb, att, scd, sf32 = outs
    return sdf[:n], grads[:n], rgb[:n], att[:n], scd[:n], sf32[:n]


def _bwd_stash_pallas(
    flat_eff, x, d, scd, sf32, rgb, grads, cots, icfg, rcfg,
    compute_dtype, interpret,
):
    if interpret:
        # the compiled kernel accumulates parameter cotangents across grid
        # steps in a revisited VMEM block (valid: TPU grid steps run
        # sequentially); the interpreter gives no such ordering guarantee
        # (same blocker as fused_field._bwd_pallas), so interpret mode runs
        # the identical stashed math directly — the accumulation wiring is
        # validated on hardware vs the XLA path
        res = _unpack_res(scd, sf32, rgb, grads, icfg)
        return field_bwd_stashed(
            flat_eff, x, d, res, cots, icfg, rcfg, compute_dtype
        )
    n = x.shape[0]
    n_padded = -(-n // TILE) * TILE
    xp = _pad_to_tile(x, n_padded, pad_value=1.0)
    dp = _pad_to_tile(d, n_padded)
    scd_p = _pad_to_tile(scd, n_padded)
    sf32_p = _pad_to_tile(sf32, n_padded)
    rgb_p = _pad_to_tile(rgb, n_padded, pad_value=0.5)
    grads_p = _pad_to_tile(grads, n_padded)
    cots_p = tuple(_pad_to_tile(c, n_padded) for c in cots)
    n_eff = len(flat_eff)
    pl, tile_spec, full_spec, acc_spec = _pallas_specs(n_eff, interpret)
    _, w_cd = _stash_widths(icfg)
    w_f32 = encoding_dim_39(icfg) + 1 + icfg.feature_vector_size

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
    in_specs = (
        [tile_spec(3), tile_spec(3)]
        + [full_spec() for _ in range(n_eff)]
        + [tile_spec(w_cd), tile_spec(w_f32), tile_spec(3), tile_spec(3)]
        + [tile_spec(w) for w in (1, 3, 3, 6)]
    )
    kwargs = {}
    try:
        from jax.experimental.pallas import tpu as pltpu

        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=BWD_VMEM_LIMIT
        )
    except (ImportError, AttributeError):  # pragma: no cover
        pass
    outs = pl.pallas_call(
        _partial(_bwd_stash_kernel, icfg, rcfg, compute_dtype),
        out_shape=tuple(out_shapes),
        grid=(n_padded // TILE,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
        **kwargs,
    )(xp, dp, *flat_eff, scd_p, sf32_p, rgb_p, grads_p, *cots_p)
    dx, dd = outs[0][:n], outs[1][:n]
    return tuple(outs[2:]), dx, dd


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_op_stash(flat_eff, x, d, icfg, rcfg, compute_dtype_name, interpret):
    # undifferentiated primal: custom_vjp only calls this when the op is NOT
    # being differentiated (render previews, eval/inference chunks), where
    # residuals would be written to HBM (~9.3 KB/point) only to be dropped —
    # pallas_call outputs cannot be DCE'd — so dispatch to the stash-free
    # forward kernel; the fwd rule below runs the stashing kernel
    from .fused_field import _fwd_pallas

    cd = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    return _fwd_pallas(flat_eff, x, d, icfg, rcfg, cd, interpret)


def _fused_op_stash_fwd(
    flat_eff, x, d, icfg, rcfg, compute_dtype_name, interpret
):
    cd = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    sdf, grads, rgb, att, scd, sf32 = _fwd_stash_pallas(
        flat_eff, x, d, icfg, rcfg, cd, interpret
    )
    return (sdf, grads, rgb, att), (flat_eff, x, d, scd, sf32, rgb, grads)


def _fused_op_stash_bwd(icfg, rcfg, compute_dtype_name, interpret, res, cots):
    flat_eff, x, d, scd, sf32, rgb, grads = res
    cd = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    deff, dx, dd = _bwd_stash_pallas(
        flat_eff, x, d, scd, sf32, rgb, grads, cots, icfg, rcfg, cd, interpret
    )
    return deff, dx, dd


_fused_op_stash.defvjp(_fused_op_stash_fwd, _fused_op_stash_bwd)


def fused_field_eval_stash(
    params,
    points: jnp.ndarray,
    dirs: jnp.ndarray,
    icfg: ImplicitNetConfig,
    rcfg: RenderNetConfig,
    compute_dtype: str = "bfloat16",
    interpret: bool = False,
):
    """Drop-in alternative to fused_field.fused_field_eval whose backward
    reads stashed residuals instead of recomputing the forward."""
    from .fused_field import _flatten_eff

    flat_eff = _flatten_eff(params)
    sdf, grads, rgb, att = _fused_op_stash(
        flat_eff, points, dirs, icfg, rcfg, compute_dtype, interpret
    )
    offsets = att.reshape(*points.shape[:-1], 2, 3)
    lines3d = points[..., None, :] + offsets
    return sdf, grads, rgb, lines3d
