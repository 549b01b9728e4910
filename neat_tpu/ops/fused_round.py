"""Pallas TPU kernel: fused error-bound refinement round for the sampler.

Each refinement round of the error-bounded sampler (reference
code/model/ray_sampler.py:144-215; XLA path sampling/samplers.py:
error_bound_z_vals) runs, per ray, on (R, S) bookkeeping tensors:

    d* triangle bound  ->  convergence check at beta0  ->  10-step beta
    bisection (each step re-evaluating the Lemma-2 opacity-error bound)
    ->  volume-rendering weights at the chosen beta  ->  the
    error-driven refinement pdf

Under XLA the 10 sequential bisection steps alone are ~40 small kernels
per round whose (1024, S<=640) operands round-trip HBM every step —
tools/glue_decomp.py measures this "glue" at ~3.5 ms of the ~27 ms
training step on v5e. This kernel keeps z/sdf/d*/beta resident in VMEM
across the whole round, so the bisection loop costs VPU flops only.

The inverse-CDF draw, the proposal SDF evals (ops/fused_sdf.py), and the
two-operand merge sort stay in XLA: each is a single fused kernel
already. Sampler math is f32 throughout, matching the XLA path.

Deliberate deviation from the XLA path: prefix sums run as in-kernel
log-step shifted adds (Hillis-Steele) instead of XLA's cumsum; both are
parallel reorderings of the same sum, with ~1 ulp disagreement —
documented at the sampler parity test (tests/test_reference_parity.py,
"u = 1.0 knife edge").
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from neat_tpu.ops._vma import match_vma

_INF_DIST = 1e10
TILE_R = 128


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)


def _shift_down(x, lanes):
    """out[:, i] = x[:, i+1] (0 at the last lane). Circular roll + mask."""
    from jax.experimental.pallas import tpu as pltpu

    rolled = match_vma(pltpu.roll(x, shift=lanes - 1, axis=1), x)  # out[i] = x[i+1 mod S]
    return jnp.where(_lane_iota(x.shape) < lanes - 1, rolled, 0.0)


def _cumsum_incl(x, lanes):
    """Inclusive prefix sum along lanes via log-step shifted adds."""
    from jax.experimental.pallas import tpu as pltpu

    idx = _lane_iota(x.shape)
    d = 1
    while d < lanes:
        shifted = match_vma(pltpu.roll(x, shift=d, axis=1), x)  # out[i] = x[i-d mod S]
        x = x + jnp.where(idx >= d, shifted, 0.0)
        d *= 2
    return x


def _cumsum_excl(x, lanes):
    """Exclusive prefix sum: out[:, i] = sum_{j<i} x[:, j]."""
    from jax.experimental.pallas import tpu as pltpu

    incl = _cumsum_incl(x, lanes)
    rolled = match_vma(pltpu.roll(incl, shift=1, axis=1), incl)
    return jnp.where(_lane_iota(x.shape) >= 1, rolled, 0.0)


def _laplace_density(sdf, beta):
    """alpha * (0.5 + 0.5 sign(s) expm1(-|s|/beta)), alpha = 1/beta
    (core/density.py:laplace_density). Written expm1-free (Pallas TPU has
    no expm1 lowering): for s >= 0 the expression collapses exactly to
    0.5 exp(-s/beta), for s < 0 to 1 - 0.5 exp(-|s|/beta) — no
    cancellation in either branch."""
    e = jnp.exp(-jnp.abs(sdf) / beta)
    return jnp.where(sdf >= 0.0, 0.5 * e, 1.0 - 0.5 * e) / beta


def _error_bound_max(beta_col, sdf, dists, d_star, interval_mask, lanes):
    """Max per-ray Lemma-2 opacity-error bound at beta (samplers.py:
    _error_bound), on full-width masked arrays. beta_col: (T, 1)."""
    density = _laplace_density(sdf, beta_col)
    fe = jnp.where(interval_mask, dists * density, 0.0)
    # integral[..., :-1] of the XLA path == exclusive cumsum of fe here
    integral_excl = _cumsum_excl(fe, lanes)
    err_sec = jnp.where(
        interval_mask,
        jnp.exp(-d_star / beta_col) * (dists * dists) / (4.0 * beta_col * beta_col),
        0.0,
    )
    err_int = _cumsum_incl(err_sec, lanes)
    bound = (jnp.minimum(jnp.exp(err_int), 1e6) - 1.0) * jnp.exp(-integral_excl)
    bound = jnp.where(interval_mask, bound, 0.0)
    return jnp.max(bound, axis=1, keepdims=True)  # (T, 1)


def _round_kernel(
    beta0_ref,
    z_ref,
    sdf_ref,
    beta_ref,
    beta_out_ref,
    weights_ref,
    pdf_ref,
    *,
    lanes: int,
    eps: float,
    beta_iters: int,
    add_tiny: float,
    refine: bool,
):
    z = z_ref[:]  # (T, S) f32, sorted
    sdf = sdf_ref[:]
    beta_in = beta_ref[:]  # (T, 1)
    beta0 = beta0_ref[0]

    idx = _lane_iota(z.shape)
    interval_mask = idx < lanes - 1  # lanes 0..S-2 are intervals

    # dists_i = z_{i+1} - z_i (0 at the last lane)
    z_next = _shift_down(z, lanes)
    dists = jnp.where(interval_mask, z_next - z, 0.0)

    # d* triangle bound (samplers.py:_d_star / reference ray_sampler.py:
    # 160-173)
    sdf_next = _shift_down(sdf, lanes)
    a = dists
    b = jnp.abs(sdf)
    c = jnp.abs(sdf_next)
    first_cond = a * a + b * b <= c * c
    second_cond = a * a + c * c <= b * b
    s = (a + b + c) * 0.5
    area = s * (s - a) * (s - b) * (s - c)
    heron = 2.0 * jnp.sqrt(jnp.maximum(area, 0.0)) / jnp.maximum(a, 1e-12)
    d_star = jnp.where(first_cond, b, jnp.zeros_like(a))
    d_star = jnp.where(second_cond, c, d_star)
    other = (~first_cond) & (~second_cond) & (b + c - a > 0)
    d_star = jnp.where(other, heron, d_star)
    same_sign = jnp.sign(sdf_next) * jnp.sign(sdf) == 1
    d_star = jnp.where(same_sign & interval_mask, d_star, 0.0)

    # convergence check at beta0, then the bisection line search
    # (reference ray_sampler.py:176-185)
    curr_error = _error_bound_max(
        jnp.full_like(beta_in, beta0), sdf, dists, d_star, interval_mask, lanes
    )
    beta_hi = jnp.where(curr_error <= eps, beta0, beta_in)
    beta_lo = jnp.full_like(beta_in, beta0)
    for _ in range(beta_iters):
        beta_mid = 0.5 * (beta_lo + beta_hi)
        err = _error_bound_max(beta_mid, sdf, dists, d_star, interval_mask, lanes)
        ok = err <= eps
        beta_hi = jnp.where(ok, beta_mid, beta_hi)
        beta_lo = jnp.where(ok, beta_lo, beta_mid)
    beta_out_ref[:] = beta_hi

    # volume-rendering weights at the chosen beta (core/render.py:
    # alpha_transmittance with dists_inf last entry 1e10)
    density = _laplace_density(sdf, beta_hi)
    dists_inf = jnp.where(interval_mask, dists, _INF_DIST)
    fe_inf = dists_inf * density
    transmittance = jnp.exp(-_cumsum_excl(jnp.where(idx < lanes, fe_inf, 0.0), lanes))
    alpha = 1.0 - jnp.exp(-fe_inf)
    weights_ref[:] = alpha * transmittance

    if refine:
        # refinement pdf over intervals (samplers.py error_bound_z_vals
        # refine branch): bound_opacity * transmittance[..., :-1],
        # normalized. Lane S-1 is padding (zero).
        err_sec = jnp.where(
            interval_mask,
            jnp.exp(-d_star / beta_hi) * (dists * dists) / (4.0 * beta_hi * beta_hi),
            0.0,
        )
        err_int = _cumsum_incl(err_sec, lanes)
        bound_opacity = (
            jnp.minimum(jnp.exp(err_int), 1e6) - 1.0
        ) * transmittance
        pdf = jnp.where(interval_mask, bound_opacity + add_tiny, 0.0)
        pdf = pdf / jnp.sum(pdf, axis=1, keepdims=True)
        pdf_ref[:] = pdf
    else:
        pdf_ref[:] = jnp.zeros_like(z)


@partial(
    jax.jit,
    static_argnames=("eps", "beta_iters", "add_tiny", "refine", "interpret"),
)
def fused_sampler_round(
    z_vals: jnp.ndarray,
    sdf: jnp.ndarray,
    beta: jnp.ndarray,
    beta0: jnp.ndarray,
    eps: float,
    beta_iters: int,
    add_tiny: float,
    refine: bool,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused refinement round.

    z_vals, sdf: (R, S) f32 with S a multiple of 128; beta: (R,) carried
    bisection upper bound; beta0: scalar |beta|+beta_min target.
    Returns (beta (R,), weights (R, S), pdf (R, S)); pdf's last column is
    structural padding (S-1 intervals), all-zero when refine=False.
    """
    from jax.experimental import pallas as pl

    from neat_tpu.ops._vma import out_struct

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
        smem = pltpu.SMEM
    except ImportError:  # pragma: no cover
        vmem = smem = None

    n, lanes = z_vals.shape
    assert lanes % 128 == 0, lanes
    assert n % TILE_R == 0, n

    def spec(block=None, im=None, mem=None):
        mem = mem if mem is not None else vmem
        kwargs = {"memory_space": mem} if mem is not None else {}
        if block is None:
            return pl.BlockSpec(**kwargs)
        return pl.BlockSpec(block, im, **kwargs)

    kernel = partial(
        _round_kernel,
        lanes=lanes,
        eps=eps,
        beta_iters=beta_iters,
        add_tiny=add_tiny,
        refine=refine,
    )
    grid = (n // TILE_R,)
    row = lambda i: (i, 0)
    beta_out, weights, pdf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec((1,), lambda i: (0,), mem=smem),
            spec((TILE_R, lanes), row),
            spec((TILE_R, lanes), row),
            spec((TILE_R, 1), row),
        ],
        out_specs=[
            spec((TILE_R, 1), row),
            spec((TILE_R, lanes), row),
            spec((TILE_R, lanes), row),
        ],
        out_shape=[
            out_struct((n, 1), jnp.float32, z_vals, sdf, beta),
            out_struct((n, lanes), jnp.float32, z_vals, sdf, beta),
            out_struct((n, lanes), jnp.float32, z_vals, sdf, beta),
        ],
        interpret=interpret,
    )(
        jnp.reshape(beta0.astype(jnp.float32), (1,)),
        z_vals.astype(jnp.float32),
        sdf.astype(jnp.float32),
        beta.astype(jnp.float32)[:, None],
    )
    return beta_out[:, 0], weights, pdf
