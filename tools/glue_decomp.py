"""Decompose the error-bound sampler's glue time into its three candidate
fusion targets, each timed as an isolated jitted loop on the current
backend at the production shapes (1024 rays, rounds S = 128..640):

  * bisect:  d_star + the 10-step beta bisection (6 rounds' worth)
  * invert:  the 5 inverse-CDF draws (gather-free masked reductions)
  * sort:    the 4 two-operand merge sorts + the final z sort
  * weights: per-round density/alpha/transmittance + refinement pdf/cdf

This tells which part of the ~3.5 ms sampler_stub_ms (tools/
sampler_decomp.py) a fused Pallas refinement kernel must subsume to pay
for itself.

Usage: python tools/glue_decomp.py [--platform cpu|axon] [--steps 50]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def time_fn(fn, args, n, fetch):
    out = fn(*args)
    fetch(out)
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--rays", type=int, default=1024)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from neat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from neat_tpu.core.density import LaplaceDensityParams, laplace_density
    from neat_tpu.core.render import alpha_transmittance
    from neat_tpu.sampling.samplers import _d_star, _error_bound, _invert_cdf

    R = args.rays
    density_params = LaplaceDensityParams.init(2e-3)
    beta_min = 1e-4
    eps = 0.1
    rounds = [128, 256, 384, 512, 640]  # S per refinement round
    k = jax.random.PRNGKey(0)

    def mk(S, seed):
        kk = jax.random.fold_in(k, seed)
        z = jnp.sort(
            jax.random.uniform(kk, (R, S), minval=0.0, maxval=6.0), axis=-1
        )
        sdf = jax.random.normal(jax.random.fold_in(kk, 1), (R, S)) * 0.3
        return z, sdf

    data = [mk(S, i) for i, S in enumerate(rounds)]
    fetch = lambda o: float(np.asarray(o))

    # --- bisect: d_star + 10-step bisection per round, all 5 rounds + the
    # final-round d_star/curr_error check (6 error-bound regimes total)
    @jax.jit
    def bisect_all(data):
        acc = 0.0
        for z, sdf in data:
            dists = z[..., 1:] - z[..., :-1]
            d_star = _d_star(z, sdf)
            beta0 = 2e-3
            beta_lo = jnp.full((R,), beta0)
            beta_hi = jnp.full((R,), 0.5)
            for _ in range(10):
                beta_mid = 0.5 * (beta_lo + beta_hi)
                err = _error_bound(
                    beta_mid[:, None], density_params, beta_min, sdf, dists, d_star
                )
                ok = err <= eps
                beta_hi = jnp.where(ok, beta_mid, beta_hi)
                beta_lo = jnp.where(ok, beta_lo, beta_mid)
            acc = acc + beta_hi.sum()
        return acc

    t_bisect = time_fn(bisect_all, (data,), args.steps, fetch)

    # --- weights + refinement pdf/cdf per round
    @jax.jit
    def weights_all(data):
        acc = 0.0
        for z, sdf in data:
            dists = z[..., 1:] - z[..., :-1]
            d_star = _d_star(z, sdf)
            beta = jnp.full((R, 1), 0.05)
            density = laplace_density(
                sdf, density_params, beta_min=beta_min, beta=beta
            )
            alpha, transmittance, _ = alpha_transmittance(z, density)
            err_sec = jnp.exp(-d_star / beta) * (dists**2) / (4.0 * beta**2)
            err_int = jnp.cumsum(err_sec, axis=-1)
            bound_opacity = (
                jnp.clip(jnp.exp(err_int), max=1e6) - 1.0
            ) * transmittance[..., :-1]
            pdf = bound_opacity / jnp.sum(bound_opacity + 1e-6, -1, keepdims=True)
            acc = acc + pdf.sum() + (alpha * transmittance).sum()
        return acc

    t_weights = time_fn(weights_all, (data,), args.steps, fetch)

    # --- invert: 5 inverse-CDF draws of 128 at growing S
    @jax.jit
    def invert_all(data):
        acc = 0.0
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 128), (R, 128))
        for z, sdf in data:
            pdf = jnp.abs(sdf[..., :-1]) + 1e-5
            pdf = pdf / pdf.sum(-1, keepdims=True)
            cdf = jnp.cumsum(pdf, axis=-1)
            cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
            acc = acc + _invert_cdf(z, cdf, u).sum()
        return acc

    t_invert = time_fn(invert_all, (data,), args.steps, fetch)

    # --- sort: the 4 merge sorts (256..768 wide, 2-operand) + final sort
    @jax.jit
    def sort_all(data):
        acc = 0.0
        for z, sdf in data[:4]:
            new_z = jnp.flip(z[:, :128], -1)  # any non-sorted addition
            z_cat = jnp.concatenate([z, new_z], -1)
            s_cat = jnp.concatenate([sdf, sdf[:, :128]], -1)
            zs, ss = jax.lax.sort((z_cat, s_cat), dimension=-1, num_keys=1)
            acc = acc + zs.sum() + ss[:, :1].sum()
        acc = acc + jnp.sort(data[4][0][:, :98], axis=-1).sum()
        return acc

    t_sort = time_fn(sort_all, (data,), args.steps, fetch)

    print(
        json.dumps(
            {
                "platform": jax.devices()[0].platform,
                "rays": R,
                "bisect_ms": round(t_bisect * 1e3, 3),
                "weights_pdf_ms": round(t_weights * 1e3, 3),
                "invert_ms": round(t_invert * 1e3, 3),
                "sort_ms": round(t_sort * 1e3, 3),
                "sum_ms": round(
                    (t_bisect + t_weights + t_invert + t_sort) * 1e3, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
