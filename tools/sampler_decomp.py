"""Decompose the error-bound sampler's device time on the current backend.

The sampler phase is ~10 ms of the ~27 ms TPU training step
(tools/phase_timing.py). Before fusing the refinement round into one
pallas kernel, measure what actually costs: the 6 batched SDF-MLP
proposal evaluations (1024 x 128 points each through the fused_sdf
kernel) or the ~40 small XLA glue ops per round (d_star, beta search,
error bound, CDF inversion, merge sort).

Probes (all jitted, fetched to host):
  * sdf_batch:    fused_sdf_eval on R*S_eval points, timed alone, x6 to
                  match the per-step proposal-eval count
  * sampler:      the full error_bound_z_vals with the real MLP
  * sampler_stub: error_bound_z_vals with sdf_fn = analytic sphere SDF
                  (costs ~nothing) — isolates the glue
  * glue_est:     sampler - 6 * sdf_batch (cross-check vs sampler_stub)

Usage: python tools/sampler_decomp.py [--platform cpu|axon] [--steps 20]
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
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--beta_search", default="bisect", choices=["bisect", "grid"],
                    help="beta line-search strategy to time (the 'grid' mode "
                    "replaces 10 sequential bisection error-bound evals per "
                    "round with one batched pass)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from neat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses
    import functools

    from neat_tpu.core.density import LaplaceDensityParams
    from neat_tpu.fields.mlp import ImplicitNetConfig, init_implicit_net
    from neat_tpu.model.neat import NeatConfig
    from neat_tpu.ops.fused_sdf import fused_sdf_eval
    from neat_tpu.sampling.samplers import error_bound_z_vals

    cfg = NeatConfig.for_abc()
    scfg = dataclasses.replace(cfg.sampler, beta_search=args.beta_search)
    icfg = cfg.implicit
    k = jax.random.PRNGKey(0)
    params = init_implicit_net(jax.random.fold_in(k, 1), icfg)
    density_params = LaplaceDensityParams.init(2e-3)

    R = args.rays
    dirs = jax.random.normal(jax.random.fold_in(k, 2), (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cam = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -2.0]), (R, 3))

    n_eval_pts = R * scfg.n_samples_eval
    pts = jax.random.uniform(
        jax.random.fold_in(k, 3), (n_eval_pts, 3), minval=-1.0, maxval=1.0
    )

    bf16 = jnp.bfloat16

    @jax.jit
    def sdf_batch(p, x):
        return fused_sdf_eval(p, x.astype(bf16), icfg).sum()

    t_sdf = time_fn(
        sdf_batch, (params, pts), args.steps, lambda o: float(np.asarray(o))
    )

    def real_sdf(p, x):
        return fused_sdf_eval(p, x.astype(bf16), icfg).astype(jnp.float32)

    def stub_sdf(x):
        return jnp.linalg.norm(x, axis=-1) - 0.5

    def run_sampler(sdf_fn):
        @jax.jit
        def f(p, rng):
            z, ze = error_bound_z_vals(
                rng, dirs.astype(bf16), cam.astype(bf16),
                functools.partial(sdf_fn, p) if sdf_fn is real_sdf else stub_sdf,
                density_params,
                scfg, training=True,
            )
            return z.sum() + ze.sum()

        return f

    rng = jax.random.PRNGKey(7)
    f_real = run_sampler(real_sdf)
    t_sampler = time_fn(
        f_real, (params, rng), args.steps, lambda o: float(np.asarray(o))
    )
    f_stub = run_sampler(None)
    t_stub = time_fn(
        f_stub, (params, rng), args.steps, lambda o: float(np.asarray(o))
    )

    n_rounds = scfg.max_total_iters + 1  # initial uniform eval + refines
    print(
        json.dumps(
            {
                "platform": jax.devices()[0].platform,
                "beta_search": args.beta_search,
                "rays": R,
                "sdf_batch_ms": round(t_sdf * 1e3, 3),
                "sdf_x%d_ms" % n_rounds: round(t_sdf * n_rounds * 1e3, 2),
                "sampler_ms": round(t_sampler * 1e3, 2),
                "sampler_stub_ms": round(t_stub * 1e3, 2),
                "glue_est_ms": round((t_sampler - n_rounds * t_sdf) * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
