"""Phase-level timings of the training step on the current backend.

Times, at the bench.py configuration (1024 rays, abc-neat-a, bf16 field
compute, pallas sampler on TPU):

  * sampler:   jit(neat_forward up to z_vals)  [via a sampler-only probe]
  * forward:   jit(neat_forward + loss)
  * step:      the full jitted train step (fwd + bwd + Adam)

so backward+optimizer ~= step - forward, and the accounting tool's
per-phase bytes (tools/bytes_accounting.py) can be converted into
effective per-phase bandwidths.

NOTE (round 5): this harness passes the SAME (state, rng) every call
without threading state — fine for RELATIVE phase comparisons, but its
absolute step time reads ~7% faster than the production structure
(state threaded, fresh rng per step). Do not quote it as training
throughput; bench.py measures that. Attribution: docs/perf_round5.md.

Usage: python tools/phase_timing.py [--platform cpu|axon] [--steps 20]
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
    fetch(out)  # compile + warmup
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
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--field", default="xla",
                    choices=["xla", "recompute", "stash"],
                    help="field main-pass implementation (see build_step)")
    ap.add_argument("--beta_search", default="bisect",
                    choices=["bisect", "grid"],
                    help="sampler beta line-search strategy (see build_step)")
    ap.add_argument("--fused_rounds", default="off",
                    choices=["off", "on", "interpret"],
                    help="pallas fused refinement-round kernel (see build_step)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from neat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from tools.bytes_accounting import build_step

    step, state, scene_dev = build_step(
        args.dtype, field=args.field, beta_search=args.beta_search,
        fused_rounds=args.fused_rounds,
    )
    rng = jax.random.PRNGKey(1)

    def fetch_step(out):
        s, aux = out
        float(np.asarray(aux["loss"]))

    t_step = time_fn(step, (state, scene_dev, rng), args.steps, fetch_step)

    # forward-only (loss value, no grad) at the same config
    from neat_tpu.model.loss import LossConfig, neat_loss
    from neat_tpu.model.neat import neat_forward
    from neat_tpu.train.step import sample_batch
    from neat_tpu.utils.benchscene import bench_config

    cfg = bench_config(
        dtype=args.dtype, field=args.field, beta_search=args.beta_search,
        fused_rounds=args.fused_rounds,
    )

    @jax.jit
    def fwd(params, scene, rng):
        r_batch, r_fwd = jax.random.split(rng)
        inputs, gt = sample_batch(r_batch, scene, 1024, 512)
        out = neat_forward(params, inputs, cfg, r_fwd, training=True)
        return neat_loss(out, gt, LossConfig())["loss"]

    t_fwd = time_fn(
        fwd, (state.params, scene_dev, rng), args.steps,
        lambda o: float(np.asarray(o)),
    )

    # sampler-only probe: same camera/ray prep, z_vals reduced to a scalar
    from neat_tpu.core.camera import get_camera_params
    from neat_tpu.model.neat import _sample_z

    @jax.jit
    def sampler_only(params, scene, rng):
        r_batch, r_fwd = jax.random.split(rng)
        inputs, _ = sample_batch(r_batch, scene, 1024, 512)
        uv = inputs["uv"]
        ray_dirs, cam_loc = get_camera_params(
            uv[None], inputs["pose"][None], inputs["intrinsics"][None]
        )
        ray_dirs = ray_dirs[0]
        cam_loc = jnp.broadcast_to(cam_loc, (uv.shape[0], 3))
        z_vals, z_eik = _sample_z(r_fwd, ray_dirs, cam_loc, params, cfg, True)
        return z_vals.sum() + z_eik.sum()

    t_sampler = time_fn(
        sampler_only, (state.params, scene_dev, rng), args.steps,
        lambda o: float(np.asarray(o)),
    )

    print(
        json.dumps(
            {
                "platform": jax.devices()[0].platform,
                "dtype": args.dtype,
                "field": args.field,
                "beta_search": args.beta_search,
                "fused_rounds": args.fused_rounds,
                "sampler_ms": round(t_sampler * 1e3, 2),
                "forward_ms": round(t_fwd * 1e3, 2),
                "step_ms": round(t_step * 1e3, 2),
                "bwd_plus_adam_ms": round((t_step - t_fwd) * 1e3, 2),
                "rays_per_sec": round(1024 / t_step, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
