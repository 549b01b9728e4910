"""Large-batch wall-clock frontier (VERDICT r3 #7).

Round 3 established the 1024-ray step is HBM-bandwidth-bound, so larger
ray batches cannot raise per-ray bandwidth cost — but they CAN amortize
the per-step fixed costs (dispatch, tunnel round-trips, the sampler's
bookkeeping tensors). This probe measures sustained rays/s of THE
canonical benchmark step (utils/benchscene.py — flagship abc-neat-a
config, pallas sampler + stashed bf16 field path on TPU) across ray-batch
sizes, giving the throughput-vs-batch curve that a quality-matched
large-batch schedule (fewer steps, scaled LR) would ride.

Reference anchor: the reference trains at num_pixels=1024
(code/confs/abc-neat-a.conf:7) and never varies it.

Usage:
    python tools/batch_frontier.py [--batches 1024 2048 4096 8192]
        [--steps 50] [--warmup 5] [--out docs/batch_frontier_r4.md]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def measure(n_rays: int, steps: int, warmup: int):
    import jax

    from neat_tpu.utils.benchscene import bench_config, bench_scene, bench_step

    cfg = bench_config()
    scene = bench_scene(cfg)
    step, state = bench_step(cfg, n_rays=n_rays)

    rngs = jax.random.split(jax.random.PRNGKey(1), warmup + steps)
    for i in range(warmup):
        state, aux = step(state, scene, rngs[i])
    float(np.asarray(aux["loss"]))  # host fetch: the only reliable sync

    t0 = time.perf_counter()
    for i in range(steps):
        state, aux = step(state, scene, rngs[warmup + i])
    float(np.asarray(aux["loss"]))
    dt = time.perf_counter() - t0
    return n_rays * steps / dt, dt / steps


def measure_isolated(n_rays: int, steps: int, warmup: int, timeout: int):
    """One batch point in its own subprocess: a TPU worker crash (observed
    at 8192 rays, round 5) or relay wedge costs only that point."""
    import subprocess

    cmd = [sys.executable, osp.abspath(__file__), "--batches", str(n_rays),
           "--steps", str(steps), "--warmup", str(warmup), "--no-isolate"]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout)
    except subprocess.TimeoutExpired:
        return None, "timeout"
    for line in out.stdout.splitlines():
        if line.startswith("["):
            return json.loads(line)[0], None
    err = (out.stdout + out.stderr).strip().splitlines()
    return None, err[-1] if err else f"rc={out.returncode}"


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[1024, 2048, 4096, 8192])
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--no-isolate", default=False, action="store_true",
                        dest="no_isolate",
                        help="measure in-process (single-batch recursion "
                        "target of the default subprocess isolation)")
    parser.add_argument("--point-timeout", type=int, default=600,
                        dest="point_timeout")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    from neat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    rows, failures = [], []
    for b in args.batches:
        if args.no_isolate:
            rps, spstep = measure(b, args.steps, args.warmup)
            row = dict(n_rays=b, rays_per_sec=round(rps, 1),
                       ms_per_step=round(1e3 * spstep, 2),
                       speedup_vs_1024=None)
        else:
            row, err = measure_isolated(b, args.steps, args.warmup,
                                        args.point_timeout)
            if row is None:
                failures.append(dict(n_rays=b, error=err))
                print(f"n_rays={b}: FAILED ({err})", flush=True)
                continue
        rows.append(row)
        print(f"n_rays={b}: {row['rays_per_sec']:,.0f} rays/s "
              f"({row['ms_per_step']:.2f} ms/step)", flush=True)
    if not rows:
        print(json.dumps([]))
        return
    base = rows[0]["rays_per_sec"]
    for r in rows:
        r["speedup_vs_1024"] = round(r["rays_per_sec"] / base, 3)

    lines = [
        "# Large-batch wall-clock frontier",
        "",
        f"canonical bench step (utils/benchscene.py), {args.steps} timed "
        f"steps after {args.warmup} warmup, one closing host sync",
        "",
        "| rays/step | rays/s | ms/step | vs 1024 |",
        "|---|---|---|---|",
    ] + [
        f"| {r['n_rays']} | {r['rays_per_sec']:,.0f} | {r['ms_per_step']} "
        f"| {r['speedup_vs_1024']}x |"
        for r in rows
    ] + [
        f"| {f['n_rays']} | FAILED: {f['error']} | - | - |"
        for f in failures
    ]
    text = "\n".join(lines)
    print(text)
    print(json.dumps(rows))
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
