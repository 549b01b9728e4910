"""Attribute the bench-of-record gap (VERDICT r4 #2).

BENCH_r03 (36.8k rays/s, 20-step window) and BENCH_r04 (36.6k, 100-step
window) both sit 5-6% under the 38.5-39.1k steady state documented from
50-step phase_timing runs. The round-4 sync-amortization fix demonstrably
did not close it, so the remaining gap is NOT the closing host fetch.
This tool measures, at the exact bench.py configuration (benchscene is
the shared source of truth), every mechanism that could separate the two
numbers:

  * relay_roundtrip_ms — one tiny-op host fetch (the tunnel's latency)
  * chainedN_ms        — bench.py's structure: state threaded through N
                         host-dispatched step calls (N = 20 and 100)
  * unchained_ms       — phase_timing's structure: same (state, rng) args
                         every call, outputs discarded (no cross-step
                         data dependence -> dispatch pipelining differs)
  * scanK_ms           — K steps chained INSIDE one XLA program
                         (make_train_multi_step); zero per-step dispatch,
                         so this is the device's true per-step time
  * dispatch_tax_ms    — chained - scan: the per-step cost of host
                         dispatch through the tunneled runtime

plus the engaged-path flags (pallas sampler/field, dtype) so a bench run
that silently fell back to the XLA path is visible.

MEASURED VERDICT (2026-08-20, docs/perf_round5.md): the gap is the
HARNESS, not dispatch — unchained reproduces the old 38.5-39.1k docs
number, chained (production) runs 27-29 ms/step, and the scan's steady
state equals chained (dispatch already hidden by async dispatch).
CAVEAT on scanK_ms/dispatch_tax_ms as printed by a single run: the
scanned program pays a ONE-TIME ~32 s stall on its second call
(layout rebind), which this tool's single timed window averages in —
read the steady-state number from /tmp/scan_iso-style repeated calls
(tools/scan_probe.py) before quoting it.

Usage: python tools/bench_breakdown.py [--steps 100] [--scan_k 25]
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--scan_k", type=int, default=25)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from neat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from neat_tpu.utils.benchscene import (
        BENCH_IMG_RES,
        BENCH_N_RAYS as N_RAYS,
        bench_config,
        bench_scene,
        bench_step,
    )
    from neat_tpu.model.loss import LossConfig
    from neat_tpu.model.neat import init_neat
    from neat_tpu.train.step import (
        init_train_state,
        make_train_multi_step,
    )

    def stage(msg):
        print(f"[stage] {msg}", file=sys.stderr, flush=True)

    cfg = bench_config()
    scene_dev = bench_scene(cfg)
    stage("scene on device")

    # --- relay round-trip: tiny op + host fetch, median of 9
    x = jnp.ones((8, 8))
    float(np.asarray(x.sum()))  # warm
    rts = []
    for _ in range(9):
        t0 = time.perf_counter()
        float(np.asarray(x.sum()))
        rts.append(time.perf_counter() - t0)
    relay_rt = float(np.median(rts))
    stage(f"relay rt {relay_rt*1e3:.1f} ms")

    # --- bench.py's exact structure (donate=True, state threaded)
    def timed_chain(n_steps):
        step, state = bench_step(cfg)
        rngs = jax.random.split(jax.random.PRNGKey(1), n_steps + 5)
        for i in range(5):
            state, aux = step(state, scene_dev, rngs[i])
        float(np.asarray(aux["loss"]))
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, aux = step(state, scene_dev, rngs[5 + i])
        float(np.asarray(aux["loss"]))
        return (time.perf_counter() - t0) / n_steps

    chained = {}
    for n in (20, args.steps):
        chained[n] = timed_chain(n)
        stage(f"chained{n} {chained[n]*1e3:.2f} ms/step")

    # --- phase_timing's structure: same args every call, donate=False
    from neat_tpu.utils.benchscene import bench_step as _bs

    step_nd, state_nd = _bs(cfg, donate=False)
    rng = jax.random.PRNGKey(1)
    out = step_nd(state_nd, scene_dev, rng)
    float(np.asarray(out[1]["loss"]))
    out = step_nd(state_nd, scene_dev, rng)
    float(np.asarray(out[1]["loss"]))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = step_nd(state_nd, scene_dev, rng)
    float(np.asarray(out[1]["loss"]))
    unchained = (time.perf_counter() - t0) / args.steps
    stage(f"unchained {unchained*1e3:.2f} ms/step")

    # --- K steps inside ONE program: the device's true per-step time
    multi = make_train_multi_step(
        cfg, LossConfig(), 5e-4, 0.1, 200000, N_RAYS, BENCH_IMG_RES[1],
        donate=True,
    )
    state = init_train_state(
        init_neat(jax.random.PRNGKey(0), cfg), 5e-4, 0.1, 200000
    )
    k = args.scan_k
    n_calls = max(1, args.steps // k)
    keys = jax.random.split(jax.random.PRNGKey(1), (n_calls + 1) * k).reshape(
        n_calls + 1, k, -1
    )
    state, stacked = multi(state, scene_dev, keys[0])  # compile + warm
    float(np.asarray(stacked["loss"][-1]))
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, stacked = multi(state, scene_dev, keys[1 + i])
    float(np.asarray(stacked["loss"][-1]))
    scan_per_step = (time.perf_counter() - t0) / (n_calls * k)

    chained_n = chained[args.steps]
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "pallas_sampler": bool(cfg.use_pallas_sampler),
        "pallas_field": bool(cfg.use_pallas_field),
        "field_backward": cfg.pallas_field_backward,
        "dtype": cfg.field_compute_dtype,
        "relay_roundtrip_ms": round(relay_rt * 1e3, 2),
        "chained20_ms": round(chained[20] * 1e3, 3),
        f"chained{args.steps}_ms": round(chained_n * 1e3, 3),
        "unchained_ms": round(unchained * 1e3, 3),
        f"scan{k}_ms": round(scan_per_step * 1e3, 3),
        "dispatch_tax_ms": round((chained_n - scan_per_step) * 1e3, 3),
        "rays_per_s_chained": round(N_RAYS / chained_n, 1),
        "rays_per_s_scan": round(N_RAYS / scan_per_step, 1),
    }))


if __name__ == "__main__":
    main()
