"""Scan-vs-dispatch probe for the multi-step epoch body.

RESOLVED (2026-08-20, docs/perf_round5.md): the scanned multi-step is
NOT slow — it pays a ONE-TIME ~32 s stall on its second call (donated-
layout rebind; bench_breakdown's single timed window averaged it in as
"426 ms/step"), then runs at 28.2 ms/step = the dispatched step's own
steady state. This probe therefore times the scan over REPEATED calls,
reporting the rebind call and the steady state separately, plus the
dispatched step at the same config and a trivial-matmul scan control
(where scan genuinely wins 19x because the body is far smaller than the
host round-trip). Prints one JSON line.
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
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--variants", nargs="+",
                    default=["default"],
                    help="bench_config field variants to probe")
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
    from neat_tpu.train.step import init_train_state, make_train_multi_step

    def stage(msg):
        print(f"[stage] {msg}", file=sys.stderr, flush=True)

    out = {}
    k = args.k

    # control: scan over a plain matmul chain (same K) — isolates
    # scan/While overhead itself from anything in the train step
    m = jnp.ones((1024, 1024), dtype=jnp.bfloat16)

    @jax.jit
    def matmul_scan(x):
        def body(c, _):
            return c @ m, ()

        c, _ = jax.lax.scan(body, x, None, length=k)
        return c

    @jax.jit
    def matmul_once(x):
        return x @ m

    x = jnp.ones((1024, 1024), dtype=jnp.bfloat16)
    matmul_once(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(k):
        x = matmul_once(x)
    float(np.asarray(x.sum()))
    out["matmul_dispatched_ms"] = round((time.perf_counter() - t0) / k * 1e3, 3)
    x = jnp.ones((1024, 1024), dtype=jnp.bfloat16)
    matmul_scan(x).block_until_ready()
    t0 = time.perf_counter()
    y = matmul_scan(x)
    float(np.asarray(y.sum()))
    out["matmul_scan_ms"] = round((time.perf_counter() - t0) / k * 1e3, 3)
    stage(f"matmul control: {out['matmul_dispatched_ms']} vs "
          f"{out['matmul_scan_ms']} ms/step")

    for variant in args.variants:
        cfg = bench_config(field=None if variant == "default" else variant)
        scene_dev = bench_scene(cfg)

        step, state = bench_step(cfg)
        rngs = jax.random.split(jax.random.PRNGKey(1), 2 * k + 2)
        for i in range(2):
            state, aux = step(state, scene_dev, rngs[i])
        float(np.asarray(aux["loss"]))
        t0 = time.perf_counter()
        for i in range(k):
            state, aux = step(state, scene_dev, rngs[2 + i])
        float(np.asarray(aux["loss"]))
        out[f"{variant}_dispatched_ms"] = round(
            (time.perf_counter() - t0) / k * 1e3, 3
        )
        stage(f"{variant} dispatched {out[f'{variant}_dispatched_ms']}")

        multi = make_train_multi_step(
            cfg, LossConfig(), 5e-4, 0.1, 200000, N_RAYS, BENCH_IMG_RES[1],
            donate=True,
        )
        mstate = init_train_state(
            init_neat(jax.random.PRNGKey(0), cfg), 5e-4, 0.1, 200000
        )
        keys = jax.random.split(jax.random.PRNGKey(1), 5 * k).reshape(5, k, -1)
        mstate, stacked = multi(mstate, scene_dev, keys[0])  # compile+warm
        float(np.asarray(stacked["loss"][-1]))
        t0 = time.perf_counter()
        mstate, stacked = multi(mstate, scene_dev, keys[1])  # rebind call
        float(np.asarray(stacked["loss"][-1]))
        out[f"{variant}_scan_rebind_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        for i in range(2, 5):  # steady state
            mstate, stacked = multi(mstate, scene_dev, keys[i])
        float(np.asarray(stacked["loss"][-1]))
        out[f"{variant}_scan_ms"] = round(
            (time.perf_counter() - t0) / (3 * k) * 1e3, 3
        )
        stage(f"{variant} scan steady {out[f'{variant}_scan_ms']} "
              f"(rebind {out[f'{variant}_scan_rebind_s']}s)")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
