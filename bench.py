"""Benchmark: training-step throughput of the flagship NEAT model on real
hardware.

Prints ONE json line: {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Metric: rays/sec through the FULL training step (error-bounded sampling at
the abc-neat-a budget of <=5x128 SDF evals/ray, field evals + gradients,
volume rendering, attraction lines, on-device junction assignment, losses,
backward, Adam) at the reference batch size of 1024 rays on synthetic
scene data shaped like the ABC toy scene.

vs_baseline: the reference publishes no numbers (BASELINE.md); the
denominator is the reproducible schedule fact — the reference trains
1024-ray steps on one A100-class GPU, and profiling-free literature for
VolSDF-style per-step costs puts it at ~2-3k rays/s; we use 2500 rays/s as
the denominator and report the ratio. This makes vs_baseline > 1.0 mean
"faster than the estimated reference throughput per chip". The estimate's
error is bounded by a MEASURED anchor: the reference's own training step
and ours, run on the same host CPU at the same configuration, cost within
15% of each other per ray (tools/measure_reference_ratio.py; BASELINE.md
"Measured implementation-cost ratio"), so the ratio above is a hardware
ratio, not an implementation artifact.
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 2500.0
# the timed window must amortize the ONE host sync it contains: the
# closing float() fetch pays a tunnel round-trip (~28 ms on axon), which
# at 20 steps x ~26 ms inflated the reported step time ~5% (BENCH_r03's
# 36.8k vs the 38.5-39.1k steady state from 50-step phase_timing runs).
# 100 steps puts the sync at ~1% of the window.
WARMUP_STEPS = 5
BENCH_STEPS = 100


def _tpu_relay_alive(port: int = 8082, attempts: int = 6, wait_s: float = 10.0):
    """The axon TPU tunnel relay can die (see .claude/skills/verify): when
    it is down every TPU op hangs INDEFINITELY, which would wedge the
    whole bench run. Probe the relay port and retry briefly before giving
    up, so a dead tunnel fails fast and loudly instead of hanging."""
    for i in range(attempts):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return True
        except OSError:
            if i + 1 < attempts:
                time.sleep(wait_s)
    return False


def _tpu_op_completes(timeout_s: float = 120.0, attempts: int = 3,
                      wait_s: float = 60.0):
    """End-to-end TPU health: the relay's TCP listener can stay up while
    its EXTERNAL peer is wedged (observed mid-round-4: port accepts,
    every op silently hangs forever), so a port probe is not enough.
    Run one tiny jax op in a SUBPROCESS with a hard timeout — the parent
    never touches the TPU backend itself, so a hang is contained and
    killable."""
    import subprocess

    probe = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "x = jnp.ones((8, 8));"
        "print(float(np.asarray(x.sum())))"
    )
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < attempts:
            time.sleep(wait_s)
    return False


def main():
    # A THIRD relay death mode (observed 2026-08-20, three times in one
    # day): both probes above pass, then the freshly-attached client
    # wedges on its first heavy dispatch and hangs forever. SIGKILLing
    # the wedged client unwedges the relay for the next process (the
    # round-4 discovery tools/watchdog.py automates for long jobs). So
    # the measurement itself runs in a killable SUBPROCESS with a hard
    # deadline and bounded retries; this parent never touches the TPU.
    if "--measure" not in sys.argv:
        sys.exit(_supervise())

    _measure()


def _supervise(attempts: int = 3, deadline_s: float = 900.0):
    # only meaningful where the axon tunnel IS the TPU path; on a direct
    # TPU host (no relay script) the subprocess isolation is just inert
    relayed = os.path.exists("/root/.tpu_init.py")
    if relayed and not _tpu_relay_alive():
        return (
            "bench.py: TPU tunnel relay (127.0.0.1:8082) is not "
            "answering — a TPU bench would hang indefinitely. The relay "
            "is driven externally and cannot be restarted from this "
            "session; re-run when it is back."
        )
    for attempt in range(attempts):
        if relayed and not _tpu_op_completes():
            return (
                "bench.py: TPU relay port is open but an end-to-end op "
                "probe never completed (external relay peer wedged) — a "
                "TPU bench would hang indefinitely. Re-run when the "
                "tunnel is healthy."
            )
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--measure"],
                timeout=deadline_s, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            # the kill that just happened is itself the unwedge protocol;
            # loop back through the health probe and retry
            print(
                f"bench.py: measurement attempt {attempt} hung past "
                f"{deadline_s:.0f}s (client-attach wedge) — killed, "
                f"retrying",
                file=sys.stderr, flush=True,
            )
            continue
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode == 0 and out:
            print(out[-1])
            return 0
        tail = (r.stderr or r.stdout).strip().splitlines()
        print(
            f"bench.py: measurement attempt {attempt} failed rc="
            f"{r.returncode}: {tail[-1] if tail else '(no output)'}",
            file=sys.stderr, flush=True,
        )
    return "bench.py: no measurement attempt completed"


def _measure():
    import jax

    from neat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # the canonical benchmark setup (shared with the probe tools so they
    # always measure THE step this file reports): flagship abc-neat-a
    # config, pallas sampler + stashed-residual bf16 field path on TPU —
    # the best measured combination (RESULTS.md round 3; fused refinement
    # rounds stay off, a measured loss vs XLA's round block on v5e)
    from neat_tpu.utils.benchscene import (
        BENCH_N_RAYS as N_RAYS,
        bench_config,
        bench_scene,
        bench_step,
    )

    cfg = bench_config()
    scene_dev = bench_scene(cfg)
    step, state = bench_step(cfg)

    rngs = jax.random.split(jax.random.PRNGKey(1), WARMUP_STEPS + BENCH_STEPS)
    for i in range(WARMUP_STEPS):
        state, aux = step(state, scene_dev, rngs[i])
    # force a real host fetch — under the axon tunnel block_until_ready can
    # return before execution, so fetch a scalar value instead
    float(np.asarray(aux["loss"]))

    t0 = time.perf_counter()
    for i in range(BENCH_STEPS):
        state, aux = step(state, scene_dev, rngs[WARMUP_STEPS + i])
    float(np.asarray(aux["loss"]))
    dt = time.perf_counter() - t0

    rays_per_sec = N_RAYS * BENCH_STEPS / dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
