"""Supervise a long TPU job against the axon-relay wedge.

The tunnel relay has a death mode where its TCP port stays open but the
external stdio peer stops replying: every in-flight and future TPU op
hangs forever, the client sits at ~0% CPU, and nothing recovers on its
own. Round-4 discovery: the wedge is held by the *client connection* —
SIGKILLing the wedged client process immediately unwedges the relay for
the next process (verified live twice on 2026-08-19).

This wrapper turns that into an automatic protocol so multi-hour sweeps
survive unattended:

  1. launch CMD in its own process group, appending stdout+stderr to LOG;
  2. watch LOG's mtime; if it goes stale for --stale seconds, SIGKILL the
     whole group;
  3. probe the TPU with a bounded subprocess op until it completes
     (post-kill recovery is near-immediate; the probe guards the rarer
     fully-dead relay);
  4. relaunch CMD (which must itself be resumable — e.g. geometry_sweep
     --resume continues from the latest checkpoint).

A job that EXITS is not restarted: zero propagates as success, nonzero
as its own failure (the watchdog only handles hangs, not bugs).

Usage:
    python tools/watchdog.py --log /tmp/sweep.log --stale 300 \
        -- python tools/geometry_sweep.py --resume ...
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def tpu_healthy(timeout_s: float = 180.0) -> bool:
    """One tiny TPU op in a bounded subprocess (never in-process: a
    wedged relay would hang us too)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jnp.ones(4).sum()))"],
            timeout=timeout_s, capture_output=True, text=True,
        )  # a fresh process takes 60-90 s through the tunnel when healthy
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--log", required=True,
                        help="file CMD's output is appended to; its mtime "
                        "is the liveness signal")
    parser.add_argument("--stale", type=float, default=300.0,
                        help="seconds without log growth before the job "
                        "is declared wedged (cover the longest silent "
                        "phase: compiles, distillation)")
    parser.add_argument("--poll", type=float, default=20.0)
    parser.add_argument("--max-restarts", type=int, default=30)
    parser.add_argument("cmd", nargs=argparse.REMAINDER,
                        help="-- then the command to supervise")
    args = parser.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    assert cmd, "no command given (pass it after --)"

    restarts = 0
    while True:
        with open(args.log, "ab") as logf:
            logf.write(
                f"\n[watchdog] launch #{restarts}: {' '.join(cmd)}\n"
                .encode())
            logf.flush()
            proc = subprocess.Popen(
                cmd, stdout=logf, stderr=subprocess.STDOUT,
                start_new_session=True,
            )
            print(f"[watchdog] pid {proc.pid} (restart {restarts})",
                  flush=True)
            wedged = False
            while True:
                try:
                    proc.wait(timeout=args.poll)
                    break
                except subprocess.TimeoutExpired:
                    pass
                stale_for = time.time() - os.path.getmtime(args.log)
                if stale_for > args.stale:
                    print(f"[watchdog] log stale {stale_for:.0f}s — "
                          "killing wedged group", flush=True)
                    os.killpg(proc.pid, signal.SIGKILL)
                    proc.wait()
                    wedged = True
                    break
        if not wedged:
            print(f"[watchdog] job exited rc={proc.returncode}", flush=True)
            return proc.returncode
        restarts += 1
        if restarts > args.max_restarts:
            print("[watchdog] restart budget exhausted", flush=True)
            return 75
        # post-kill the relay recovers near-immediately; bounded probes
        # guard the fully-dead case
        for attempt in range(10):
            time.sleep(10)
            if tpu_healthy():
                print("[watchdog] TPU healthy — relaunching", flush=True)
                break
            print(f"[watchdog] TPU still wedged (probe {attempt})",
                  flush=True)
        else:
            print("[watchdog] relay never recovered", flush=True)
            return 74


if __name__ == "__main__":
    sys.exit(main())
