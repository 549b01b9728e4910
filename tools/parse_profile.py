"""Parse a jax.profiler trace (xplane.pb) into per-op device-time totals.

The tensorboard profile plugin's converter is version-locked to its
TensorFlow build; this standalone parser reads the XSpace proto directly
and prints the top device ops — enough to find the hot ops of a training
step without TensorBoard.

Usage:
    with jax.profiler.trace("/tmp/trace"): ... run steps ...
    python tools/parse_profile.py /tmp/trace
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def parse(logdir: str, top: int = 30) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            stats = defaultdict(float)
            for line in plane.lines:
                for ev in line.events:
                    stats[meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
            if not stats:
                continue
            total = sum(stats.values())
            print(f"\n== {plane.name} ({os.path.basename(path)}): {total:.1f} ms ==")
            for name, ms in sorted(stats.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {ms:9.2f} ms  {name[:110]}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("--top", type=int, default=30)
    a = p.parse_args(argv)
    parse(a.logdir, a.top)


if __name__ == "__main__":
    main()
