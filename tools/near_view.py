"""COLMAP covisibility explorer.

Parity target: reference code/tools/near_view.py — for a COLMAP sparse
model, rank the most covisible image pairs by shared 3D points (used to
pick stereo-friendly view subsets for custom captures).
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from neat_tpu.colmap_tools.model_io import read_model  # noqa: E402


def covisibility(model_dir: str, top_k: int = 20):
    cameras, images, points3d = read_model(model_dir)
    pair_counts: Counter = Counter()
    for p in points3d.values():
        ids = sorted(set(int(i) for i in p.image_ids))
        for a_idx in range(len(ids)):
            for b_idx in range(a_idx + 1, len(ids)):
                pair_counts[(ids[a_idx], ids[b_idx])] += 1
    ranked = pair_counts.most_common(top_k)
    for (a, b), n in ranked:
        print(f"{images[a].name} <-> {images[b].name}: {n} shared points")
    return ranked


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="COLMAP sparse model dir")
    parser.add_argument("--top", type=int, default=20)
    args = parser.parse_args(argv)
    covisibility(args.model, args.top)


if __name__ == "__main__":
    main()
