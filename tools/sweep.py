"""Checkpoint sweeper: list / prune experiment checkpoints.

Parity target: reference code/tools/sweep.py — walk the experiment tree,
report which timestamps hold which checkpoints, optionally prune all but
the newest N (the reference's disk-space housekeeping tool).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from pathlib import Path


def sweep(exps_folder: str, prune_keep: int = 0, dry_run: bool = True) -> None:
    root = Path(exps_folder)
    for ckpt_dir in sorted(root.glob("**/checkpoints")):
        ckpts = sorted(
            (p for p in ckpt_dir.glob("*.ckpt") if p.stem.isdigit()),
            key=lambda p: int(p.stem),
        )
        rel = ckpt_dir.relative_to(root)
        print(f"{rel}: {len(ckpts)} checkpoints "
              f"({', '.join(p.stem for p in ckpts[-5:])}{'...' if len(ckpts) > 5 else ''})")
        if prune_keep > 0 and len(ckpts) > prune_keep:
            for p in ckpts[:-prune_keep]:
                print(f"  {'would remove' if dry_run else 'removing'} {p.name}")
                if not dry_run:
                    p.unlink()
                    npz = p.parent / "ModelParameters" / f"{p.stem}.npz"
                    if npz.exists():
                        npz.unlink()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--exps", default="../exps")
    parser.add_argument("--prune-keep", type=int, default=0,
                        help="keep only the newest N numbered checkpoints")
    parser.add_argument("--no-dry-run", action="store_true")
    args = parser.parse_args(argv)
    sweep(args.exps, args.prune_keep, dry_run=not args.no_dry_run)


if __name__ == "__main__":
    main()
