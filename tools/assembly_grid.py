"""Offline (vote x merge-eps x merge-stage) assembly grid.

The geometry sweep (tools/geometry_sweep.py) measures the finalization
recipe at ONE assembly setting per run because every extra setting costs
a finalize pass. But finalization is two-level cached: the expensive
per-view distillation (``*-distill.pkl``) is assembly-knob-free, so the
whole assembly grid — vote gate x junction-merge eps x merge stage
(pre/post vote gate) — replays from the cache in seconds on CPU, no TPU
required (reference counterpart: re-running neat-final-parsing.py
:272-302 per knob).

Used to calibrate the recipe across the synthetic wireframe families:
the round-4 sweep found near-duplicate global junctions (two latents on
one physical corner) splitting that corner's votes under the one-to-one
per-view matching (reference neat-final-parsing.py:266-271), which a
post-gate merge cannot repair — this grid quantifies the fix.

Usage:
    python tools/assembly_grid.py --workdir /tmp/exps_geom_r4 \
        [--geometries cuboid slab ...] [--eps 0.0 0.02 0.03 0.04] \
        [--votes 1 24] [--out docs/assembly_grid.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def find_distill(rundir: str) -> str:
    pkls = glob.glob(osp.join(rundir, "wireframes", "*-distill.pkl"))
    if not pkls:
        raise FileNotFoundError(f"no distill cache under {rundir}")
    return max(pkls, key=osp.getmtime)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--geometries", nargs="+", default=None,
                        help="default: every family with a distill cache")
    parser.add_argument("--eps", type=float, nargs="+",
                        default=[0.0, 0.02, 0.03, 0.04, 0.05])
    parser.add_argument("--modes", nargs="+", default=["mean", "max"],
                        choices=["mean", "max"],
                        help="merged-coordinate rule: vote-weighted mean "
                        "vs winner-takes-all")
    parser.add_argument("--coords", nargs="+", default=["latent"],
                        choices=["latent", "vote_mean", "vote_median"],
                        help="junction-coordinate source (see "
                        "assemble_wireframe)")
    parser.add_argument("--votes", type=int, nargs=2, default=None,
                        metavar=("LO", "HI"))
    parser.add_argument("--vote-ratio", type=float, default=0.2)
    parser.add_argument("--out", default=None)
    parser.add_argument("--platform", default="cpu",
                        choices=["cpu", "tpu", "axon"])
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from neat_tpu.data.datasets import load_scene_for_config
    from neat_tpu.evaluation.eval_abc import eval_abc, load_scale_mat
    from neat_tpu.train.checkpoint import load_checkpoint
    from neat_tpu.train.config import load_experiment_config
    from neat_tpu.wireframe.finalize import (
        assemble_wireframe,
        visibility_checking,
    )
    from tools.geometry_sweep import perfect_window

    scenes = osp.join(args.workdir, "scenes")
    exps = osp.join(args.workdir, "exps")
    geometries = args.geometries
    if geometries is None:
        geometries = sorted(
            osp.basename(d)[len("geom_"):]
            for d in glob.glob(osp.join(exps, "geom_*"))
        )

    report = {}
    lines = ["# Assembly grid (vote x merge-eps x merge-stage)", ""]
    for geom in geometries:
        runconfs = sorted(
            glob.glob(osp.join(exps, f"geom_{geom}", "*", "runconf.conf"))
        )
        if not runconfs:
            print(f"[{geom}] no runs, skipping", flush=True)
            continue
        runconf = runconfs[-1]
        rundir = osp.dirname(runconf)
        try:
            distill_path = find_distill(rundir)
        except FileNotFoundError:
            print(f"[{geom}] no distill cache, skipping", flush=True)
            continue
        with open(distill_path, "rb") as f:
            distilled = pickle.load(f)

        cfg = load_experiment_config(runconf)
        state, _ = load_checkpoint(osp.join(rundir, "checkpoints"), "latest")
        scene = load_scene_for_config(cfg, scenes, distance_threshold=1.0)

        scene_dir = osp.join(scenes, geom)
        with open(osp.join(scene_dir, "lines.json")) as f:
            jgt = np.asarray(json.load(f)["junctions"])
        scale_mat = load_scale_mat(scene_dir)
        margin_thr = 0.01 * scale_mat[0, 0]

        n_views = int(scene.n_images)
        lo, hi = args.votes or (1, n_views)
        recipe_vote = int(round(args.vote_ratio * n_views))

        geom_rows = {}
        for coords in args.coords:
            for stage in ("post", "pre"):
                for mode in args.modes:
                    for eps in args.eps:
                        if eps == 0.0 and (stage, mode) != (
                            "post", args.modes[0],
                        ):
                            continue  # eps 0 is merge-free per coords
                        key = f"{stage}/{mode}/{coords}/{eps:g}"
                        rows = []
                        for vote in range(lo, hi + 1):
                            res = assemble_wireframe(
                                distilled,
                                state.params,
                                cfg.model,
                                vote_threshold=vote,
                                junction_merge_eps=eps,
                                merge_before_vote=stage == "pre",
                                merge_mode=mode,
                                junction_coords=coords,
                            )
                            res["lines3d_wfi_checked"] = visibility_checking(
                                res["lines3d_wfi"], scene,
                                mindis_th=100.0, min_visible_views=5,
                            )
                            scores = eval_abc(res, scene_dir, verbose=False)
                            jp = np.asarray(res["junctions3d_initial"])
                            if jp.shape[0]:
                                jps = (
                                    jp @ scale_mat[:3, :3].T + scale_mat[:3, 3]
                                )
                                margin = float(
                                    np.linalg.norm(
                                        jps[:, None] - jgt[None], axis=-1
                                    ).min(0).max() / margin_thr
                                )
                            else:
                                margin = float("inf")
                            rows.append(dict(
                                vote=vote,
                                nj=int(jp.shape[0]),
                                nl=int(res["lines3d_wfi_checked"].shape[0]),
                                jp=float(scores["junction_precision"][0]),
                                jr=float(scores["junction_recall"][0]),
                                lp=float(scores["line_precision"][0]),
                                lr=float(scores["line_recall"][0]),
                                jp2=float(scores["junction_precision"][1]),
                                jr2=float(scores["junction_recall"][1]),
                                lp2=float(scores["line_precision"][1]),
                                lr2=float(scores["line_recall"][1]),
                                jmargin=margin,
                            ))
                        win = perfect_window(rows)
                        win2 = perfect_window(rows, "2")
                        in_win = (
                            win is not None and win[0] <= recipe_vote <= win[1]
                        )
                        geom_rows[key] = {
                            "window": win, "window_2pct": win2,
                            "recipe_in_window": in_win,
                            "rows": rows,
                        }
                        print(
                            f"[{geom}] {key}: window {win} "
                            f"(@2% {win2}) recipe vote {recipe_vote} "
                            f"{'INSIDE' if in_win else 'OUTSIDE'}",
                            flush=True,
                        )
        report[geom] = {"recipe_vote": recipe_vote, "grid": geom_rows}

        lines += [
            f"## {geom} (recipe vote {recipe_vote})", "",
            "| stage/mode/coords/eps | window @1% | window @2% | recipe @1% |",
            "|---|---|---|---|",
        ] + [
            f"| {k} | {v['window']} | {v['window_2pct']} "
            f"| {'INSIDE' if v['recipe_in_window'] else 'OUTSIDE'} |"
            for k, v in geom_rows.items()
        ] + [""]
        if args.out:
            with open(args.out, "w") as f:
                f.write("\n".join(lines) + "\n\n```json\n")
                json.dump(report, f, indent=1)
                f.write("\n```\n")

    # which settings hold for every family?
    settings = sorted({k for r in report.values() for k in r["grid"]})
    universal = [
        s for s in settings
        if all(s in r["grid"] and r["grid"][s]["recipe_in_window"]
               for r in report.values())
    ]
    lines += [
        "## Summary", "",
        f"settings where the recipe vote lies inside every family's "
        f"@1% perfect window: {universal or 'NONE'}",
    ]
    out_text = "\n".join(lines)
    print(out_text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out_text + "\n\n```json\n")
            json.dump(report, f, indent=1)
            f.write("\n```\n")


if __name__ == "__main__":
    main()
