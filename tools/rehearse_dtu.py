"""DTU-scale rehearsal on synthetic data (no real DTU scans in this
environment): exercises the full DTU pipeline at realistic shapes —
1200x1600 views, DTU camera convention (world_mat @ scale_mat), 1024
global junctions, DBSCAN proposals — through train -> finalize ->
eval_lsr (junction + 32-point line ACC/COMP) -> eval_dtu with a synthetic
ObsMask grid, so the first run on real DTU data is not the first test of
any of these paths.

Usage:
    python - <<'PY'   # once: generate the scene
    from neat_tpu.data.synthetic import generate_scene
    generate_scene("/tmp/dturehearse/toy/scan7", n_views=49,
                   res=(1200, 1600), convention="dtu")
    PY
    python tools/rehearse_dtu.py --scene-root /tmp/dturehearse \
        --conf /tmp/dturehearse/dtu-rehearsal.conf --nepoch 300
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def synthetic_gt(scan_dir: str, n_per_line: int = 64):
    """GT junctions / densely-resampled line points from lines.json
    (identity scale_mat in the synthetic DTU convention)."""
    from neat_tpu.evaluation.eval_lsr import resample_lines

    with open(osp.join(scan_dir, "lines.json")) as f:
        gt = json.load(f)
    j = np.asarray(gt["junctions"], dtype=np.float64)
    lines = j[np.asarray(gt["lines"], dtype=np.int64)]
    return j, lines, resample_lines(lines, n_per_line)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene-root", required=True)
    parser.add_argument("--conf", required=True)
    parser.add_argument("--scan", type=int, default=7)
    parser.add_argument("--nepoch", type=int, default=300)
    parser.add_argument("--exps", default=None)
    parser.add_argument("--skip-train", default=False, action="store_true",
                        help="reuse the latest run under --exps")
    parser.add_argument("--assignment", default="auction",
                        choices=["auction", "callback"],
                        help="junction-proposal assignment backend "
                        "(tools/auction_ab_dtu.py A/Bs this at DTU shapes)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--no-eval", default=False, action="store_true",
                        dest="no_eval",
                        help="stop after training (trajectory-comparison "
                        "arms in tools/auction_ab_dtu.py do their own "
                        "log/checkpoint analysis)")
    parser.add_argument("--vote-ratio", type=float, default=0.0,
                        dest="vote_ratio",
                        help="view-count-relative junction vote gate "
                        "(see finalize --vote-ratio)")
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu", "axon"],
                        help="pin the jax platform before backend init "
                        "(this image's sitecustomize defaults to the "
                        "tunneled TPU)")
    args = parser.parse_args(argv)

    if args.platform is not None:
        import jax

        jax.config.update("jax_platforms", args.platform)

    exps = args.exps or osp.join(args.scene_root, "exps")

    from neat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if not args.skip_train:
        from neat_tpu.train.runner import TrainRunner

        runner = TrainRunner(
            conf=args.conf,
            data_root=args.scene_root,
            exps_folder=exps,
            nepochs=args.nepoch,
            assignment_method=args.assignment,
            seed=args.seed,
        )
        runner.run()
        rundir = runner.rundir
    else:
        import glob

        stamps = sorted(glob.glob(osp.join(exps, "*", str(args.scan), "*")))
        if not stamps:
            stamps = sorted(glob.glob(osp.join(exps, "*", "*")))
        rundir = stamps[-1]
    print(f"rundir: {rundir}", flush=True)

    if args.no_eval:
        return

    from neat_tpu.wireframe.finalize import wireframe_recon

    results = wireframe_recon(
        conf=osp.join(rundir, "runconf.conf"),
        checkpoint="latest",
        data_root=args.scene_root,
        vote_ratio=args.vote_ratio,
        verbose=False,
    )
    print(
        f"finalized: {results['junctions3d_initial'].shape[0]} junctions, "
        f"{results['lines3d_wfi_checked'].shape[0]} wfi_checked lines",
        flush=True,
    )

    scan_dir = osp.join(args.scene_root, "toy", f"scan{args.scan}")
    gt_j, gt_lines, gt_line_pts = synthetic_gt(scan_dir)

    # --- eval_lsr: junction + 32-pt line ACC/COMP (DTU wireframe protocol)
    from neat_tpu.evaluation.eval_lsr import eval_wfr_junctions, eval_lsr_lines
    from neat_tpu.evaluation.eval_dtu import eval_dtu_points

    pred_lines = np.asarray(results["lines3d_wfi_checked"]).reshape(-1, 2, 3)
    np.savez(osp.join(rundir, "rehearsal_wfi_checked.npz"), lines3d=pred_lines)

    # the synthetic scene is metrically tiny vs real DTU (mm): use
    # radius/max_dist scaled to the unit-ish scene; junctions score ALL
    # endpoints (the reference disables their downsample, eval-wfr-dtu.py:46)
    jm = eval_wfr_junctions(
        osp.join(rundir, "rehearsal_wfi_checked.npz"),
        gt_j,
        max_dist=2.0,
    )
    lm = eval_lsr_lines(
        osp.join(rundir, "rehearsal_wfi_checked.npz"),
        gt_line_pts,
        downsample_radius=0.02,
        max_dist=2.0,
    )
    print(f"eval_lsr junctions: {jm}", flush=True)
    print(f"eval_lsr lines:     {lm}", flush=True)

    # --- eval_dtu with a synthetic ObsMask grid over the GT bbox
    lo = gt_j.min(0) - 0.3
    hi = gt_j.max(0) + 0.3
    res_grid = 0.05
    bb = np.stack([lo, hi])
    shape = tuple(((hi - lo) / res_grid).astype(int) + 1)
    obs = np.ones(shape, dtype=np.uint8)
    surf = eval_dtu_points(
        pred_lines.reshape(-1, 3),
        gt_line_pts,
        obs_mask=obs,
        bb=bb,
        res=res_grid,
        downsample_radius=0.02,
        max_dist=2.0,
        patch_size=0.5,
    )
    print(f"eval_dtu (ObsMask path): {surf}", flush=True)

    with open(osp.join(rundir, "rehearsal_metrics.json"), "w") as f:
        json.dump(
            {"junctions": jm, "lines": lm, "surface_obsmask": surf}, f, indent=2
        )
    print(f"metrics -> {rundir}/rehearsal_metrics.json", flush=True)


if __name__ == "__main__":
    main()
