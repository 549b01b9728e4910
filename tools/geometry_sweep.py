"""Geometry-generalization sweep (VERDICT r3 #3).

Every quality claim so far rode one scene geometry (ABC scan 00075213 and
the cuboid toy). This driver measures the finalization recipe
(--vote-ratio 0.2 --junction-merge-eps 0.02, docs/seed_sweep_r3.md) across
STRUCTURALLY distinct wireframe families (data/synthetic.py GEOMETRIES):

  bipyramid  — valence-6 apex junctions (vote gate / merge-eps stress)
  slab       — near-parallel line pairs 0.1 units apart
  stacked    — T-junctions on a face interior + occlusion-heavy layout
  grid       — dense small cells, collinear X-junctions 0.4 units apart
  tetra      — sparse large frame, minimal (3-line) junction support
  cuboid     — the control (the family every prior claim used)

Per family: generate the scene, train the flagship configuration
(reduced-resolution synthetic schedule), then sweep the vote-threshold
grid with finalize + eval_abc exactly like tools/seed_sweep.py, reporting
the perfect window (votes where junction AND line P = R = 1.000 at the
tightest 0.01*scale threshold), the worst-junction localization margin,
and whether --vote-ratio 0.2 lies inside the window.

Usage:
    python tools/geometry_sweep.py --workdir /root/exps_geom \
        [--geometries bipyramid slab ...] [--nepoch 2000] [--views 24]
        [--res 128] [--votes 1 N] [--skip-train] [--out docs/geometry_sweep.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

CONF_TEMPLATE = """
model {{
    scene_bounding_sphere = 3.0
    feature_vector_size = 256
    dbscan_enabled = False
    use_l3d = False
    use_median = True
    field_compute_dtype = bfloat16
    implicit_network {{
        dims = [256, 256, 256, 256, 256, 256, 256, 256]
        skip_in = [4]
        d_in = 3
        d_out = 1
        multires = 6
        geometric_init = True
        bias = 0.6
        weight_norm = True
        sphere_scale = 20.0
    }}
    rendering_network {{
        dims = [256, 256, 256, 256]
        d_in = 9
        d_out = 3
        mode = idr
        multires_view = 4
        weight_norm = True
    }}
    attraction_network {{
        dims = [256, 256, 256, 256]
        d_in = 9
        d_out = 6
        mode = idr
        weight_norm = True
    }}
    global_junctions {{
        num_junctions = 64
        dim_hidden = 256
        num_layers = 2
        dim_out = 3
    }}
    density {{
        beta_min = 0.0001
        params_init {{ beta = 0.1 }}
    }}
    ray_sampler {{
        N_samples = 64
        N_samples_eval = 128
        N_samples_extra = 32
        near = 0.0
        eps = 0.1
        beta_iters = 10
        max_total_iters = 5
    }}
}}
loss {{
    rgb_loss = torch.nn.L1Loss
    eikonal_weight = 0.1
    line_weight = 0.01
}}
dataset {{
    data_dir = {geom}
    img_res = [{res}, {res}]
}}
train {{
    expname = geom_{geom}
    dataset_class = datasets.blender_hawp_dataset.BlenderDataset
    model_class = model.networks.neat_wfr_rend_a.VolSDFNetwork
    loss_class = model.networks.loss_wfr.VolSDFLoss
    learning_rate = 5.0e-4
    num_pixels = 1024
    checkpoint_freq = 100
    plot_freq = 100000
    split_n_pixels = 1024
}}
plot {{
    plot_nimgs = 1
    resolution = 32
    grid_boundary = [-1.5, 1.5]
}}
"""

DEFAULT_GEOMETRIES = ["cuboid", "bipyramid", "slab", "stacked", "grid", "tetra"]


def perfect_window(rows, suffix=""):
    """Votes where junction AND line P = R = 1.000 at the threshold tier
    named by suffix ("" = 1% of scale, "2" = the 2% fallback tier)."""
    perfect = [
        r["vote"] for r in rows
        if r["jp" + suffix] == 1.0 and r["jr" + suffix] == 1.0
        and r["lp" + suffix] == 1.0 and r["lr" + suffix] == 1.0
    ]
    return [min(perfect), max(perfect)] if perfect else None


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--geometries", nargs="+", default=DEFAULT_GEOMETRIES)
    parser.add_argument("--nepoch", type=int, default=2000)
    parser.add_argument("--views", type=int, default=24)
    parser.add_argument("--res", type=int, default=128)
    parser.add_argument("--votes", type=int, nargs=2, default=None,
                        metavar=("LO", "HI"),
                        help="default: 1 .. views (the full gate range)")
    parser.add_argument("--merge-eps", type=float, default=0.02)
    parser.add_argument("--merge-before-vote", default=False,
                        action="store_true",
                        help="pre-gate duplicate merge (split votes "
                        "recombine; docs/geometry_sweep_notes_r4.md)")
    parser.add_argument("--junction-coords", default="latent",
                        choices=["latent", "vote_mean", "vote_median"],
                        help="junction coordinate source (see "
                        "assemble_wireframe)")
    parser.add_argument("--vote-ratio", type=float, default=0.2,
                        help="the recipe under test; reported in/out per "
                        "family")
    parser.add_argument("--check-view-ratio", type=float, default=0.0,
                        dest="check_view_ratio",
                        help="visibility-check gate as a fraction of the "
                        "view count (0 = the reference's absolute "
                        "ckview=5; 0.1 = the calibrated recipe)")
    parser.add_argument("--seed", type=int, default=42,
                        help="training seed (the runner default is 42, "
                        "the reference's exp_runner.py:36 constant); "
                        "non-default seeds get an _s{seed} expname "
                        "suffix so seed-sweep runs coexist in one "
                        "workdir (VERDICT r4 #7)")
    parser.add_argument("--skip-train", default=False, action="store_true",
                        help="reuse existing runs under workdir/exps")
    parser.add_argument("--resume", default=False, action="store_true",
                        help="continue an interrupted training run from "
                        "its latest checkpoint instead of starting fresh "
                        "(a wedged TPU relay mid-sweep otherwise loses "
                        "the partial run)")
    parser.add_argument("--out", default=None)
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu", "axon"])
    args = parser.parse_args(argv)

    if args.platform is not None:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from neat_tpu.data.synthetic import generate_scene
    from neat_tpu.evaluation.eval_abc import eval_abc, load_scale_mat
    from neat_tpu.utils.cache import enable_compilation_cache
    from neat_tpu.wireframe.finalize import wireframe_recon

    enable_compilation_cache()

    scenes = osp.join(args.workdir, "scenes")
    exps = osp.join(args.workdir, "exps")
    os.makedirs(scenes, exist_ok=True)
    lo, hi = args.votes or (1, args.views)

    report = {}
    lines = [
        "# Geometry-generalization sweep",
        "",
        f"schedule: {args.nepoch} epochs x {args.views} views, "
        f"res {args.res}, merge-eps {args.merge_eps}, "
        f"merge-before-vote {args.merge_before_vote}, "
        f"junction-coords {args.junction_coords}, "
        f"check-view-ratio {args.check_view_ratio}, "
        f"seed {args.seed}, "
        f"recipe vote-ratio {args.vote_ratio} "
        f"(= {int(round(args.vote_ratio * args.views))} votes)",
        "",
    ]
    for geom in args.geometries:
        scene_dir = osp.join(scenes, geom)
        if not osp.exists(osp.join(scene_dir, "lines.json")):
            generate_scene(
                scene_dir, n_views=args.views, res=(args.res, args.res),
                geometry=geom,
            )
            print(f"[{geom}] scene written", flush=True)

        conf_path = osp.join(scenes, f"{geom}.conf")
        with open(conf_path, "w") as f:
            f.write(CONF_TEMPLATE.format(geom=geom, res=args.res))

        suffix = "" if args.seed == 42 else f"_s{args.seed}"
        runconfs = sorted(
            glob.glob(osp.join(exps, f"geom_{geom}{suffix}", "*",
                               "runconf.conf"))
        )
        if args.skip_train and runconfs:
            runconf = runconfs[-1]
            print(f"[{geom}] reusing {runconf}", flush=True)
        else:
            from neat_tpu.train.runner import TrainRunner

            t0 = time.time()
            runner = TrainRunner(
                conf=conf_path,
                data_root=scenes,
                exps_folder=exps,
                expname_suffix=suffix,
                nepochs=args.nepoch,
                seed=args.seed,
                is_continue=args.resume and bool(runconfs),
            )
            runner.run()
            runconf = osp.join(runner.rundir, "runconf.conf")
            print(
                f"[{geom}] trained in {time.time() - t0:.0f}s -> {runconf}",
                flush=True,
            )

        with open(osp.join(scene_dir, "lines.json")) as f:
            jgt = np.asarray(json.load(f)["junctions"])
        scale_mat = load_scale_mat(scene_dir)
        margin_thr = 0.01 * scale_mat[0, 0]

        def worst_margin(res):
            jp = np.asarray(res["junctions3d_initial"])
            if jp.shape[0] == 0:
                return float("inf")
            jps = jp @ scale_mat[:3, :3].T + scale_mat[:3, 3]
            best = np.linalg.norm(jps[:, None] - jgt[None], axis=-1).min(0)
            return float(best.max() / margin_thr)

        rows = []
        for vote in range(lo, hi + 1):
            res = wireframe_recon(
                conf=runconf,
                checkpoint="latest",
                vote_threshold=vote,
                junction_merge_eps=args.merge_eps,
                merge_before_vote=args.merge_before_vote,
                junction_coords=args.junction_coords,
                check_view_ratio=args.check_view_ratio,
                data_root=scenes,
                # the first vote runs the (cached) per-view distillation,
                # silent for many minutes when quiet — its per-view lines
                # are the liveness heartbeat tools/watchdog.py keys on
                verbose=vote == lo,
            )
            scores = eval_abc(res, scene_dir, verbose=False)
            rows.append(
                dict(
                    vote=vote,
                    nj=int(res["junctions3d_initial"].shape[0]),
                    nl=int(res["lines3d_wfi_checked"].shape[0]),
                    jp=float(scores["junction_precision"][0]),
                    jr=float(scores["junction_recall"][0]),
                    lp=float(scores["line_precision"][0]),
                    lr=float(scores["line_recall"][0]),
                    # the 2%-of-scale tier (eval_abc's middle threshold):
                    # the calibrated fallback when camera resolution puts
                    # the ~2 px localization floor near the 1% bar
                    jp2=float(scores["junction_precision"][1]),
                    jr2=float(scores["junction_recall"][1]),
                    lp2=float(scores["line_precision"][1]),
                    lr2=float(scores["line_recall"][1]),
                    jmargin=worst_margin(res),
                )
            )
            print(
                f"[{geom}] vote={vote}: J {rows[-1]['nj']} "
                f"P={rows[-1]['jp']:.3f} R={rows[-1]['jr']:.3f} | "
                f"L {rows[-1]['nl']} P={rows[-1]['lp']:.3f} "
                f"R={rows[-1]['lr']:.3f} margin={rows[-1]['jmargin']:.3f}",
                flush=True,
            )
        win = perfect_window(rows)
        win2 = perfect_window(rows, "2") if "jp2" in rows[0] else None
        recipe_vote = int(round(args.vote_ratio * args.views))
        in_window = win is not None and win[0] <= recipe_vote <= win[1]
        in_window2 = win2 is not None and win2[0] <= recipe_vote <= win2[1]
        report[geom] = {
            "window": win,
            "window_2pct": win2,
            "margin": rows[0]["jmargin"],
            "recipe_vote": recipe_vote,
            "recipe_in_window": in_window,
            "recipe_in_window_2pct": in_window2,
            "rows": rows,
        }
        lines += [
            f"## {geom}",
            "",
            f"perfect window @1%: {win} (@2%: {win2}); "
            f"margin {rows[0]['jmargin']:.3f}; "
            f"recipe vote {recipe_vote} "
            f"{'INSIDE' if in_window else 'OUTSIDE'} @1%, "
            f"{'INSIDE' if in_window2 else 'OUTSIDE'} @2%",
            "",
            "| vote | nJ | jP | jR | nL | lP | lR | jP@2% | lP@2% | margin |",
            "|---|---|---|---|---|---|---|---|---|---|",
        ] + [
            f"| {r['vote']} | {r['nj']} | {r['jp']:.3f} | {r['jr']:.3f} "
            f"| {r['nl']} | {r['lp']:.3f} | {r['lr']:.3f} "
            f"| {r.get('jp2', float('nan')):.3f} "
            f"| {r.get('lp2', float('nan')):.3f} "
            f"| {r['jmargin']:.3f} |"
            for r in rows
        ] + [""]
        # write after EVERY family so an interrupted sweep still leaves
        # its completed families on disk
        if args.out:
            with open(args.out, "w") as f:
                f.write("\n".join(lines) + "\n\n```json\n")
                json.dump(report, f, indent=1)
                f.write("\n```\n")

    ok = [g for g, r in report.items() if r["recipe_in_window"]]
    ok2 = [g for g, r in report.items() if r["recipe_in_window_2pct"]]
    lines += [
        "## Summary",
        "",
        f"recipe holds on {len(ok)}/{len(report)} families @1%: {ok}; "
        f"on {len(ok2)}/{len(report)} @2%: {ok2}",
    ]
    out_text = "\n".join(lines)
    print(out_text)
    print(json.dumps({
        g: {k: v for k, v in r.items() if k != "rows"}
        for g, r in report.items()
    }))
    if args.out:
        with open(args.out, "w") as f:
            f.write(out_text + "\n\n```json\n")
            json.dump(report, f, indent=1)
            f.write("\n```\n")


if __name__ == "__main__":
    main()
