"""Quality-matched large-batch schedule A/B (VERDICT r3 #7, second half).

tools/batch_frontier.py measures the raw throughput-vs-batch curve; this
driver answers the question that curve raises: does riding it actually
cut **wall-clock to a finalized ABC wireframe** (the BASELINE.md north
star) at matched quality? Two arms on the ABC toy scan, identical except
for the (rays/step, epochs, learning-rate) triple:

  baseline:  num_pixels=1024, nepoch=2000, lr=5e-4
             (the reference schedule, code/confs/abc-neat-a.conf:7 and
             code/training/exp_runner.py:21)
  large:     num_pixels=B,  nepoch=2000*1024/B, lr=5e-4*sqrt(B/1024)
             (same total rays; sqrt LR scaling for Adam, overridable)

The per-step exponential LR decay auto-compresses with the schedule
(train/runner.py decay_steps = nepochs * n_views), so both arms traverse
the same lr0 -> 0.1*lr0 decay profile over their run.

Each arm reports train wall-clock, sustained rays/s, the finalized
wireframe under the shipped recipe (--vote-ratio 0.2
--junction-merge-eps 0.02), eval_abc P/R at 1%/2% of scale, and the
worst-junction localization margin — i.e. whether the large-batch arm
reaches the same P=R=1.000 operating point in less wall-clock.

Usage:
    python tools/large_batch_ab.py --workdir /tmp/lb_ab \
        [--data_root /root/reference/data] [--batch 4096]
        [--base-nepoch 2000] [--lr-scale sqrt|linear|none]
        [--skip-train baseline large] [--out docs/large_batch_ab_r4.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import os.path as osp
import re
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

FLAGSHIP_CONF = osp.join(
    osp.dirname(osp.dirname(osp.abspath(__file__))), "confs", "abc-neat-a.conf"
)

_RAYS_RE = re.compile(r"\(([\d,]+) rays/s\)")


def write_arm_conf(workdir, arm, num_pixels, lr, base_conf=FLAGSHIP_CONF):
    """Base conf with the arm's (num_pixels, lr, expname) patched in."""
    with open(base_conf) as f:
        text = f.read()
    text = re.sub(r"expname = \S+", f"expname = lb_{arm}", text)
    text = re.sub(r"learning_rate = \S+", f"learning_rate = {lr!r}", text)
    text = re.sub(r"(?<![\w])num_pixels = \d+",
                  f"num_pixels = {num_pixels}", text)
    path = osp.join(workdir, f"lb_{arm}.conf")
    with open(path, "w") as f:
        f.write(text)
    return path


def median_rays(rundir):
    import numpy as np

    vals = []
    with open(osp.join(rundir, "train.log")) as f:
        for line in f:
            m = _RAYS_RE.search(line)
            if m:
                vals.append(float(m.group(1).replace(",", "")))
    # drop the compile epoch
    return float(np.median(vals[1:])) if len(vals) > 1 else float("nan")


def run_arm(arm, args, num_pixels, nepoch, lr):
    from neat_tpu.train.runner import TrainRunner

    conf_path = write_arm_conf(args.workdir, arm, num_pixels, lr,
                               base_conf=args.conf)
    exps = osp.join(args.workdir, f"exps_{arm}")
    runconfs = sorted(glob.glob(osp.join(exps, "lb_*", "*", "runconf.conf")))
    if arm in args.skip_train and runconfs:
        runconf = runconfs[-1]
        wall = float("nan")
        print(f"[{arm}] reusing {runconf}", flush=True)
    else:
        t0 = time.time()
        runner = TrainRunner(
            conf=conf_path,
            data_root=args.data_root,
            exps_folder=exps,
            nepochs=nepoch,
            seed=args.seed,
            is_continue=args.resume and bool(runconfs),
        )
        runner.run()
        wall = time.time() - t0
        runconf = osp.join(runner.rundir, "runconf.conf")
        print(f"[{arm}] trained {nepoch} epochs x {num_pixels} rays in "
              f"{wall:.0f}s", flush=True)
    return dict(arm=arm, num_pixels=num_pixels, nepoch=nepoch, lr=lr,
                runconf=runconf, train_wall_s=round(wall, 1))


def finalize_arm(rec, args):
    import numpy as np

    from neat_tpu.evaluation.eval_abc import eval_abc, load_scale_mat
    from neat_tpu.wireframe.finalize import wireframe_recon

    scan_dir = args.scan_dir or osp.join(args.data_root, "abc", "00075213")
    with open(osp.join(scan_dir, "lines.json")) as f:
        jgt = np.asarray(json.load(f)["junctions"])
    scale_mat = load_scale_mat(scan_dir)
    margin_thr = 0.01 * scale_mat[0, 0]

    t0 = time.time()
    res = wireframe_recon(
        conf=rec["runconf"],
        checkpoint="latest",
        vote_ratio=args.vote_ratio,
        junction_merge_eps=args.merge_eps,
        merge_before_vote=args.merge_before_vote,
        junction_coords=args.junction_coords,
        check_view_ratio=args.check_view_ratio,
        data_root=args.data_root,
        # per-view distillation lines double as the watchdog heartbeat
        verbose=True,
    )
    rec["finalize_wall_s"] = round(time.time() - t0, 1)
    scores = eval_abc(res, scan_dir, verbose=False)

    jp = np.asarray(res["junctions3d_initial"])
    jps = jp @ scale_mat[:3, :3].T + scale_mat[:3, 3]
    best = np.linalg.norm(jps[:, None] - jgt[None], axis=-1).min(0)
    rec.update(
        rays_per_s=median_rays(osp.dirname(rec["runconf"])),
        nj=int(jp.shape[0]),
        nl=int(res["lines3d_wfi_checked"].shape[0]),
        jp=float(scores["junction_precision"][0]),
        jr=float(scores["junction_recall"][0]),
        lp=float(scores["line_precision"][0]),
        lr_=float(scores["line_recall"][0]),
        jp2=float(scores["junction_precision"][1]),
        lp2=float(scores["line_precision"][1]),
        margin=float(best.max() / margin_thr),
    )
    return rec


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/lb_ab")
    parser.add_argument("--data_root", default="/root/reference/data")
    parser.add_argument("--conf", default=FLAGSHIP_CONF,
                        help="base conf for both arms (default: the "
                        "flagship abc-neat-a.conf; pass a geometry-sweep "
                        "scene conf to A/B on a synthetic family)")
    parser.add_argument("--scan-dir", default=None, dest="scan_dir",
                        help="scene dir holding lines.json + cameras.npz "
                        "(default: <data_root>/abc/00075213)")
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--base-nepoch", type=int, default=2000)
    parser.add_argument("--large-nepoch", type=int, default=None,
                        help="default: base-nepoch * 1024 / batch "
                        "(matched total rays)")
    parser.add_argument("--lr-scale", default="sqrt",
                        choices=["sqrt", "linear", "none"])
    parser.add_argument("--base-lr", type=float, default=5.0e-4)
    parser.add_argument("--vote-ratio", type=float, default=0.2)
    parser.add_argument("--merge-eps", type=float, default=0.02)
    parser.add_argument("--merge-before-vote", default=False,
                        action="store_true", dest="merge_before_vote")
    parser.add_argument("--junction-coords", default="latent",
                        choices=["latent", "vote_mean", "vote_median"],
                        dest="junction_coords")
    parser.add_argument("--check-view-ratio", type=float, default=0.0,
                        dest="check_view_ratio")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--skip-train", nargs="*", default=[],
                        choices=["baseline", "large"],
                        help="reuse the latest existing run for these arms")
    parser.add_argument("--resume", default=False, action="store_true")
    parser.add_argument("--arms", nargs="*", default=["baseline", "large"],
                        choices=["baseline", "large"])
    parser.add_argument("--out", default=None)
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu", "axon"])
    args = parser.parse_args(argv)

    if args.platform is not None:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from neat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(args.workdir, exist_ok=True)

    scale = {"sqrt": math.sqrt(args.batch / 1024),
             "linear": args.batch / 1024,
             "none": 1.0}[args.lr_scale]
    large_nepoch = args.large_nepoch or round(
        args.base_nepoch * 1024 / args.batch)

    plans = dict(
        baseline=(1024, args.base_nepoch, args.base_lr),
        large=(args.batch, large_nepoch, args.base_lr * scale),
    )
    recs = []
    for arm in args.arms:
        rec = finalize_arm(run_arm(arm, args, *plans[arm]), args)
        recs.append(rec)
        print(json.dumps(rec), flush=True)

    lines = [
        "# Quality-matched large-batch schedule A/B",
        "",
        f"scene {args.scan_dir or 'abc/00075213'}, matched total rays "
        f"({args.base_nepoch} x 1024 vs {large_nepoch} x {args.batch}), "
        f"lr scaling {args.lr_scale} (x{scale:.2f}), recipe "
        f"--vote-ratio {args.vote_ratio} --junction-merge-eps "
        f"{args.merge_eps} merge-before-vote={args.merge_before_vote} "
        f"junction-coords={args.junction_coords} "
        f"check-view-ratio={args.check_view_ratio}, seed {args.seed}",
        "",
        "| arm | rays/step | epochs | lr | train wall (s) | rays/s | "
        "nJ | jP | jR | nL | lP | lR | jP@2% | lP@2% | margin |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ] + [
        f"| {r['arm']} | {r['num_pixels']} | {r['nepoch']} | {r['lr']:.2e} "
        f"| {r['train_wall_s']} | {r['rays_per_s']:,.0f} | {r['nj']} "
        f"| {r['jp']:.3f} | {r['jr']:.3f} | {r['nl']} | {r['lp']:.3f} "
        f"| {r['lr_']:.3f} | {r['jp2']:.3f} | {r['lp2']:.3f} "
        f"| {r['margin']:.3f} |"
        for r in recs
    ]
    text = "\n".join(lines)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n\n```json\n"
                    + json.dumps(recs, indent=1) + "\n```\n")


if __name__ == "__main__":
    main()
