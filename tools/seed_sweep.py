"""Multi-seed vote-gate robustness sweep (ABC protocol).

The round-2 "perfect wireframe with --vote-ratio 0.2" recipe rested on two
full-schedule runs. This driver turns it into a measured claim: for every
training run under --exps (one per seed), it distills once (finalize's
cached per-view distillation), assembles the wireframe across a vote-
threshold grid, scores each point with eval_abc, and reports

  * per seed: the window of vote thresholds where junction AND line
    P = R = 1.000 (the "perfect window"),
  * per seed: the worst-junction localization margin — max over GT
    junctions of (distance to the nearest distilled junction) / the
    tightest protocol threshold (0.01 x scale). The binary window hides
    how close a run is to the cliff: a margin of 1.07 means one junction
    missed the threshold by 7% (no window at any vote), 0.87 means 13%
    of slack. Reported at the lowest vote (the fullest junction set).
  * the across-seed intersection, in absolute votes and as a fraction of
    the view count (the --vote-ratio units the recipe is stated in).

Usage:
    python tools/seed_sweep.py --exps /root/repo/exps_seeds \
        --scan /root/reference/data/abc/00075213 \
        --data_root /root/reference/data --votes 1 60 [--out seeds.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def perfect_window(rows):
    """[lo, hi] votes where all four P/R metrics are exactly 1.0."""
    perfect = [
        r["vote"] for r in rows
        if r["jp"] == 1.0 and r["jr"] == 1.0
        and r["lp"] == 1.0 and r["lr"] == 1.0
    ]
    if not perfect:
        return None
    return [min(perfect), max(perfect)]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--exps", required=True)
    parser.add_argument("--scan", required=True)
    parser.add_argument("--data_root", default="../data")
    parser.add_argument("--votes", type=int, nargs=2, default=[1, 60],
                        metavar=("LO", "HI"))
    parser.add_argument("--checkpoint", default="latest")
    parser.add_argument("--merge-eps", type=float, default=0.0,
                        help="junction_merge_eps passed to finalize: vote-"
                        "weighted merge of voted junctions closer than this "
                        "(normalized units). Duplicates SPLIT votes, so two "
                        "half-vote copies of one junction survive every "
                        "vote gate; 0.02 = the endpoint-voting match scale")
    parser.add_argument("--out", default=None)
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu", "axon"])
    args = parser.parse_args(argv)

    if args.platform is not None:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from neat_tpu.evaluation.eval_abc import eval_abc, load_scale_mat
    from neat_tpu.utils.cache import enable_compilation_cache
    from neat_tpu.wireframe.finalize import wireframe_recon

    enable_compilation_cache()

    with open(osp.join(args.scan, "lines.json")) as f:
        jgt = np.asarray(json.load(f)["junctions"])
    scale_mat = load_scale_mat(args.scan)
    margin_thr = 0.01 * scale_mat[0, 0]

    def worst_margin(res):
        jp = np.asarray(res["junctions3d_initial"])
        if jp.shape[0] == 0:
            return float("inf")
        jps = jp @ scale_mat[:3, :3].T + scale_mat[:3, 3]
        best = np.linalg.norm(jps[:, None] - jgt[None], axis=-1).min(0)
        return float(best.max() / margin_thr)

    confs = sorted(
        glob.glob(osp.join(args.exps, "*", "*", "runconf.conf"))
    )
    assert confs, f"no runconf.conf under {args.exps}"
    lo, hi = args.votes

    report = {}
    lines = ["# Multi-seed vote-gate sweep", ""]
    for conf in confs:
        rundir = osp.dirname(conf)
        tag = "/".join(rundir.split(osp.sep)[-2:])
        rows = []
        for vote in range(lo, hi + 1):
            res = wireframe_recon(
                conf=conf,
                checkpoint=args.checkpoint,
                vote_threshold=vote,
                junction_merge_eps=args.merge_eps,
                data_root=args.data_root,
                verbose=False,
            )
            scores = eval_abc(res, args.scan, verbose=False)
            rows.append(
                dict(
                    vote=vote,
                    nj=int(res["junctions3d_initial"].shape[0]),
                    nl=int(res["lines3d_wfi_checked"].shape[0]),
                    jp=float(scores["junction_precision"][0]),
                    jr=float(scores["junction_recall"][0]),
                    lp=float(scores["line_precision"][0]),
                    lr=float(scores["line_recall"][0]),
                    jmargin=worst_margin(res),
                )
            )
            print(
                f"{tag} vote={vote}: J {rows[-1]['nj']} "
                f"P={rows[-1]['jp']:.3f} R={rows[-1]['jr']:.3f} | "
                f"L {rows[-1]['nl']} P={rows[-1]['lp']:.3f} "
                f"R={rows[-1]['lr']:.3f}",
                flush=True,
            )
        win = perfect_window(rows)
        margin = rows[0]["jmargin"]
        report[tag] = {"window": win, "margin": margin, "rows": rows}
        lines.append(f"## {tag}")
        lines.append("")
        lines.append(
            f"perfect window (votes where J and L P=R=1.000): {win}"
        )
        lines.append(
            f"worst-junction localization margin at vote={lo}: "
            f"{margin:.3f} (x the 0.01*scale threshold; <1 is inside)"
        )
        lines.append("")

    windows = [r["window"] for r in report.values()]
    if all(w is not None for w in windows):
        inter = [max(w[0] for w in windows), min(w[1] for w in windows)]
        if inter[0] > inter[1]:
            inter = None
    else:
        inter = None
    lines.append("## Intersection")
    lines.append("")
    lines.append(f"across {len(windows)} runs: {inter}")
    out_text = "\n".join(lines)
    print(out_text)
    print(json.dumps({"windows": {k: v["window"] for k, v in report.items()},
                      "margins": {k: v["margin"] for k, v in report.items()},
                      "intersection": inter}))
    if args.out:
        with open(args.out, "w") as f:
            f.write(out_text + "\n")
            f.write("\n```json\n")
            json.dump(report, f, indent=1)
            f.write("\n```\n")


if __name__ == "__main__":
    main()
