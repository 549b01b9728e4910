"""Sweep the finalization assembly knobs and score each setting with the
ABC eval protocol. The expensive per-view distillation is computed once
(finalize.py's distill cache); every grid point reuses it.

Usage:
    python tools/finalize_sweep.py --conf <rundir>/runconf.conf \
        --scan /root/reference/data/abc/00075213 \
        --data_root /root/reference/data [--out sweep.md]
"""

from __future__ import annotations

import argparse
import itertools
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(argv=None):
    from neat_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", required=True)
    parser.add_argument("--scan", required=True)
    parser.add_argument("--data_root", default="../data")
    parser.add_argument("--checkpoint", default="latest")
    parser.add_argument("--vote", type=int, nargs="+", default=[1, 2, 3, 4])
    parser.add_argument("--merge-eps", type=float, nargs="+",
                        default=[0.0, 0.01, 0.02])
    parser.add_argument("--edge-votes", type=int, nargs="+", default=[1, 2, 3])
    parser.add_argument("--sdf-filter", type=float, nargs="+", default=[0.0])
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    from neat_tpu.wireframe.finalize import wireframe_recon
    from neat_tpu.evaluation.eval_abc import eval_abc

    rows = []
    grid = list(
        itertools.product(args.vote, args.merge_eps, args.edge_votes, args.sdf_filter)
    )
    for vote, eps, ev, sf in grid:
        res = wireframe_recon(
            conf=args.conf,
            checkpoint=args.checkpoint,
            vote_threshold=vote,
            junction_merge_eps=eps,
            edge_vote_threshold=ev,
            sdf_filter_threshold=sf,
            data_root=args.data_root,
            verbose=False,
        )
        scores = eval_abc(res, args.scan, verbose=False)
        rows.append(
            dict(
                vote=vote, eps=eps, ev=ev, sf=sf,
                nj=res["junctions3d_initial"].shape[0],
                nl=res["lines3d_wfi_checked"].shape[0],
                jp=scores["junction_precision"][0],
                jr=scores["junction_recall"][0],
                lp=scores["line_precision"][0],
                lr=scores["line_recall"][0],
            )
        )
        print(
            f"vote={vote} eps={eps} edge={ev} sdf={sf}: "
            f"J {rows[-1]['nj']} P={rows[-1]['jp']:.3f} R={rows[-1]['jr']:.3f} | "
            f"L {rows[-1]['nl']} P={rows[-1]['lp']:.3f} R={rows[-1]['lr']:.3f}",
            flush=True,
        )

    lines = [
        "| vote | merge eps | edge votes | sdf filter | #J | J P@1% | J R@1% | #L | L P@1% | L R@1% |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    # rank by recall first (graded, not gated on exactly 1.0 — no grid
    # point may reach it on hard scenes), precision as the tie-breaker
    for r in sorted(
        rows, key=lambda r: (-(r["jr"] + r["lr"]), -(r["jp"] + r["lp"]))
    ):
        lines.append(
            f"| {r['vote']} | {r['eps']} | {r['ev']} | {r['sf']} | {r['nj']} "
            f"| {r['jp']:.3f} | {r['jr']:.3f} | {r['nl']} | {r['lp']:.3f} | {r['lr']:.3f} |"
        )
    table = "\n".join(lines)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
