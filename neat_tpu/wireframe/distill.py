"""Alternative wireframe distillation tools.

Parity targets (reference code/evaluation/, SURVEY.md §2 C26):
  * wireframe.py:18-237  — ``simple_recon``: per-view, per-GT-line mean of
    the 2D-gated attraction lines, no junction snapping;
  * wireframe-merge.py   — ``merge_wireframes``: concatenate several line
    sets and deduplicate by bidirectional endpoint distance;
  * nms.py               — ``nms_lines``: greedy suppression of near-
    duplicate 3D segments;
  * refinement.py        — ``refine_lines_sdf``: Newton-project endpoints
    of saved lines onto the SDF zero level set.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


def simple_recon(
    params,
    cfg,
    scene,
    chunksize: int = 2048,
    dis_threshold: float = 10.0,
    verbose: bool = False,
) -> np.ndarray:
    """Per-label mean distillation without junctions (reference
    evaluation/wireframe.py). Returns (L, 2, 3) lines."""
    from .finalize import view_field_lines

    lines3d_all = []
    for view in range(scene.n_images):
        lines3d, lines2d, _, labels = view_field_lines(
            params, cfg, scene, view, chunksize
        )
        nl = scene.n_lines[view]
        gt = scene.lines[view][:nl][:, :4]
        gt_per_pix = gt[labels]
        d1 = ((lines2d - gt_per_pix) ** 2).sum(-1)
        d2 = ((lines2d - gt_per_pix[:, [2, 3, 0, 1]]) ** 2).sum(-1)
        is_correct = np.minimum(d1, d2) < dis_threshold

        by_label: Dict[int, List[np.ndarray]] = defaultdict(list)
        for lab in np.unique(labels[is_correct]):
            sel = is_correct & (labels == lab)
            by_label[int(lab)].append(lines3d[sel])
        view_lines = [
            np.concatenate(v).mean(axis=0) for v in by_label.values() if len(v)
        ]
        if view_lines:
            lines3d_all.append(np.stack(view_lines))
        if verbose:
            print(f"view {view}: {len(view_lines)} lines")
    if not lines3d_all:
        return np.zeros((0, 2, 3), dtype=np.float32)
    return np.concatenate(lines3d_all, axis=0)


def line_pair_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(A, 2, 3) x (B, 2, 3) -> (A, B) endpoint-order-min mean distance."""
    d1 = np.linalg.norm(a[:, None] - b[None], axis=-1).mean(-1)
    d2 = np.linalg.norm(a[:, None] - b[None, :, [1, 0]], axis=-1).mean(-1)
    return np.minimum(d1, d2)


def nms_lines(
    lines: np.ndarray,
    scores: Optional[np.ndarray] = None,
    threshold: float = 0.01,
) -> np.ndarray:
    """Greedy NMS over 3D segments: keep the best-scoring line of every
    near-duplicate group (reference evaluation/nms.py)."""
    if lines.shape[0] == 0:
        return lines
    scores = scores if scores is not None else np.zeros(lines.shape[0])
    order = np.argsort(scores)  # lower score (distance) = better
    lines_sorted = lines[order]
    dist = line_pair_distance(lines_sorted, lines_sorted)
    keep = np.ones(len(lines_sorted), dtype=bool)
    for i in range(len(lines_sorted)):
        if not keep[i]:
            continue
        dup = dist[i] < threshold
        dup[: i + 1] = False
        keep[dup] = False
    return lines_sorted[keep]


def merge_wireframes(
    line_sets: List[np.ndarray], dedup_threshold: float = 0.01
) -> np.ndarray:
    """Concatenate line sets and deduplicate (reference
    evaluation/wireframe-merge.py)."""
    allx = np.concatenate([l.reshape(-1, 2, 3) for l in line_sets], axis=0)
    return nms_lines(allx, threshold=dedup_threshold)


def fuse_lines(
    scene,
    lines3d: np.ndarray,
    dis_threshold: float = 10.0,
    keep_score: float = 0.5,
) -> np.ndarray:
    """Cross-view detection-score fusion (reference evaluation/fusion.py:
    79-134): project each saved 3D line into every view, match it to its
    nearest 2D detection, accumulate that detection's confidence, and keep
    lines whose mean matched confidence exceeds ``keep_score``.

    (The reference indexes the accumulated score by the enumeration index
    of the label set rather than the label itself — fusion.py:121 — which
    scrambles scores when labels are non-contiguous; this implementation
    uses the matched line's own confidence.)
    """
    from ..core.camera import project2d
    import jax.numpy as jnp

    n = lines3d.shape[0]
    if n == 0:
        return lines3d
    scores = np.zeros(n)
    counts = np.zeros(n)
    for view in range(scene.n_images):
        nl = scene.n_lines[view]
        gt5 = scene.lines[view][:nl]
        if nl == 0:
            continue
        w2c = np.linalg.inv(scene.pose[view])
        l2d = np.asarray(
            project2d(
                jnp.asarray(scene.intrinsics[view][:3, :3]),
                jnp.asarray(w2c[:3, :3]),
                jnp.asarray(w2c[:3, 3]),
                jnp.asarray(lines3d),
            )
        ).reshape(-1, 4)
        d1 = ((gt5[:, None, :4] - l2d[None]) ** 2).sum(-1)
        d2 = ((gt5[:, None, :4] - l2d[None][:, :, [2, 3, 0, 1]]) ** 2).sum(-1)
        dis = np.minimum(d1, d2)
        match_cost = dis.min(axis=0)
        match_idx = dis.argmin(axis=0)
        ok = match_cost < dis_threshold
        scores[ok] += gt5[match_idx[ok], 4]
        counts[ok] += 1
    mean_scores = scores / np.maximum(counts, 1)
    return lines3d[mean_scores > keep_score]


def grid_distill(
    lines: np.ndarray,
    cell_size: float = 0.02,
    angle_bins: int = 12,
    min_votes: int = 2,
) -> np.ndarray:
    """Grid-based line aggregation (reference evaluation/dgrid.py flavor):
    hash segments by quantized midpoint cell and direction bin, average
    each populated cell. A coarse, junction-free consolidation useful for
    dense multi-view line soups."""
    if lines.shape[0] == 0:
        return lines
    lines = lines.reshape(-1, 2, 3)
    mid = lines.mean(axis=1)
    d = lines[:, 1] - lines[:, 0]
    d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    # canonicalize direction hemisphere
    flip = d[:, 0] < 0
    d[flip] *= -1
    cell = np.floor(mid / cell_size).astype(np.int64)
    theta = np.arctan2(d[:, 1], d[:, 0])  # [-pi, pi]
    phi = np.arccos(np.clip(d[:, 2], -1, 1))
    tb = np.clip(((theta + np.pi) / (2 * np.pi) * angle_bins).astype(np.int64), 0, angle_bins - 1)
    pb = np.clip((phi / np.pi * angle_bins).astype(np.int64), 0, angle_bins - 1)
    key = np.stack([cell[:, 0], cell[:, 1], cell[:, 2], tb, pb], axis=1)
    uniq, inv, counts = np.unique(key, axis=0, return_inverse=True, return_counts=True)
    out = []
    for k in np.nonzero(counts >= min_votes)[0]:
        members = lines[inv == k]
        # align endpoint order to the first member before averaging
        ref = members[0]
        d1 = np.linalg.norm(members - ref[None], axis=-1).sum(-1)
        d2 = np.linalg.norm(members[:, [1, 0]] - ref[None], axis=-1).sum(-1)
        members = np.where((d2 < d1)[:, None, None], members[:, [1, 0]], members)
        out.append(members.mean(axis=0))
    if not out:
        return np.zeros((0, 2, 3), dtype=lines.dtype)
    # quantization splits clusters that straddle cell boundaries; merge the
    # per-cell means with an NMS pass at the cell scale
    return nms_lines(np.stack(out), threshold=cell_size)


def _cli_load_run(conf: str, checkpoint: str, data_root: str):
    import os.path as osp

    from ..train.config import load_experiment_config
    from ..train.checkpoint import load_checkpoint
    from ..data.datasets import load_scene_for_config

    assert osp.basename(conf) == "runconf.conf"
    rundir = osp.dirname(conf)
    cfg = load_experiment_config(conf)
    state, epoch = load_checkpoint(osp.join(rundir, "checkpoints"), checkpoint)
    scene = load_scene_for_config(cfg, data_root, distance_threshold=1.0)
    return rundir, cfg, state, epoch, scene


def main(argv=None):
    """CLI for the alternate distillation tools (reference
    evaluation/{wireframe,wireframe-merge,nms,fusion}.py)."""
    import argparse
    import os
    import os.path as osp

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_simple = sub.add_parser("simple", help="per-label mean distillation")
    p_simple.add_argument("--conf", required=True)
    p_simple.add_argument("--checkpoint", default="latest")
    p_simple.add_argument("--data_root", default="../data")
    p_simple.add_argument("--chunksize", type=int, default=2048)
    p_simple.add_argument("--dis-threshold", type=float, default=10.0)

    p_merge = sub.add_parser("merge", help="merge + dedup line npz files")
    p_merge.add_argument("inputs", nargs="+")
    p_merge.add_argument("--out", required=True)
    p_merge.add_argument("--threshold", type=float, default=0.01)

    p_nms = sub.add_parser("nms", help="greedy 3D line NMS")
    p_nms.add_argument("--data", required=True)
    p_nms.add_argument("--out", required=True)
    p_nms.add_argument("--threshold", type=float, default=0.01)

    p_fuse = sub.add_parser("fuse", help="cross-view detection-score fusion")
    p_fuse.add_argument("--conf", required=True)
    p_fuse.add_argument("--checkpoint", default="latest")
    p_fuse.add_argument("--data", required=True, help="lines npz to re-score")
    p_fuse.add_argument("--data_root", default="../data")
    p_fuse.add_argument("--keep-score", type=float, default=0.5)

    args = parser.parse_args(argv)

    if args.cmd == "simple":
        rundir, cfg, state, epoch, scene = _cli_load_run(
            args.conf, args.checkpoint, args.data_root
        )
        lines = simple_recon(
            state.params, cfg.model, scene,
            chunksize=args.chunksize, dis_threshold=args.dis_threshold,
            verbose=True,
        )
        out_dir = osp.join(rundir, "wireframes")
        os.makedirs(out_dir, exist_ok=True)
        out = osp.join(out_dir, f"{args.checkpoint}-simple.npz")
        np.savez(out, lines3d=lines)
        print(f"{lines.shape[0]} lines -> {out}")
    elif args.cmd == "merge":
        sets = [np.load(p)["lines3d"].reshape(-1, 2, 3) for p in args.inputs]
        merged = merge_wireframes(sets, dedup_threshold=args.threshold)
        np.savez(args.out, lines3d=merged)
        print(f"{sum(s.shape[0] for s in sets)} -> {merged.shape[0]} lines -> {args.out}")
    elif args.cmd == "nms":
        lines = np.load(args.data)["lines3d"].reshape(-1, 2, 3)
        kept = nms_lines(lines, threshold=args.threshold)
        np.savez(args.out, lines3d=kept)
        print(f"{lines.shape[0]} -> {kept.shape[0]} lines -> {args.out}")
    elif args.cmd == "fuse":
        rundir, cfg, state, epoch, scene = _cli_load_run(
            args.conf, args.checkpoint, args.data_root
        )
        lines = np.load(args.data)["lines3d"].reshape(-1, 2, 3)
        fused = fuse_lines(scene, lines, keep_score=args.keep_score)
        out = args.data.replace(".npz", "-fused.npz")
        np.savez(out, lines3d=fused)
        print(f"{lines.shape[0]} -> {fused.shape[0]} lines -> {out}")


def refine_lines_sdf(
    params, cfg, lines: np.ndarray, n_steps: int = 1, keep_threshold: float = 0.05
) -> np.ndarray:
    """Newton-project line endpoints onto the SDF surface and drop lines
    whose endpoints stay far from it (reference evaluation/refinement.py
    flavor of the finalization's junction refinement)."""
    from ..fields.mlp import implicit_sdf_feat_grad, implicit_sdf

    eps = lines.reshape(-1, 3)
    pts = jnp.asarray(eps)
    for _ in range(n_steps):
        sdf, _, grad = implicit_sdf_feat_grad(params["implicit"], pts, cfg.implicit)
        pts = pts - sdf * grad
    final_sdf = np.asarray(
        implicit_sdf(params["implicit"], pts, cfg.implicit)
    ).reshape(-1, 2)
    out = np.asarray(pts).reshape(-1, 2, 3)
    keep = (np.abs(final_sdf) < keep_threshold).all(axis=1)
    return out[keep]


if __name__ == "__main__":
    main()
