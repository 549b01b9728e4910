"""Distillation debug tools (reference code/evaluation/wireframe-debug.py
and code/evaluation/debug.py).

Both reference scripts are interactive one-off probes of the trained
attraction field:

  * ``softmax_distill`` — per-GT-line-label softmax-weighted 3D line means
    with endpoint-order correction (wireframe-debug.py:96-130): for each
    detected 2D line, evaluate the field on its support pixels, keep
    renders within sqrt(10) px, softmax(-distance)-weight the 3D segments
    and average. The reference ends in a pdb prompt; here the per-view
    results are returned and optionally written to npz.
  * ``debug_recon`` — the chunked per-view dump (debug.py:100-219): writes
    per-view support-mask PNGs plus per-label grouped lines3d / l3d points
    / score arrays, the raw material for inspecting which detected lines
    the field has learned.
  * ``show_view`` — the headless counterpart of the ``neat_wfr_rend_show``
    model variant (model/networks/neat_wfr_rend_show.py:416-470), which is
    rend_a's forward hacked into an interactive probe: it loads the GT mesh
    into a trimesh scene, breaks into pdb mid-forward, and matplotlib-plots
    the sampled ray extents (red), the distilled attraction lines (blue),
    and the global junctions (green) projected into the current view.
    Windowed viewers are impossible headless; this renders the same
    overlay to a PNG over the view's image and returns the arrays.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from collections import defaultdict
from typing import Dict, Optional

import numpy as np

from ..model.neat import NeatConfig
from .finalize import view_field_lines


def softmax_distill(
    params,
    cfg: NeatConfig,
    scene,
    view: int,
    chunksize: int = 2048,
    line_dis_threshold: float = 10.0,
) -> Dict[str, np.ndarray]:
    """Per-label softmax-weighted line means for one view (reference
    wireframe-debug.py:96-130). Returns {lines3d (L, 2, 3), labels (L,)}."""
    lines3d, lines2d, _, labels = view_field_lines(
        params, cfg, scene, view, chunksize
    )
    nl = scene.n_lines[view]
    gt5 = scene.lines[view][:nl]

    out_lines, out_labels = [], []
    for label in np.unique(labels):
        idx = np.nonzero(labels == label)[0]
        if label >= nl:
            continue
        gt = gt5[label][:4]
        pred = lines2d[idx]
        d1 = ((pred - gt[[0, 1, 2, 3]]) ** 2).sum(-1)
        d2 = ((pred - gt[[2, 3, 0, 1]]) ** 2).sum(-1)
        dis = np.minimum(d1, d2)
        is_learned = dis < line_dis_threshold
        if is_learned.sum() == 0:
            continue
        seg = lines3d[idx].copy()
        swap = d2 < d1
        seg[swap] = seg[swap][:, [1, 0]]
        seg = seg[is_learned]
        w = dis[is_learned]
        w = np.exp(-(w - w.min()))
        w = w / w.sum()
        out_lines.append((seg * w[:, None, None]).sum(axis=0))
        out_labels.append(label)

    if not out_lines:
        return {
            "lines3d": np.zeros((0, 2, 3), np.float32),
            "labels": np.zeros((0,), np.int64),
        }
    return {
        "lines3d": np.stack(out_lines),
        "labels": np.asarray(out_labels),
    }


def debug_recon(
    params,
    cfg: NeatConfig,
    scene,
    out_dir: str,
    chunksize: int = 2048,
    line_dis_threshold: float = 10.0,
    write_masks: bool = True,
    verbose: bool = True,
) -> Dict[str, np.ndarray]:
    """Per-view distillation dump (reference debug.py:100-219): support
    mask images + per-label grouped segments with support scores."""
    os.makedirs(out_dir, exist_ok=True)
    mask_dir = osp.join(out_dir, "masks")
    if write_masks:
        os.makedirs(mask_dir, exist_ok=True)

    lines3d_all, points3d_all, scores_all, cameras = [], [], [], []
    h, w = scene.img_res
    for view in range(scene.n_images):
        if write_masks:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            im = scene.mask[view].reshape(h, w).astype(np.uint8) * 255
            plt.imsave(osp.join(mask_dir, f"{view:04d}.png"), im, cmap="gray")

        lines3d, lines2d, l3d, labels = view_field_lines(
            params, cfg, scene, view, chunksize
        )
        nl = scene.n_lines[view]
        gt5 = scene.lines[view][:nl]
        view_lines = []
        for label in np.unique(labels):
            if label >= nl:
                continue
            idx = np.nonzero(labels == label)[0]
            gt = gt5[label][:4]
            pred = lines2d[idx]
            d1 = ((pred - gt[[0, 1, 2, 3]]) ** 2).sum(-1)
            d2 = ((pred - gt[[2, 3, 0, 1]]) ** 2).sum(-1)
            dis = np.minimum(d1, d2)
            keep = dis < line_dis_threshold
            if keep.sum() == 0:
                continue
            # the kept LINE averages the 2D-gated segments, but the
            # support set and its score use ALL the label's pixels
            # (reference debug.py:173,185-187 appends points3d_valid[idx]
            # unfiltered) — outlier support pixels must be able to fail a
            # line downstream (refinement.py scores < 0.01 gate)
            seg = lines3d[idx][keep].mean(axis=0)
            support = l3d[idx]
            denom = max(np.linalg.norm(seg[1] - seg[0]), 1e-6)
            sdist = (
                np.linalg.norm(
                    np.cross(support - seg[0], support - seg[1]), axis=-1
                )
                / denom
            )
            view_lines.append(seg)
            points3d_all.append(support.astype(np.float32))
            scores_all.append(np.float32(sdist.mean()))
        if view_lines:
            lines3d_all.append(np.stack(view_lines).astype(np.float32))
        cameras.append(scene.pose[view])
        if verbose and view % 20 == 0:
            total = sum(l.shape[0] for l in lines3d_all)
            print(f"view {view}: {total} grouped lines so far")

    # the reference artifact contract (debug.py:207-219): lines3d is an
    # object array of per-view (L, 2, 3) arrays, points3d_all an object
    # array of per-label support point SETS, scores flat — refinement.py
    # reads exactly these keys, and the viewers np.concatenate them
    lines3d_obj = np.empty(len(lines3d_all), dtype=object)
    for i, l in enumerate(lines3d_all):
        lines3d_obj[i] = l
    points3d_obj = np.empty(len(points3d_all), dtype=object)
    for i, p in enumerate(points3d_all):
        points3d_obj[i] = p
    result = {
        "lines3d": lines3d_obj,
        "points3d_all": points3d_obj,
        "scores": np.asarray(scores_all, dtype=np.float32),
        "cameras": np.stack(cameras),
    }
    np.savez(osp.join(out_dir, "debug_lines.npz"), **result)
    if verbose:
        n = sum(l.shape[0] for l in lines3d_all)
        print(f"wrote {out_dir}/debug_lines.npz ({n} lines)")
    return result


def show_view(
    params,
    cfg: NeatConfig,
    scene,
    view: int,
    chunksize: int = 2048,
    n_rays: int = 64,
    seed: int = 0,
    out_path: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """Project the rend_show overlay for one view, headlessly.

    Mirrors reference neat_wfr_rend_show.py:457-468: ``rays2d`` are the
    projected extents of the per-ray sample interval (the reference plots
    ``points[:, [0, -1]]`` — the first/last z samples, which span
    [near, far] = [ray_sampler.near, 2 x scene_bounding_sphere], the
    error-bounded sampler's interval with the shipped confs), ``lines2d``
    the distilled attraction-field segments, ``junctions2d`` the global
    junction set ``ffn(latents)`` (rend_show:463-464).
    """
    import jax.numpy as jnp

    from ..core.camera import get_camera_params, project2d
    from ..fields.mlp import global_junctions_forward

    h, w = scene.img_res
    pix = np.nonzero(scene.mask[view])[0]
    rs = np.random.RandomState(seed)
    pick = rs.choice(pix, size=min(n_rays, len(pix)), replace=False)
    uv = np.stack([pick % w, pick // w], axis=-1).astype(np.float32)

    pose = jnp.asarray(scene.pose[view])
    intr = jnp.asarray(scene.intrinsics[view])
    dirs, loc = get_camera_params(jnp.asarray(uv)[None], pose[None], intr[None])
    dirs = dirs[0]
    near_far = jnp.asarray(
        [cfg.sampler.near, 2.0 * cfg.scene_bounding_sphere], jnp.float32
    )
    rays3d = loc[:, None, :] + near_far[None, :, None] * dirs[:, None, :]

    w2c = jnp.linalg.inv(pose)
    rot, trans = w2c[:3, :3], w2c[:3, 3]
    k3 = intr[:3, :3]
    rays2d = np.asarray(project2d(k3, rot, trans, rays3d))

    _, lines2d, _, _ = view_field_lines(params, cfg, scene, view, chunksize)

    junctions2d = np.zeros((0, 2), dtype=np.float32)
    if "junctions" in params:
        gjc3d = global_junctions_forward(params["junctions"], cfg.junctions)
        junctions2d = np.asarray(project2d(k3, rot, trans, gjc3d))

    lines2d = np.asarray(lines2d, dtype=np.float32).reshape(-1, 4)
    # a random-init or barely-trained field can emit degenerate rays
    # (NaN segments); the distillation pipeline drops them implicitly at
    # the 2D-match gate (NaN < threshold is False) — drop them here too
    # so the overlay stays plottable at any training stage
    lines2d = lines2d[np.isfinite(lines2d).all(axis=1)]
    result = {
        "rays2d": rays2d.astype(np.float32),
        "lines2d": lines2d,
        "junctions2d": junctions2d.astype(np.float32),
    }
    if out_path is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(w / 100, h / 100), dpi=100)
        ax.imshow(scene.rgb[view].reshape(h, w, 3).clip(0, 1))
        r2, l2 = result["rays2d"], result["lines2d"]
        ax.plot([r2[:, 0, 0], r2[:, 1, 0]], [r2[:, 0, 1], r2[:, 1, 1]], "r-",
                linewidth=0.5)
        ax.plot([l2[:, 0], l2[:, 2]], [l2[:, 1], l2[:, 3]], "b-",
                linewidth=0.5)
        j2 = result["junctions2d"]
        if len(j2):
            ax.plot(j2[:, 0], j2[:, 1], "g.", markersize=2)
        ax.set_xlim(0, w)
        ax.set_ylim(h, 0)
        ax.axis("off")
        fig.savefig(out_path, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
    return result


def main(argv=None):
    from ..utils.platform import apply_env_platform

    apply_env_platform()
    from ..train.config import load_experiment_config
    from ..train.checkpoint import load_checkpoint
    from ..data.datasets import load_scene_for_config

    parser = argparse.ArgumentParser(
        description="distillation debug dumps (reference wireframe-debug.py/debug.py)"
    )
    parser.add_argument("--conf", type=str, required=True,
                        help="runconf.conf of a training run")
    parser.add_argument("--checkpoint", default="latest", type=str)
    parser.add_argument("--chunksize", default=2048, type=int)
    parser.add_argument("--data_root", default="../data", type=str)
    parser.add_argument("--mode", default="recon",
                        choices=["recon", "softmax", "show"])
    parser.add_argument("--view", default=0, type=int,
                        help="view index for --mode softmax/show")
    parser.add_argument("--out", default=None, type=str)
    args = parser.parse_args(argv)

    assert osp.basename(args.conf) == "runconf.conf"
    rundir = osp.dirname(args.conf)
    cfg = load_experiment_config(args.conf)
    state, _ = load_checkpoint(osp.join(rundir, "checkpoints"), args.checkpoint)

    # support-mask widths differ per probe: debug.py evaluates at the
    # finalization threshold 1, but wireframe-debug.py sets
    # eval_dataset.distance = 5 (:64) so the softmax probe sees all
    # pixels within 5 px of each detected line
    scene = load_scene_for_config(
        cfg, args.data_root,
        distance_threshold=5.0 if args.mode == "softmax" else 1.0,
    )

    out_dir = args.out or osp.join(rundir, "debug")
    if args.mode == "recon":
        debug_recon(state.params, cfg.model, scene, out_dir, chunksize=args.chunksize)
    elif args.mode == "show":
        os.makedirs(out_dir, exist_ok=True)
        png = osp.join(out_dir, f"show_view{args.view:04d}.png")
        res = show_view(
            state.params, cfg.model, scene, args.view,
            chunksize=args.chunksize, out_path=png,
        )
        print(f"wrote {png} ({res['lines2d'].shape[0]} lines, "
              f"{res['junctions2d'].shape[0]} junctions)")
    else:
        res = softmax_distill(
            state.params, cfg.model, scene, args.view, chunksize=args.chunksize
        )
        os.makedirs(out_dir, exist_ok=True)
        path = osp.join(out_dir, f"softmax_view{args.view:04d}.npz")
        np.savez(path, **res)
        print(f"wrote {path} ({res['lines3d'].shape[0]} lines)")


if __name__ == "__main__":
    main()
