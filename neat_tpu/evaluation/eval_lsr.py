"""Wireframe ACC/COMP evaluations on DTU / BMVS / ScanNet.

Parity targets:
  * eval-wfr-dtu.py:30-124 — junction ACC/COMP: unique wfi_checked
    endpoints vs GT STL points, ObsMask/Plane filtered, max_dist 20,
    downsample radius 0.2;
  * eval-lsr-dtu.py:64-150 — line ACC/COMP: each predicted segment
    resampled at 32 points, same masking and distances;
  * eval-lsr-bmvs.py / eval-lsr-scannet.py — the same without the DTU
    masks (scene point clouds as GT).

All reuse the point-set scorer in eval_dtu.py.
"""

from __future__ import annotations

import argparse
import pickle
from typing import Dict, Optional

import numpy as np

from .eval_dtu import eval_dtu_points


def resample_lines(lines: np.ndarray, n_points: int = 32) -> np.ndarray:
    """(L, 2, 3) segments -> (L * n_points, 3) evenly spaced samples
    (reference eval-lsr-dtu.py:71-81)."""
    t = np.linspace(0.0, 1.0, n_points)[None, :, None]
    pts = lines[:, :1] * (1 - t) + lines[:, 1:] * t
    return pts.reshape(-1, 3)


def _load_pred_lines(data: str, key: str = "lines3d_wfi_checked") -> np.ndarray:
    if data.endswith(".npz"):
        return np.load(data)["lines3d"].reshape(-1, 2, 3)
    with open(data, "rb") as f:
        return np.asarray(pickle.load(f)[key]).reshape(-1, 2, 3)


def _apply_scale(points: np.ndarray, scale_mat: Optional[np.ndarray]) -> np.ndarray:
    if scale_mat is None:
        return points
    return points @ scale_mat[:3, :3].T + scale_mat[:3, 3]


def eval_wfr_junctions(
    data: str,
    stl: np.ndarray,
    scale_mat: Optional[np.ndarray] = None,
    obs_mask=None,
    bb=None,
    res: float = 10.0,
    ground_plane=None,
    max_dist: float = 20.0,
    downsample_radius: float = 0.2,
) -> Dict[str, float]:
    """Junction ACC/COMP: unique endpoints of the checked wireframe."""
    lines = _load_pred_lines(data)
    endpoints = np.unique(lines.reshape(-1, 3), axis=0)
    endpoints = _apply_scale(endpoints, scale_mat)
    return eval_dtu_points(
        endpoints, stl, obs_mask=obs_mask, bb=bb, res=res,
        ground_plane=ground_plane, max_dist=max_dist,
        downsample_radius=downsample_radius,
    )


def eval_lsr_lines(
    data: str,
    stl: np.ndarray,
    scale_mat: Optional[np.ndarray] = None,
    n_points: int = 32,
    obs_mask=None,
    bb=None,
    res: float = 10.0,
    ground_plane=None,
    max_dist: float = 20.0,
    downsample_radius: float = 0.2,
) -> Dict[str, float]:
    """Line ACC/COMP: segments resampled at n_points."""
    lines = _load_pred_lines(data)
    lines = _apply_scale(lines.reshape(-1, 3), scale_mat).reshape(-1, 2, 3)
    pts = resample_lines(lines, n_points)
    return eval_dtu_points(
        pts, stl, obs_mask=obs_mask, bb=bb, res=res,
        ground_plane=ground_plane, max_dist=max_dist,
        downsample_radius=downsample_radius,
    )


def main(argv=None):
    from scipy.io import loadmat
    from ..viz.mesh import load_ply

    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, required=True)
    parser.add_argument("--scan", type=int, required=True)
    parser.add_argument("--dataset_dir", type=str, required=True)
    parser.add_argument("--mode", choices=["junctions", "lines"], default="lines")
    parser.add_argument("--no-masks", action="store_true", help="BMVS/ScanNet style")
    parser.add_argument(
        "--cameras", type=str, default=None,
        help="scene cameras.npz: applies scale_mat_0 to map normalized "
        "predictions into the GT frame (reference eval-lsr-dtu.py:50-80)",
    )
    args = parser.parse_args(argv)

    stl, _ = load_ply(f"{args.dataset_dir}/Points/stl/stl{args.scan:03}_total.ply")
    kwargs = {}
    if args.cameras:
        kwargs["scale_mat"] = np.load(args.cameras)["scale_mat_0"]
    if not args.no_masks:
        mat = loadmat(f"{args.dataset_dir}/ObsMask/ObsMask{args.scan}_10.mat")
        kwargs.update(
            obs_mask=mat["ObsMask"], bb=mat["BB"], res=float(mat["Res"]),
            ground_plane=loadmat(f"{args.dataset_dir}/ObsMask/Plane{args.scan}.mat")[
                "P"
            ].reshape(-1),
        )
    fn = eval_wfr_junctions if args.mode == "junctions" else eval_lsr_lines
    out = fn(args.data, stl, **kwargs)
    print(out["accuracy_d2s"], out["completeness_s2d"], out["overall"])


if __name__ == "__main__":
    main()
