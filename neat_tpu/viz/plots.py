"""Headless training/eval visualization.

Replaces the reference's plotly + open3d plotting stack (reference
code/utils/plots.py, code/training/volsdf_train.py:278-296) with
matplotlib (the only plotting library in this image):

  * rendered-vs-GT image grids and normal maps per plot epoch;
  * camera quiver figure of the scene rig;
  * 3D wireframe / junction snapshots (matplotlib 3D).
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_image_grid(
    path: str,
    rgb_eval: np.ndarray,
    rgb_gt: np.ndarray,
    normal_map: Optional[np.ndarray] = None,
) -> None:
    """Side-by-side render / GT (/ normal) panel (reference
    plots.py:365-397)."""
    panels = [("render", rgb_eval), ("ground truth", rgb_gt)]
    if normal_map is not None:
        panels.append(("normals", (normal_map + 1.0) / 2.0))
    fig, axes = plt.subplots(1, len(panels), figsize=(5 * len(panels), 5))
    if len(panels) == 1:
        axes = [axes]
    for ax, (title, img) in zip(axes, panels):
        ax.imshow(np.clip(img, 0, 1))
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_cameras(path: str, poses: np.ndarray, scale: float = 0.3) -> None:
    """3D quiver of camera positions and view directions (reference
    volsdf_train.py:278-296 / plots.py get_3D_quiver_trace)."""
    locs = poses[:, :3, 3]
    dirs = poses[:, :3, 2]  # optical axis
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    ax.quiver(
        locs[:, 0], locs[:, 1], locs[:, 2],
        dirs[:, 0], dirs[:, 1], dirs[:, 2],
        length=scale, color="tab:blue", arrow_length_ratio=0.3,
    )
    ax.scatter(locs[:, 0], locs[:, 1], locs[:, 2], s=8, c="tab:red")
    ax.set_title(f"{len(poses)} cameras")
    for lim in (ax.set_xlim, ax.set_ylim, ax.set_zlim):
        lim(-3, 3)
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_wireframe3d(
    path: str,
    lines3d: np.ndarray,
    junctions: Optional[np.ndarray] = None,
    elev: float = 20.0,
    azim: float = -60.0,
    title: str = "",
) -> None:
    """3D wireframe snapshot (replaces the open3d viewers of
    code/evaluation/show.py for headless use)."""
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    for seg in lines3d.reshape(-1, 2, 3):
        ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], "b-", lw=0.8)
    if junctions is not None and len(junctions):
        ax.scatter(
            junctions[:, 0], junctions[:, 1], junctions[:, 2], s=6, c="r"
        )
    ax.view_init(elev=elev, azim=azim)
    ax.set_title(title)
    ax.set_box_aspect([1, 1, 1])
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_lines2d_overlay(
    path: str,
    image: np.ndarray,
    lines2d: np.ndarray,
    gt_lines2d: Optional[np.ndarray] = None,
) -> None:
    """2D line overlay on an image (debug view of the attraction field)."""
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(np.clip(image, 0, 1))
    for l in lines2d.reshape(-1, 4):
        ax.plot([l[0], l[2]], [l[1], l[3]], "r-", lw=0.6, alpha=0.6)
    if gt_lines2d is not None:
        for l in gt_lines2d.reshape(-1, 4):
            ax.plot([l[0], l[2]], [l[1], l[3]], "g-", lw=0.8, alpha=0.8)
    ax.axis("off")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
