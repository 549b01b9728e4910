"""Headless 3D visualization of a COLMAP reconstruction.

Counterpart of the reference's plotly/pycolmap viewer (reference
colmap/vis_3d.py: init_figure/plot_points/plot_camera/plot_reconstruction)
re-done without pycolmap or a display: the model is read with this
package's own model IO and rendered to a png — sparse points colored by
their RGB, camera frusta as wireframe pyramids.
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np

from .model_io import qvec2rotmat, read_model


def camera_frustum(
    pose_r: np.ndarray, pose_t: np.ndarray, k: np.ndarray,
    width: int, height: int, depth: float,
) -> np.ndarray:
    """World-space frustum edges of a pinhole camera.

    pose_r/pose_t: world->cam rotation/translation (COLMAP convention).
    Returns (8, 2, 3) line segments: 4 apex->corner + 4 far-plane edges.
    """
    corners_px = np.asarray(
        [[0, 0], [width, 0], [width, height], [0, height]], dtype=np.float64
    )
    kinv = np.linalg.inv(k[:3, :3])
    rays = (kinv @ np.c_[corners_px, np.ones(4)].T).T  # (4, 3) cam frame
    cam_center = -pose_r.T @ pose_t
    far = (pose_r.T @ (rays * depth).T).T + cam_center  # (4, 3) world
    segs = [np.stack([cam_center, f]) for f in far]
    segs += [np.stack([far[i], far[(i + 1) % 4]]) for i in range(4)]
    return np.stack(segs)


def plot_reconstruction(
    model_dir: str,
    out_path: str,
    max_points: int = 20000,
    frustum_depth: Optional[float] = None,
    elev: float = 20.0,
    azim: float = -60.0,
    min_track_len: int = 2,
) -> dict:
    """Render sparse points + camera frusta to ``out_path``. Returns
    counts for scripting/tests."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cameras, images, points = read_model(model_dir)

    xyz = np.asarray(
        [p.xyz for p in points.values() if len(p.image_ids) >= min_track_len]
    ).reshape(-1, 3)
    rgb = np.asarray(
        [p.rgb for p in points.values() if len(p.image_ids) >= min_track_len]
    ).reshape(-1, 3)
    if len(xyz) > max_points:
        sel = np.random.RandomState(0).choice(len(xyz), max_points, replace=False)
        xyz, rgb = xyz[sel], rgb[sel]

    if frustum_depth is None:
        spread = float(xyz.std()) if len(xyz) else 1.0
        frustum_depth = 0.3 * max(spread, 1e-3)

    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(projection="3d")
    if len(xyz):
        ax.scatter(*xyz.T, c=rgb / 255.0, s=1.0, depthshade=False)
    for im in images.values():
        cam = cameras[im.camera_id]
        k = cam.K()
        segs = camera_frustum(
            qvec2rotmat(im.qvec), im.tvec, k, cam.width, cam.height,
            frustum_depth,
        )
        for a, b in segs:
            ax.plot(*np.stack([a, b]).T, color="tab:red", linewidth=0.7)
    ax.view_init(elev=elev, azim=azim)
    # true proportions (the reference viewer's aspectmode='data',
    # vis_3d.py:44): equalize the axis RANGES before forcing a unit box,
    # else an elongated scene is anisotropically squashed
    lims = np.array([ax.get_xlim3d(), ax.get_ylim3d(), ax.get_zlim3d()])
    centers = lims.mean(axis=1)
    half = (lims[:, 1] - lims[:, 0]).max() / 2
    ax.set_xlim3d(centers[0] - half, centers[0] + half)
    ax.set_ylim3d(centers[1] - half, centers[1] + half)
    ax.set_zlim3d(centers[2] - half, centers[2] + half)
    ax.set_box_aspect((1, 1, 1))
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return {"n_points": int(len(xyz)), "n_cameras": int(len(images))}


def main(argv=None):
    from ..utils.platform import apply_env_platform

    apply_env_platform()
    parser = argparse.ArgumentParser(
        description="render a COLMAP sparse model to a png (headless "
        "vis_3d equivalent)"
    )
    parser.add_argument("--model", required=True, help="sparse model dir")
    parser.add_argument("--out", required=True, help="output png")
    parser.add_argument("--max-points", type=int, default=20000)
    parser.add_argument("--elev", type=float, default=20.0)
    parser.add_argument("--azim", type=float, default=-60.0)
    args = parser.parse_args(argv)
    stats = plot_reconstruction(
        args.model, args.out, max_points=args.max_points,
        elev=args.elev, azim=args.azim,
    )
    print(f"{stats['n_points']} points, {stats['n_cameras']} cameras -> {args.out}")


if __name__ == "__main__":
    main()
