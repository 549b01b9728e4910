"""Headless wireframe "viewer": spherical camera paths rendered to
image sequences / turntable sheets.

Replaces the reference's interactive open3d viewers (reference
code/evaluation/show.py, show-junctions.py, visualization/show.py with its
``pose_spherical`` camera path) for this display-less environment: the same
spherical trajectory is rendered with matplotlib into numbered frames that
can be assembled into the reference's gif-style turntables.
"""

from __future__ import annotations

import math
import os
import os.path as osp
from typing import Optional

import numpy as np


def pose_spherical(psi: float, theta: float, phi: float, radius: float) -> np.ndarray:
    """Spherical camera pose (reference visualization/show.py:54-66):
    rotations psi/theta/phi in degrees, distance radius -> cam2world,
    including the reference's final world-axis permutation. Used for
    reproducing the reference's turntable trajectories against rendered
    views (the matplotlib turntable below drives view_init directly)."""

    def trans_t(t):
        m = np.eye(4, dtype=np.float32)
        m[2, 3] = t
        return m

    def rot_phi(p):
        m = np.eye(4, dtype=np.float32)
        m[1, 1], m[1, 2] = math.cos(p), -math.sin(p)
        m[2, 1], m[2, 2] = math.sin(p), math.cos(p)
        return m

    def rot_theta(t):
        m = np.eye(4, dtype=np.float32)
        m[0, 0], m[0, 2] = math.cos(t), -math.sin(t)
        m[2, 0], m[2, 2] = math.sin(t), math.cos(t)
        return m

    def rot_psi(s):
        m = np.eye(4, dtype=np.float32)
        m[0, 0], m[0, 1] = math.cos(s), -math.sin(s)
        m[1, 0], m[1, 1] = math.sin(s), math.cos(s)
        return m

    c2w = trans_t(radius)
    c2w = rot_phi(math.radians(phi)) @ c2w
    c2w = rot_theta(math.radians(theta)) @ c2w
    c2w = rot_psi(math.radians(psi)) @ c2w
    flip = np.array(
        [[0, 0, -1, 0], [1, 0, 0, 0], [0, -1, 0, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )
    return flip @ c2w


def render_turntable(
    lines3d: np.ndarray,
    out_dir: str,
    junctions: Optional[np.ndarray] = None,
    n_frames: int = 36,
    elev: float = 20.0,
    prefix: str = "frame",
) -> None:
    """Render a wireframe from a circular path of viewpoints."""
    from .plots import plot_wireframe3d

    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_frames):
        azim = 360.0 * i / n_frames
        plot_wireframe3d(
            osp.join(out_dir, f"{prefix}_{i:03d}.png"),
            lines3d,
            junctions=junctions,
            elev=elev,
            azim=azim,
            title=f"azim {azim:.0f}",
        )


# ---------------------------------------------------------------------------
# camera-view save/load + pinhole captures (reference show.py:152-280)
# ---------------------------------------------------------------------------


def save_camera_json(
    path: str, k3: np.ndarray, extrinsic_w2c: np.ndarray, width: int, height: int
) -> None:
    """Write an open3d-compatible PinholeCameraParameters json (the format
    the reference's capture_image saves as cam_%04d.json, show.py:256-266,
    and load_view replays, :152-168). Matrices are stored column-major per
    the o3d convention, so files interoperate with reference recordings."""
    import json

    payload = {
        "class_name": "PinholeCameraParameters",
        "extrinsic": np.asarray(extrinsic_w2c, dtype=np.float64)
        .T.reshape(-1)
        .tolist(),
        "intrinsic": {
            "class_name": "PinholeCameraIntrinsic",
            "width": int(width),
            "height": int(height),
            "intrinsic_matrix": np.asarray(k3, dtype=np.float64)
            .T.reshape(-1)
            .tolist(),
        },
        "version_major": 1,
        "version_minor": 0,
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)


def load_camera_json(path: str):
    """Read a PinholeCameraParameters json -> (K (3,3), w2c (4,4), W, H)."""
    import json

    with open(path) as f:
        payload = json.load(f)
    w2c = np.asarray(payload["extrinsic"], dtype=np.float64).reshape(4, 4).T
    intr = payload["intrinsic"]
    k3 = np.asarray(intr["intrinsic_matrix"], dtype=np.float64).reshape(3, 3).T
    return k3, w2c, int(intr["width"]), int(intr["height"])


def render_pinhole_view(
    lines3d: np.ndarray,
    k3: np.ndarray,
    w2c: np.ndarray,
    width: int,
    height: int,
    out_path: str,
    points3d: Optional[np.ndarray] = None,
    show_endpoints: bool = False,
    line_width: float = 0.3,
) -> np.ndarray:
    """Project the wireframe through a pinhole camera and rasterize it in
    the reference's figure style (show.py:380-397: unit-height figure,
    axes off, y down, black lines, optional blue endpoint dots).
    Returns lines2d (L, 2, 2)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    r, t = w2c[:3, :3], w2c[:3, 3:]
    x = lines3d.reshape(-1, 3).T
    x2d = k3 @ (r @ x + t)
    x2d = (x2d[:2] / x2d[2:]).T
    lines2d = x2d.reshape(-1, 2, 2)

    fig = plt.figure()
    fig.set_size_inches(width / height, 1, forward=False)
    ax = plt.Axes(fig, [0.0, 0.0, 1.0, 1.0])
    ax.set_axis_off()
    fig.add_axes(ax)
    ax.set_xlim([-0.5, width - 0.5])
    ax.set_ylim([height - 0.5, -0.5])
    ax.plot(
        [lines2d[:, 0, 0], lines2d[:, 1, 0]],
        [lines2d[:, 0, 1], lines2d[:, 1, 1]],
        "-",
        color="black",
        linewidth=line_width,
    )
    if show_endpoints:
        ax.scatter(lines2d[:, 0, 0], lines2d[:, 0, 1], color="b", s=1.2,
                   edgecolors="none", zorder=5)
        ax.scatter(lines2d[:, 1, 0], lines2d[:, 1, 1], color="b", s=1.2,
                   edgecolors="none", zorder=5)
    if points3d is not None and len(points3d):
        p2d = k3 @ (r @ np.asarray(points3d).T + t)
        p2d = (p2d[:2] / p2d[2:]).T
        ax.scatter(p2d[:, 0], p2d[:, 1], color="r", s=2.0, edgecolors="none",
                   zorder=6)
    # figure is (width/height, 1) inches -> dpi must be the HEIGHT for the
    # png to come out (width, height) pixels (dpi=width breaks non-square)
    fig.savefig(out_path, dpi=height)
    plt.close(fig)
    return lines2d


def capture_spherical_views(
    lines3d: np.ndarray,
    out_dir: str,
    n_frames: int = 72,
    radius: float = 3.0,
    phi: float = 0.0,
    psi: float = 0.0,
    theta0: float = 0.0,
    width: int = 512,
    height: int = 512,
    focal: float = 500.0,
    points3d: Optional[np.ndarray] = None,
    show_endpoints: bool = False,
    line_width: float = 0.3,
) -> None:
    """The reference's record loop (show.py capture_image + rotate):
    sweep a spherical path stepping theta by 360/n_frames (the reference
    rotate() steps 5 deg = 72 frames, show.py:209), holding the psi/phi/
    radius of the chosen pose preset; for each frame save BOTH the
    rendered image_%04d.png and the replayable cam_%04d.json."""
    os.makedirs(out_dir, exist_ok=True)
    k3 = np.array(
        [[focal, 0, width / 2.0], [0, focal, height / 2.0], [0, 0, 1.0]]
    )
    for i in range(n_frames):
        theta = (theta0 + 360.0 * i / n_frames) % 360.0
        c2w = pose_spherical(psi, theta, phi, radius)
        w2c = np.linalg.inv(c2w)
        save_camera_json(
            osp.join(out_dir, f"cam_{i:04d}.json"), k3, w2c, width, height
        )
        render_pinhole_view(
            lines3d, k3, w2c, width, height,
            osp.join(out_dir, f"image_{i:04d}.png"),
            points3d=points3d, show_endpoints=show_endpoints,
            line_width=line_width,
        )


def replay_views(
    lines3d: np.ndarray,
    cam_dir: str,
    out_dir: str,
    points3d: Optional[np.ndarray] = None,
    show_endpoints: bool = False,
    line_width: float = 0.3,
    make_gif: bool = True,
) -> int:
    """Replay saved camera jsons against a (possibly different) wireframe
    (reference show.py:368-413: renders each saved view, then assembles
    the frames into an animation). Returns the frame count."""
    import glob as globmod

    cam_files = sorted(globmod.glob(osp.join(cam_dir, "cam_*.json")))
    if not cam_files:
        cam_files = sorted(globmod.glob(osp.join(cam_dir, "*.json")))
    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for i, cam in enumerate(cam_files):
        k3, w2c, width, height = load_camera_json(cam)
        path = osp.join(out_dir, f"{i:04d}.png")
        render_pinhole_view(
            lines3d, k3, w2c, width, height, path,
            points3d=points3d, show_endpoints=show_endpoints,
            line_width=line_width,
        )
        frames.append(path)
    if make_gif and frames:
        import imageio.v2 as imageio

        imageio.mimsave(
            out_dir.rstrip("/") + ".gif",
            [imageio.imread(p) for p in frames],
            duration=1000 // 30,
            loop=0,
        )
    return len(frames)


def main(argv=None):
    from ..utils.platform import apply_env_platform

    apply_env_platform()
    import argparse

    parser = argparse.ArgumentParser(
        description="headless wireframe viewer (reference show.py / "
        "show-junctions.py equivalent)"
    )
    parser.add_argument("--data", required=True, help="wireframe npz (lines3d)")
    parser.add_argument("--out", default=None, help="output dir (default: <data>.frames)")
    parser.add_argument("--frames", type=int, default=None,
                        help="default: 36 (turntable) / 72 = the reference's "
                        "5-degree rotate step (record)")
    parser.add_argument("--mode", default="turntable",
                        choices=["turntable", "record", "replay"],
                        help="turntable: matplotlib 3D sheet; record: "
                        "spherical pinhole captures + replayable cam jsons "
                        "(reference --save flow); replay: re-render saved "
                        "cam_dir views (reference load_view flow)")
    parser.add_argument("--cam_dir", default=None,
                        help="saved-view dir for --mode replay")
    parser.add_argument("--show-endpoints", default=False, action="store_true")
    parser.add_argument("--show-junctions", default=False, action="store_true",
                        help="overlay junctions3d_initial from the npz "
                        "(show-junctions.py)")
    parser.add_argument("--line-width", default=0.3, type=float)
    parser.add_argument("--pose", default="none", choices=["none", "dtu", "scan"],
                        help="trajectory preset (reference show.py:443-455: "
                        "dtu = psi -155 / phi -25 / r 3; scan = theta0 170 / "
                        "phi -45 / r 3)")
    parser.add_argument("--psi", default=None, type=float)
    parser.add_argument("--phi", default=None, type=float)
    parser.add_argument("--theta0", default=None, type=float)
    parser.add_argument("--radius", default=None, type=float)
    parser.add_argument("--threshold", default=None, type=float,
                        help="keep lines whose npz scores are under this "
                        "(reference show.py --threshold)")
    args = parser.parse_args(argv)

    data = np.load(args.data, allow_pickle=True)
    lines3d = data["lines3d"]
    if lines3d.dtype == object or lines3d.ndim == 1:
        # per-view object arrays (reference wireframe.py/debug.py npz
        # format; show.py:462 concatenates the same way)
        lines3d = np.concatenate([np.asarray(l) for l in lines3d], axis=0)
    lines3d = np.asarray(lines3d, np.float32).reshape(-1, 2, 3)
    if args.threshold is not None and "scores" in data:
        scores = np.asarray(data["scores"]).reshape(-1)
        if scores.shape[0] == lines3d.shape[0]:
            lines3d = lines3d[scores < args.threshold]
    points3d = None
    if args.show_junctions:
        if "junctions3d_initial" in data:
            points3d = np.asarray(data["junctions3d_initial"])
        else:
            points3d = np.unique(lines3d.reshape(-1, 3), axis=0)
    out = args.out or args.data + ".frames"

    presets = {
        "dtu": dict(psi=-155.0, theta0=0.0, phi=-25.0, radius=3.0),
        "scan": dict(psi=0.0, theta0=170.0, phi=-45.0, radius=3.0),
        "none": dict(psi=0.0, theta0=0.0, phi=0.0, radius=3.0),
    }
    traj = presets[args.pose]
    for k in traj:
        v = getattr(args, k)
        if v is not None:
            traj[k] = v

    if args.mode == "turntable":
        n = args.frames or 36
        render_turntable(lines3d, out, junctions=points3d, n_frames=n)
        print(f"wrote {n} turntable frames to {out}")
    elif args.mode == "record":
        n = args.frames or 72
        capture_spherical_views(
            lines3d, out, n_frames=n, points3d=points3d,
            show_endpoints=args.show_endpoints, line_width=args.line_width,
            **traj,
        )
        print(f"recorded {n} views (+cam jsons) to {out}")
    else:
        assert args.cam_dir, "--mode replay needs --cam_dir"
        n = replay_views(
            lines3d, args.cam_dir, out,
            points3d=points3d, show_endpoints=args.show_endpoints,
            line_width=args.line_width,
        )
        print(f"replayed {n} saved views to {out} (+gif)")


if __name__ == "__main__":
    main()
