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


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="headless wireframe viewer (reference show.py equivalent)"
    )
    parser.add_argument("--data", required=True, help="wireframe npz (lines3d)")
    parser.add_argument("--out", default=None, help="output dir (default: <data>.frames)")
    parser.add_argument("--frames", type=int, default=36)
    args = parser.parse_args(argv)

    data = np.load(args.data)
    lines3d = data["lines3d"].reshape(-1, 2, 3)
    out = args.out or args.data + ".frames"
    render_turntable(lines3d, out, n_frames=args.frames)
    print(f"wrote {args.frames} frames to {out}")


if __name__ == "__main__":
    main()
