"""COLMAP MVS depth/normal map reader + depth fusion helpers.

Parity target: reference colmap/depth.py — read the ``&``-delimited COLMAP
array format (width&height&channels header + column-major float32 payload)
and lift depth maps to world-space point clouds.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def read_array(path: str) -> np.ndarray:
    """Read a COLMAP .bin depth/normal array (public format)."""
    with open(path, "rb") as f:
        header = b""
        n_amp = 0
        while n_amp < 3:
            c = f.read(1)
            if not c:
                raise ValueError(f"truncated COLMAP array {path}")
            header += c
            if c == b"&":
                n_amp += 1
        width, height, channels = (int(x) for x in header[:-1].split(b"&"))
        data = np.fromfile(f, np.float32)
    arr = data.reshape((width, height, channels), order="F")
    return np.transpose(arr, (1, 0, 2)).squeeze()


def write_array(path: str, array: np.ndarray) -> None:
    arr = np.atleast_3d(np.asarray(array, np.float32))
    h, w, c = arr.shape
    with open(path, "wb") as f:
        f.write(f"{w}&{h}&{c}&".encode())
        # payload is column-major over (width, height, channels)
        np.transpose(arr, (1, 0, 2)).astype(np.float32).ravel(order="F").tofile(f)


def depth_to_points(
    depth: np.ndarray,
    k: np.ndarray,
    cam2world: np.ndarray,
    max_depth: Optional[float] = None,
    stride: int = 1,
) -> np.ndarray:
    """Unproject a depth map to a world-space point cloud."""
    h, w = depth.shape[:2]
    ys, xs = np.mgrid[0:h:stride, 0:w:stride]
    d = depth[::stride, ::stride]
    valid = d > 0
    if max_depth is not None:
        valid &= d < max_depth
    xs, ys, d = xs[valid], ys[valid], d[valid]
    # +0.5: COLMAP depth maps sample pixel CENTERS (as in its own
    # stereo fusion); integer indices would shift every point by half a
    # pixel times depth/f
    pix = np.stack(
        [xs + 0.5, ys + 0.5, np.ones_like(xs)], axis=0
    ).astype(np.float64)
    cam = np.linalg.inv(k) @ pix * d[None]
    hom = np.concatenate([cam, np.ones((1, cam.shape[1]))], axis=0)
    world = cam2world @ hom
    return world[:3].T
