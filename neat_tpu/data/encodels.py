"""Attraction-field encoding of 2D line segments.

Replaces the reference's native CUDA kernel ``hawp.base._C.encodels``
(SURVEY.md §2.2 N1) plus the Python post-processing in the dataset loaders
(reference code/datasets/blender_hawp_dataset.py:93-146): per pixel, find
the closest line segment and its perpendicular-foot offset, then keep only
pixels whose perpendicular foot lies *inside* the segment (checked through
the rotated endpoint-vector angle conditions) and within a distance
threshold. The surviving pixels form the attraction support region that
training samples rays from; their foot points become ``uv_proj``.

Two implementations with identical outputs:
  * C++ (csrc/encodels.cpp via ctypes) — the native path, used by default;
  * vectorized numpy oracle — used for tests and as fallback.
Both run offline at dataset-construction time.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libencodels.so"
_lib = None


def _build_native() -> Optional[ctypes.CDLL]:
    """Compile and load the C++ rasterizer; returns None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    src = _CSRC / "encodels.cpp"
    if not src.exists():
        return None
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        cmd = [
            "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
            str(src), "-o", str(_LIB_PATH),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            try:  # retry without OpenMP
                cmd.remove("-fopenmp")
                subprocess.run(cmd, check=True, capture_output=True)
            except Exception:
                return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.encodels.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.encodels.restype = None
        _lib = lib
        return lib
    except OSError:
        return None


def encode_line_attraction(
    lines: np.ndarray, height: int, width: int, backend: str = "auto"
) -> Tuple[np.ndarray, np.ndarray]:
    """Closest-line map for every pixel.

    lines: (N, 4) [x1 y1 x2 y2] (x, y) pixel coords.
    Returns (lmap (6, H, W) float32, labels (H, W) int32) — see
    csrc/encodels.cpp for the channel layout.
    """
    lines = np.ascontiguousarray(lines[:, :4], dtype=np.float32)
    n = lines.shape[0]
    assert n > 0, "need at least one line"

    if backend in ("auto", "native"):
        lib = _build_native()
        if lib is not None:
            lmap = np.empty((6, height, width), dtype=np.float32)
            labels = np.empty((height, width), dtype=np.int32)
            lib.encodels(
                lines.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n,
                height,
                width,
                lmap.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return lmap, labels
        if backend == "native":
            raise RuntimeError("native encodels unavailable")

    return _encodels_numpy(lines, height, width)


def _encodels_numpy(
    lines: np.ndarray, height: int, width: int, row_chunk: int = 32
) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy oracle; chunked over rows to bound the (N, chunk*W) distance
    matrix."""
    n = lines.shape[0]
    x1, y1, x2, y2 = lines[:, 0], lines[:, 1], lines[:, 2], lines[:, 3]
    dx, dy = x2 - x1, y2 - y1
    len2 = np.maximum(dx * dx + dy * dy, 1e-12)

    lmap = np.empty((6, height, width), dtype=np.float32)
    labels = np.empty((height, width), dtype=np.int32)
    xs = np.arange(width, dtype=np.float32)
    for r0 in range(0, height, row_chunk):
        r1 = min(r0 + row_chunk, height)
        ys = np.arange(r0, r1, dtype=np.float32)
        bx = np.broadcast_to(xs[None, :], (r1 - r0, width)).reshape(-1)  # (P,)
        by = np.broadcast_to(ys[:, None], (r1 - r0, width)).reshape(-1)
        # (N, P) projection parameter
        t = ((bx[None] - x1[:, None]) * dx[:, None] + (by[None] - y1[:, None]) * dy[:, None]) / len2[:, None]
        tc = np.clip(t, 0.0, 1.0)
        qx = x1[:, None] + tc * dx[:, None]
        qy = y1[:, None] + tc * dy[:, None]
        d2 = (bx[None] - qx) ** 2 + (by[None] - qy) ** 2
        best = np.argmin(d2, axis=0)  # (P,)
        pidx = np.arange(bx.shape[0])
        tb = tc[best, pidx]
        fx = x1[best] + tb * dx[best]
        fy = y1[best] + tb * dy[best]
        sh = (r1 - r0, width)
        lmap[0, r0:r1] = (fx - bx).reshape(sh)
        lmap[1, r0:r1] = (fy - by).reshape(sh)
        lmap[2, r0:r1] = (x1[best] - bx).reshape(sh)
        lmap[3, r0:r1] = (y1[best] - by).reshape(sh)
        lmap[4, r0:r1] = (x2[best] - bx).reshape(sh)
        lmap[5, r0:r1] = (y2[best] - by).reshape(sh)
        labels[r0:r1] = best.reshape(sh).astype(np.int32)
    return lmap, labels


def attraction_support(
    lines: np.ndarray,
    height: int,
    width: int,
    distance_threshold: float = 10.0,
    backend: str = "auto",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Support mask, closest-line labels, and projection points.

    Mirrors the reference post-processing's *effective* behavior
    (blender_hawp_dataset.py:93-146): a pixel supports its closest segment
    iff its point-to-segment distance is within ``distance_threshold``.
    (The reference's rotated-endpoint angle tests are vacuous after its
    clamps at blender_hawp_dataset.py:126-129 — pos_angle is always > 0 and
    neg_angle always < 0 — so they are not reproduced here.)

    Returns (mask (H*W,) bool, labels (H*W,) int32, proj_points (H*W, 2)
    float32 — zeros outside the mask).
    """
    lmap, labels = encode_line_attraction(lines, height, width, backend=backend)

    dismap = np.sqrt(lmap[0] ** 2 + lmap[1] ** 2)  # point-to-segment distance
    mask = dismap <= distance_threshold

    offsets = np.moveaxis(lmap[:2], 0, -1)  # (H, W, 2) (x, y)
    ys, xs = np.nonzero(mask)
    proj = np.zeros((height, width, 2), dtype=np.float32)
    proj[ys, xs] = offsets[ys, xs] + np.stack([xs, ys], axis=-1).astype(np.float32)

    return (
        mask.reshape(-1),
        labels.reshape(-1).astype(np.int32),
        proj.reshape(-1, 2),
    )
