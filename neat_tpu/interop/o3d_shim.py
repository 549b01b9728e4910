"""A numpy shim for the narrow open3d slice the reference eval scripts use.

The reference's DTU/BMVS/ScanNet evaluation scripts
(`code/evaluation/eval-dtu.py`, `eval-wfr-dtu.py`, `eval-lsr-{dtu,bmvs,
scannet}.py`) import open3d only for point-cloud containers and file IO:

  * ``o3d.utility.Vector3dVector``           (eval-dtu.py:22-23)
  * ``o3d.geometry.PointCloud``              (eval-dtu.py:21, eval-lsr-scannet.py:44)
  * ``PointCloud.voxel_down_sample``         (eval-lsr-scannet.py:48)
  * ``o3d.io.read_point_cloud``              (eval-dtu.py:76,114)
  * ``o3d.io.write_point_cloud``             (eval-dtu.py:24)
  * ``o3d.io.read_triangle_mesh``            (eval-dtu.py:46, eval-lsr-scannet.py:107)

open3d is absent in this image; this module implements exactly that slice
in numpy so the reference scripts can be EXECUTED head-to-head against
`neat_tpu/evaluation/eval_dtu.py` / `eval_lsr.py` (tests/test_eval_parity.py).
Install with ``install_open3d_stub()`` (interop/reference_runtime.py).

Every distance/metric computation in those scripts happens in plain
numpy/sklearn on ``np.asarray(pcd.points)`` — the shim only has to carry
arrays faithfully. The one algorithmic member, ``voxel_down_sample``,
follows open3d's documented semantics: voxel indices are taken relative to
``min_bound - voxel_size/2`` and each occupied voxel emits the mean of its
points (open3d C++ VoxelDownSample; output order is unspecified there too —
the consumer's chamfer/PR metrics are order-invariant).
"""

from __future__ import annotations

import sys
import types

import numpy as np


class Vector3dVector:
    """`open3d.utility.Vector3dVector`: an (N, 3) float64 array carrier that
    supports np.asarray()."""

    def __init__(self, data=None):
        if data is None:
            data = np.zeros((0, 3), dtype=np.float64)
        # np.array (copy) not asarray: real open3d copies into C++ storage —
        # eval-lsr-dtu.py:84-87 builds a PointCloud then shuffles the source
        # array in place, relying on the container being unaffected
        self._data = np.array(data, dtype=np.float64).reshape(-1, 3)

    def __array__(self, dtype=None, copy=None):
        arr = self._data
        if dtype is not None:
            arr = arr.astype(dtype, copy=False)
        if copy:
            arr = arr.copy()
        return arr

    def __len__(self):
        return len(self._data)

    def __iter__(self):
        return iter(self._data)


class Vector3iVector(Vector3dVector):
    """Integer triples (triangle indices)."""

    def __init__(self, data=None):
        if data is None:
            data = np.zeros((0, 3), dtype=np.int64)
        self._data = np.array(data, dtype=np.int64).reshape(-1, 3)


def _as_vec3d(value):
    return value if isinstance(value, Vector3dVector) else Vector3dVector(value)


class PointCloud:
    """`open3d.geometry.PointCloud`: .points/.colors plus voxel_down_sample."""

    def __init__(self, points=None):
        self.points = _as_vec3d(points)
        self.colors = Vector3dVector()

    def __setattr__(self, name, value):
        if name in ("points", "colors") and not isinstance(value, Vector3dVector):
            value = _as_vec3d(value)
        object.__setattr__(self, name, value)

    def voxel_down_sample(self, voxel_size: float) -> "PointCloud":
        pts = np.asarray(self.points)
        if voxel_size <= 0:
            raise ValueError("voxel_size must be positive")
        if len(pts) == 0:
            return PointCloud(pts)
        # open3d: voxel_min_bound = min_bound - voxel_size/2;
        # index = floor((p - voxel_min_bound) / voxel_size); emit per-voxel mean
        voxel_min = pts.min(axis=0) - voxel_size * 0.5
        keys = np.floor((pts - voxel_min) / voxel_size).astype(np.int64)
        _, inv, counts = np.unique(
            keys, axis=0, return_inverse=True, return_counts=True
        )
        sums = np.zeros((len(counts), 3), dtype=np.float64)
        np.add.at(sums, inv.reshape(-1), pts)
        return PointCloud(sums / counts[:, None])


class TriangleMesh:
    """`open3d.geometry.TriangleMesh`: .vertices/.triangles carriers."""

    def __init__(self, vertices=None, triangles=None):
        self.vertices = _as_vec3d(vertices)
        self.triangles = (
            triangles
            if isinstance(triangles, Vector3iVector)
            else Vector3iVector(triangles)
        )


def read_triangle_mesh(path: str) -> TriangleMesh:
    """PLY (via the repo's reader) or Wavefront OBJ (the ScanNet gt.obj)."""
    if path.endswith(".obj"):
        verts, faces = [], []
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == "v":
                    verts.append([float(v) for v in parts[1:4]])
                elif parts[0] == "f":
                    # OBJ faces are 1-indexed, possibly "v/vt/vn" tuples
                    idx = [int(p.split("/")[0]) - 1 for p in parts[1:4]]
                    faces.append(idx)
        return TriangleMesh(
            np.asarray(verts, dtype=np.float64),
            np.asarray(faces, dtype=np.int64).reshape(-1, 3),
        )
    from ..viz.mesh import load_ply

    verts, faces = load_ply(path)
    return TriangleMesh(verts, faces)


def read_point_cloud(path: str) -> PointCloud:
    from ..viz.mesh import load_ply

    verts, _ = load_ply(path)
    return PointCloud(verts)


def write_point_cloud(path: str, pcd: PointCloud) -> bool:
    """ASCII PLY with optional per-vertex colors (open3d writes colors as
    uchar; the reference only re-reads .points, never colors)."""
    pts = np.asarray(pcd.points)
    colors = np.asarray(pcd.colors)
    has_colors = len(colors) == len(pts) and len(pts) > 0
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property double x\nproperty double y\nproperty double z\n")
        if has_colors:
            f.write(
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            )
        f.write("element face 0\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        if has_colors:
            rgb = np.clip(np.round(colors * 255), 0, 255).astype(np.int32)
            for p, c in zip(pts, rgb):
                f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")
        else:
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
    return True


def build_module() -> types.ModuleType:
    """Assemble a module tree mimicking `import open3d as o3d`."""
    o3d = types.ModuleType("open3d")
    utility = types.ModuleType("open3d.utility")
    geometry = types.ModuleType("open3d.geometry")
    io = types.ModuleType("open3d.io")
    utility.Vector3dVector = Vector3dVector
    utility.Vector3iVector = Vector3iVector
    geometry.PointCloud = PointCloud
    geometry.TriangleMesh = TriangleMesh
    io.read_point_cloud = read_point_cloud
    io.write_point_cloud = write_point_cloud
    io.read_triangle_mesh = read_triangle_mesh
    o3d.utility = utility
    o3d.geometry = geometry
    o3d.io = io
    o3d.__version__ = "0.0.0-neat-tpu-shim"
    return o3d


def install_open3d_stub() -> None:
    """Make `import open3d` resolve to the shim. Upgrades the EMPTY open3d
    placeholder installed by install_reference_stubs(); no-op when a real
    open3d (or a prior shim) is already importable."""
    existing = sys.modules.get("open3d")
    if existing is not None and hasattr(existing, "geometry"):
        return
    o3d = build_module()
    if existing is not None:
        # keep the placeholder's identity (other modules may hold a ref)
        for attr in ("utility", "geometry", "io", "__version__"):
            setattr(existing, attr, getattr(o3d, attr))
        o3d = existing
    sys.modules["open3d"] = o3d
    sys.modules["open3d.utility"] = o3d.utility
    sys.modules["open3d.geometry"] = o3d.geometry
    sys.modules["open3d.io"] = o3d.io
