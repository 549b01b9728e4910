"""COLMAP sparse-model IO (text and binary formats).

Parity target: the reference's vendored COLMAP readers/writers
(reference colmap/preprocess.py:94-620, colmap/custom.py:374-424) — the
standard cameras/images/points3D files in both .txt and .bin encodings.
Implemented from the public COLMAP format specification.
"""

from __future__ import annotations

import os.path as osp
import struct
from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_IDS = {name: (mid, n) for mid, (name, n) in CAMERA_MODELS.items()}


@dataclass
class Camera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray

    def K(self) -> np.ndarray:
        k = np.eye(3)
        p = self.params
        if self.model == "SIMPLE_PINHOLE" or self.model.startswith("SIMPLE_RADIAL"):
            k[0, 0] = k[1, 1] = p[0]
            k[0, 2], k[1, 2] = p[1], p[2]
        elif self.model in ("PINHOLE", "OPENCV", "FULL_OPENCV", "OPENCV_FISHEYE"):
            k[0, 0], k[1, 1], k[0, 2], k[1, 2] = p[0], p[1], p[2], p[3]
        elif self.model == "RADIAL":
            k[0, 0] = k[1, 1] = p[0]
            k[0, 2], k[1, 2] = p[1], p[2]
        else:
            raise ValueError(f"unsupported camera model {self.model}")
        return k


@dataclass
class Image:
    id: int
    qvec: np.ndarray  # (4,) w x y z, world2cam rotation
    tvec: np.ndarray  # (3,) world2cam translation
    camera_id: int
    name: str
    xys: np.ndarray  # (N, 2)
    point3D_ids: np.ndarray  # (N,)

    def world2cam(self) -> np.ndarray:
        m = np.eye(4)
        m[:3, :3] = qvec2rotmat(self.qvec)
        m[:3, 3] = self.tvec
        return m

    def cam2world(self) -> np.ndarray:
        return np.linalg.inv(self.world2cam())


@dataclass
class Point3D:
    id: int
    xyz: np.ndarray
    rgb: np.ndarray
    error: float
    image_ids: np.ndarray
    point2D_idxs: np.ndarray


def qvec2rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def rotmat2qvec(r: np.ndarray) -> np.ndarray:
    rxx, ryx, rzx, rxy, ryy, rzy, rxz, ryz, rzz = r.flat
    k = (
        np.array(
            [
                [rxx - ryy - rzz, 0, 0, 0],
                [ryx + rxy, ryy - rxx - rzz, 0, 0],
                [rzx + rxz, rzy + ryz, rzz - rxx - ryy, 0],
                [ryz - rzy, rzx - rxz, rxy - ryx, rxx + ryy + rzz],
            ]
        )
        / 3.0
    )
    vals, vecs = np.linalg.eigh(k)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    if q[0] < 0:
        q = -q
    return q


# ---------------------------------------------------------------------------
# text format
# ---------------------------------------------------------------------------


def _read_cameras_text(path) -> Dict[int, Camera]:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            el = line.split()
            out[int(el[0])] = Camera(
                id=int(el[0]),
                model=el[1],
                width=int(el[2]),
                height=int(el[3]),
                params=np.asarray([float(x) for x in el[4:]]),
            )
    return out


def _read_images_text(path) -> Dict[int, Image]:
    out = {}
    with open(path) as f:
        # keep blank lines: an image with zero 2D observations has an empty
        # second line, which must still consume its slot in the 2-line pairing
        lines = [l.strip() for l in f if not l.startswith("#")]
    i = 0
    while i < len(lines):
        if not lines[i]:
            i += 1
            continue
        el = lines[i].split()
        pts = lines[i + 1].split() if i + 1 < len(lines) else []
        xys = np.asarray([float(x) for x in pts]).reshape(-1, 3)
        out[int(el[0])] = Image(
            id=int(el[0]),
            qvec=np.asarray([float(x) for x in el[1:5]]),
            tvec=np.asarray([float(x) for x in el[5:8]]),
            camera_id=int(el[8]),
            name=el[9],
            xys=xys[:, :2],
            point3D_ids=xys[:, 2].astype(np.int64),
        )
        i += 2
    return out


def _read_points3d_text(path) -> Dict[int, Point3D]:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            el = line.split()
            track = np.asarray([int(x) for x in el[8:]]).reshape(-1, 2)
            out[int(el[0])] = Point3D(
                id=int(el[0]),
                xyz=np.asarray([float(x) for x in el[1:4]]),
                rgb=np.asarray([int(x) for x in el[4:7]]),
                error=float(el[7]),
                image_ids=track[:, 0],
                point2D_idxs=track[:, 1],
            )
    return out


def _write_cameras_text(cameras: Dict[int, Camera], path) -> None:
    with open(path, "w") as f:
        f.write("# Camera list: CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        for cam in cameras.values():
            params = " ".join(repr(float(p)) for p in cam.params)
            f.write(f"{cam.id} {cam.model} {cam.width} {cam.height} {params}\n")


def _write_images_text(images: Dict[int, Image], path) -> None:
    with open(path, "w") as f:
        f.write("# Image list: IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n")
        for im in images.values():
            q = " ".join(repr(float(x)) for x in im.qvec)
            t = " ".join(repr(float(x)) for x in im.tvec)
            f.write(f"{im.id} {q} {t} {im.camera_id} {im.name}\n")
            pts = " ".join(
                f"{x} {y} {pid}"
                for (x, y), pid in zip(im.xys, im.point3D_ids)
            )
            f.write(pts + "\n")


def _write_points3d_text(points: Dict[int, Point3D], path) -> None:
    with open(path, "w") as f:
        f.write("# 3D point list: POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[]\n")
        for p in points.values():
            xyz = " ".join(repr(float(x)) for x in p.xyz)
            rgb = " ".join(str(int(x)) for x in p.rgb)
            track = " ".join(
                f"{i} {j}" for i, j in zip(p.image_ids, p.point2D_idxs)
            )
            f.write(f"{p.id} {xyz} {rgb} {p.error} {track}\n")


# ---------------------------------------------------------------------------
# binary format
# ---------------------------------------------------------------------------


def _read_next(f, fmt):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def _read_cameras_bin(path) -> Dict[int, Camera]:
    out = {}
    with open(path, "rb") as f:
        (n,) = _read_next(f, "<Q")
        for _ in range(n):
            cid, model_id, w, h = _read_next(f, "<iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.asarray(_read_next(f, f"<{n_params}d"))
            out[cid] = Camera(cid, name, int(w), int(h), params)
    return out


def _read_images_bin(path) -> Dict[int, Image]:
    out = {}
    with open(path, "rb") as f:
        (n,) = _read_next(f, "<Q")
        for _ in range(n):
            iid = _read_next(f, "<i")[0]
            qvec = np.asarray(_read_next(f, "<4d"))
            tvec = np.asarray(_read_next(f, "<3d"))
            cam_id = _read_next(f, "<i")[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read_next(f, "<Q")
            # COLMAP point2D record is 'ddq': x, y doubles + int64
            # POINT3D_ID (NOT three doubles — reading the id as a double
            # silently corrupts every id)
            data = _read_next(f, "<" + "ddq" * n_pts)
            xys = np.asarray(
                [(data[3 * i], data[3 * i + 1]) for i in range(n_pts)],
                dtype=np.float64,
            ).reshape(-1, 2)
            ids = np.asarray(
                [data[3 * i + 2] for i in range(n_pts)], dtype=np.int64
            )
            out[iid] = Image(iid, qvec, tvec, cam_id, name.decode(), xys, ids)
    return out


def _read_points3d_bin(path) -> Dict[int, Point3D]:
    out = {}
    with open(path, "rb") as f:
        (n,) = _read_next(f, "<Q")
        for _ in range(n):
            pid = _read_next(f, "<Q")[0]
            xyz = np.asarray(_read_next(f, "<3d"))
            rgb = np.asarray(_read_next(f, "<3B"))
            (err,) = _read_next(f, "<d")
            (track_len,) = _read_next(f, "<Q")
            track = np.asarray(_read_next(f, f"<{2 * track_len}i")).reshape(-1, 2)
            out[pid] = Point3D(pid, xyz, rgb, float(err), track[:, 0], track[:, 1])
    return out


def _write_cameras_bin(cameras: Dict[int, Camera], path) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cameras)))
        for cam in cameras.values():
            mid, n_params = CAMERA_MODEL_IDS[cam.model]
            f.write(struct.pack("<iiQQ", cam.id, mid, cam.width, cam.height))
            f.write(struct.pack(f"<{n_params}d", *cam.params[:n_params]))


def _write_images_bin(images: Dict[int, Image], path) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images.values():
            f.write(struct.pack("<i", im.id))
            f.write(struct.pack("<4d", *im.qvec))
            f.write(struct.pack("<3d", *im.tvec))
            f.write(struct.pack("<i", im.camera_id))
            f.write(im.name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(im.xys)))
            for (x, y), pid in zip(im.xys, im.point3D_ids):
                f.write(struct.pack("<ddq", x, y, int(pid)))


def _write_points3d_bin(points: Dict[int, Point3D], path) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for p in points.values():
            f.write(struct.pack("<Q", p.id))
            f.write(struct.pack("<3d", *p.xyz))
            f.write(struct.pack("<3B", *p.rgb.astype(np.uint8)))
            f.write(struct.pack("<d", p.error))
            f.write(struct.pack("<Q", len(p.image_ids)))
            for i, j in zip(p.image_ids, p.point2D_idxs):
                f.write(struct.pack("<2i", int(i), int(j)))


def read_model(path: str, ext: str = "auto"):
    """Read a COLMAP sparse model dir -> (cameras, images, points3d)."""
    if ext == "auto":
        ext = ".bin" if osp.exists(osp.join(path, "cameras.bin")) else ".txt"
    if ext == ".txt":
        return (
            _read_cameras_text(osp.join(path, "cameras.txt")),
            _read_images_text(osp.join(path, "images.txt")),
            _read_points3d_text(osp.join(path, "points3D.txt")),
        )
    return (
        _read_cameras_bin(osp.join(path, "cameras.bin")),
        _read_images_bin(osp.join(path, "images.bin")),
        _read_points3d_bin(osp.join(path, "points3D.bin")),
    )


def write_model(cameras, images, points3d, path: str, ext: str = ".txt") -> None:
    if ext == ".txt":
        _write_cameras_text(cameras, osp.join(path, "cameras.txt"))
        _write_images_text(images, osp.join(path, "images.txt"))
        _write_points3d_text(points3d, osp.join(path, "points3D.txt"))
    else:
        _write_cameras_bin(cameras, osp.join(path, "cameras.bin"))
        _write_images_bin(images, osp.join(path, "images.bin"))
        _write_points3d_bin(points3d, osp.join(path, "points3D.bin"))
