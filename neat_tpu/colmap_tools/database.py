"""COLMAP sqlite database wrapper + known-pose triangulation driver.

Parity target: reference colmap/abc.py and colmap/dtu.py — build a COLMAP
database, inject the known camera intrinsics/poses as a prior model, run
feature extraction + matching, then ``colmap point_triangulator`` against
the fixed poses. The sqlite schema follows the public COLMAP database
format specification.
"""

from __future__ import annotations

import os
import os.path as osp
import sqlite3
from typing import Dict, Optional

import numpy as np

MAX_IMAGE_ID = 2**31 - 1

_SCHEMA = """
CREATE TABLE IF NOT EXISTS cameras (
    camera_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    model INTEGER NOT NULL, width INTEGER NOT NULL, height INTEGER NOT NULL,
    params BLOB, prior_focal_length INTEGER NOT NULL);
CREATE TABLE IF NOT EXISTS images (
    image_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    name TEXT NOT NULL UNIQUE, camera_id INTEGER NOT NULL,
    prior_qw REAL, prior_qx REAL, prior_qy REAL, prior_qz REAL,
    prior_tx REAL, prior_ty REAL, prior_tz REAL,
    CONSTRAINT image_id_check CHECK(image_id >= 0 and image_id < 2147483647),
    FOREIGN KEY(camera_id) REFERENCES cameras(camera_id));
CREATE UNIQUE INDEX IF NOT EXISTS index_name ON images(name);
CREATE TABLE IF NOT EXISTS keypoints (
    image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    FOREIGN KEY(image_id) REFERENCES images(image_id) ON DELETE CASCADE);
CREATE TABLE IF NOT EXISTS descriptors (
    image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    FOREIGN KEY(image_id) REFERENCES images(image_id) ON DELETE CASCADE);
CREATE TABLE IF NOT EXISTS matches (
    pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB);
CREATE TABLE IF NOT EXISTS two_view_geometries (
    pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    config INTEGER NOT NULL, F BLOB, E BLOB, H BLOB,
    qvec BLOB, tvec BLOB);
"""


def image_ids_to_pair_id(id1: int, id2: int) -> int:
    if id1 > id2:
        id1, id2 = id2, id1
    return id1 * MAX_IMAGE_ID + id2


def pair_id_to_image_ids(pair_id: int):
    id2 = pair_id % MAX_IMAGE_ID
    return (pair_id - id2) // MAX_IMAGE_ID, id2


def _blob(a: np.ndarray) -> bytes:
    return np.ascontiguousarray(a).tobytes()


class COLMAPDatabase(sqlite3.Connection):
    @staticmethod
    def connect(path) -> "COLMAPDatabase":
        return sqlite3.connect(path, factory=COLMAPDatabase)

    def create_tables(self) -> None:
        self.executescript(_SCHEMA)

    def add_camera(
        self, model: int, width: int, height: int, params: np.ndarray,
        prior_focal_length: bool = False, camera_id: Optional[int] = None,
    ) -> int:
        cur = self.execute(
            "INSERT INTO cameras VALUES (?, ?, ?, ?, ?, ?)",
            (
                camera_id, model, width, height,
                _blob(np.asarray(params, np.float64)), int(prior_focal_length),
            ),
        )
        return cur.lastrowid

    def add_image(
        self, name: str, camera_id: int,
        # NaN = "no pose prior" (reference custom.py:200) — a concrete
        # identity default would feed pose-prior-aware COLMAP stages a
        # bogus origin prior for every image
        prior_q=(float("nan"),) * 4, prior_t=(float("nan"),) * 3,
        image_id: Optional[int] = None,
    ) -> int:
        cur = self.execute(
            "INSERT INTO images VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (image_id, name, camera_id, *prior_q, *prior_t),
        )
        return cur.lastrowid

    def add_keypoints(self, image_id: int, keypoints: np.ndarray) -> None:
        keypoints = np.asarray(keypoints, np.float32)
        self.execute(
            "INSERT INTO keypoints VALUES (?, ?, ?, ?)",
            (image_id, *keypoints.shape, _blob(keypoints)),
        )

    def add_matches(self, id1: int, id2: int, matches: np.ndarray) -> None:
        if id1 > id2:
            matches = matches[:, ::-1]
        matches = np.asarray(matches, np.uint32)
        self.execute(
            "INSERT INTO matches VALUES (?, ?, ?, ?)",
            (image_ids_to_pair_id(id1, id2), *matches.shape, _blob(matches)),
        )


def build_known_pose_db(
    db_path: str,
    intrinsics: Dict[str, np.ndarray],
    world2cam: Dict[str, np.ndarray],
    width: int,
    height: int,
) -> Dict[str, int]:
    """Create a database with PINHOLE cameras and pose priors for every
    image (reference colmap/abc.py example_usage flow). Returns
    name -> image_id."""
    from .model_io import rotmat2qvec

    if osp.exists(db_path):
        os.remove(db_path)
    db = COLMAPDatabase.connect(db_path)
    db.create_tables()
    ids = {}
    for name in sorted(intrinsics.keys()):
        k = intrinsics[name]
        cam_id = db.add_camera(
            1, width, height, [k[0, 0], k[1, 1], k[0, 2], k[1, 2]],
            prior_focal_length=True,
        )
        w2c = world2cam[name]
        q = rotmat2qvec(w2c[:3, :3])
        ids[name] = db.add_image(name, cam_id, prior_q=tuple(q), prior_t=tuple(w2c[:3, 3]))
    db.commit()
    db.close()
    return ids


def triangulate_known_poses(
    image_dir: str,
    workdir: str,
    intrinsics: Dict[str, np.ndarray],
    world2cam: Dict[str, np.ndarray],
    width: int,
    height: int,
    colmap_bin: str = "colmap",
) -> str:
    """Known-pose reconstruction: build DB with priors, extract+match
    features, write a fixed-pose prior model, point_triangulator
    (reference colmap/abc.py:330-398). Returns the output model dir."""
    import shutil
    import subprocess

    from .model_io import Camera, Image, write_model, rotmat2qvec

    if shutil.which(colmap_bin) is None:
        raise RuntimeError(f"'{colmap_bin}' binary not found")

    os.makedirs(workdir, exist_ok=True)
    db_path = osp.join(workdir, "database.db")
    build_known_pose_db(db_path, intrinsics, world2cam, width, height)

    subprocess.run(
        [colmap_bin, "feature_extractor", "--database_path", db_path,
         "--image_path", image_dir], check=True,
    )
    subprocess.run(
        [colmap_bin, "exhaustive_matcher", "--database_path", db_path],
        check=True,
    )

    # prior model with fixed poses and empty points
    prior_dir = osp.join(workdir, "prior")
    os.makedirs(prior_dir, exist_ok=True)
    db = COLMAPDatabase.connect(db_path)
    rows = db.execute("SELECT image_id, name, camera_id FROM images").fetchall()
    db.close()
    cams, imgs = {}, {}
    for image_id, name, camera_id in rows:
        k = intrinsics[name]
        cams[camera_id] = Camera(
            camera_id, "PINHOLE", width, height,
            np.asarray([k[0, 0], k[1, 1], k[0, 2], k[1, 2]]),
        )
        w2c = world2cam[name]
        imgs[image_id] = Image(
            image_id, rotmat2qvec(w2c[:3, :3]), w2c[:3, 3], camera_id, name,
            np.zeros((0, 2)), np.zeros((0,), np.int64),
        )
    write_model(cams, imgs, {}, prior_dir, ext=".txt")

    out_dir = osp.join(workdir, "triangulated")
    os.makedirs(out_dir, exist_ok=True)
    subprocess.run(
        [colmap_bin, "point_triangulator", "--database_path", db_path,
         "--image_path", image_dir, "--input_path", prior_dir,
         "--output_path", out_dir], check=True,
    )
    subprocess.run(
        [colmap_bin, "model_converter", "--input_path", out_dir,
         "--output_path", out_dir, "--output_type", "txt"], check=True,
    )
    return out_dir
