"""COLMAP model -> neat_tpu camera conventions.

Parity targets:
  * reference colmap/custom.py:374-424 — parse the SfM text model into a
    ``cameras_unnormalize.npz``;
  * reference colmap/dtu.py:277-283 — the consuming convention
    ``P = world_mat @ scale_mat`` where ``world_mat = K @ [R|t]`` (4x4)
    and ``scale_mat`` maps the normalized scene into the original world.

``normalize_cameras`` computes the scale matrix the IDR/VolSDF way: center
at the centroid of the sparse points visible from multiple views, radius
chosen so every camera center lies inside ``camera_radius`` of the unit
scene (the dataset then trains inside scene_bounding_sphere=3).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from typing import Dict, Optional

import numpy as np

from .model_io import read_model


def colmap_to_world_mats(model_dir: str):
    """(world_mats {name: 4x4 K[R|t]}, intrinsics {name: 3x3},
    points (N, 3))."""
    cameras, images, points3d = read_model(model_dir)
    world_mats, intrinsics = {}, {}
    for im in images.values():
        k = cameras[im.camera_id].K()
        w2c = im.world2cam()
        p = np.eye(4)
        p[:3] = k @ w2c[:3]
        world_mats[im.name] = p
        intrinsics[im.name] = k
    pts = np.stack([p.xyz for p in points3d.values()]) if points3d else np.zeros((0, 3))
    return world_mats, intrinsics, pts


def normalize_cameras(
    world_mats: Dict[str, np.ndarray],
    points: Optional[np.ndarray] = None,
    camera_radius: float = 3.0,
) -> np.ndarray:
    """Compute scale_mat so the scene sits in the unit-ish ball.

    Returns the 4x4 scale matrix (same for all views, the reference's
    scale_mat_i)."""
    centers = []
    for p in world_mats.values():
        # decompose K[R|t] -> camera center c = -R^T t via the nullspace
        m = p[:3, :4]
        c = -np.linalg.solve(m[:3, :3], m[:3, 3])
        # note: m = K R, so c = -(KR)^-1 K t = -R^T t  (correct center)
        centers.append(c)
    centers = np.stack(centers)
    if points is not None and len(points) > 50:
        # robust centroid of the sparse cloud
        center = np.median(points, axis=0)
        spread = np.percentile(np.linalg.norm(points - center, axis=1), 90)
        # the point spread alone says nothing about where the CAMERAS
        # land: if they would normalize outside camera_radius, the
        # samplers' scene_bounding_sphere/far budget (sampling) no longer
        # reaches the object — grow the scale until the cameras fit
        cam_spread = np.linalg.norm(centers - center, axis=1).max()
        spread = max(spread, cam_spread / camera_radius)
    else:
        center = centers.mean(axis=0)
        spread = np.linalg.norm(centers - center, axis=1).max() / camera_radius
    radius = max(spread, 1e-6)
    scale_mat = np.eye(4)
    scale_mat[0, 0] = scale_mat[1, 1] = scale_mat[2, 2] = radius
    scale_mat[:3, 3] = center
    return scale_mat


def colmap_to_cameras_npz(
    model_dir: str,
    out_path: str,
    normalize: bool = True,
    camera_radius: float = 3.0,
    image_dir: Optional[str] = None,
) -> None:
    """Write cameras.npz in the DTU/BMVS convention consumed by
    load_dtu_scene (world_mat_i [+ scale_mat_i]).

    world_mat_i is positional over the SORTED image-file list the loader
    zips it with, so a partial COLMAP registration must fail here rather
    than silently pair image i with the pose of a different image once an
    unregistered file shifts the order. Pass image_dir to check (the
    run_sfm caller does)."""
    world_mats, _, points = colmap_to_world_mats(model_dir)
    names = sorted(world_mats.keys())
    if image_dir is not None:
        on_disk = sorted(
            f for f in os.listdir(image_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        if names != on_disk:
            missing = sorted(set(on_disk) - set(names))
            raise RuntimeError(
                f"COLMAP registered {len(names)}/{len(on_disk)} images; "
                f"world_mat_i indices are positional over the sorted file "
                f"list, so an incomplete registration would mis-pair poses. "
                f"Unregistered: {missing[:8]}{'...' if len(missing) > 8 else ''} "
                f"— re-run SfM or remove those images."
            )
    out = {}
    scale_mat = (
        normalize_cameras(world_mats, points, camera_radius)
        if normalize
        else np.eye(4)
    )
    for i, name in enumerate(names):
        out[f"world_mat_{i}"] = world_mats[name]
        out[f"scale_mat_{i}"] = scale_mat
    np.savez(out_path, **out)


def run_sfm(image_dir: str, workdir: str, colmap_bin: str = "colmap") -> str:
    """Drive the COLMAP SfM pipeline (reference colmap/custom.py:345-370):
    feature_extractor -> exhaustive_matcher -> mapper -> model_converter.
    Requires the colmap binary on PATH; returns the text-model dir."""
    import shutil
    import subprocess

    if shutil.which(colmap_bin) is None:
        raise RuntimeError(
            f"'{colmap_bin}' binary not found — COLMAP is an external tool "
            "(reference treats it the same way)"
        )
    os.makedirs(workdir, exist_ok=True)
    db = osp.join(workdir, "database.db")
    subprocess.run(
        [
            colmap_bin, "feature_extractor", "--database_path", db,
            "--image_path", image_dir,
            "--ImageReader.camera_model", "PINHOLE",
            "--ImageReader.single_camera", "1",
        ],
        check=True,
    )
    subprocess.run(
        [colmap_bin, "exhaustive_matcher", "--database_path", db], check=True
    )
    subprocess.run(
        [
            colmap_bin, "mapper", "--database_path", db,
            "--image_path", image_dir, "--output_path", workdir,
        ],
        check=True,
    )
    subprocess.run(
        [
            colmap_bin, "model_converter",
            "--input_path", osp.join(workdir, "0"),
            "--output_path", workdir, "--output_type", "txt",
        ],
        check=True,
    )
    return workdir


def main(argv=None):
    from ..utils.platform import apply_env_platform

    apply_env_platform()
    parser = argparse.ArgumentParser(
        description="COLMAP SfM -> cameras.npz (reference colmap/custom.py)"
    )
    parser.add_argument("--images", type=str, help="image dir (runs SfM)")
    parser.add_argument("--model", type=str, help="existing COLMAP model dir")
    parser.add_argument("--workdir", type=str, default="colmap_out")
    parser.add_argument("--out", type=str, required=True, help="cameras.npz path")
    parser.add_argument("--no-normalize", action="store_true")
    args = parser.parse_args(argv)

    model_dir = args.model
    if model_dir is None:
        assert args.images, "need --images or --model"
        model_dir = run_sfm(args.images, args.workdir)
    colmap_to_cameras_npz(
        model_dir, args.out, normalize=not args.no_normalize,
        image_dir=args.images,
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
