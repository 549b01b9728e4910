"""Rendering evaluation: full-image PSNR per view + mesh export.

Parity target: reference code/evaluation/eval.py:97-166 — render every
pixel of every (or selected) view in chunks, write per-view PSNR rows and
mean±std to a csv, and export the marching-cubes surface of the SDF.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..model.neat import NeatConfig, neat_forward, offline_eval_config
from ..fields.mlp import implicit_sdf
from ..viz.mesh import sdf_to_mesh, save_ply


@partial(jax.jit, static_argnames=("cfg",))
def _render_chunk(params, inputs, cfg: NeatConfig, rng):
    out = neat_forward(params, inputs, cfg, rng, training=False)
    return out["rgb_values"], out["normal_map"], out["depth"]


def render_view(
    params, cfg: NeatConfig, scene, view: int, chunksize: int = 1024,
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Render one full view in fixed-size chunks (reference eval.py's
    split_input/merge_output flow). With ``mesh``, each chunk shards its
    ray axis over the mesh's data axis (params replicated)."""
    from ..utils.chunking import split_input, merge_output

    cfg = offline_eval_config(cfg)
    if mesh is not None:
        from ..parallel.mesh import (
            place_chunk_inputs,
            replicated_sharding,
            round_chunk_to_mesh,
        )

        chunksize = round_chunk_to_mesh(chunksize, mesh)
        params = jax.device_put(params, replicated_sharding(mesh))
    h, w = scene.img_res
    uv = scene.uv_full()
    n = uv.shape[0]
    intr = jnp.asarray(scene.intrinsics[view])
    pose = jnp.asarray(scene.pose[view])
    dummy_verts = jnp.zeros((1, 2), dtype=jnp.float32)
    dummy_vmask = jnp.zeros((1,), dtype=bool)
    rng = jax.random.PRNGKey(0)

    res = []
    for chunk in split_input({"uv": uv, "uv_proj": uv}, n, n_pixels=chunksize):
        inputs = {
            "uv": jnp.asarray(chunk["uv"]),
            "uv_proj": jnp.asarray(chunk["uv_proj"]),
            "intrinsics": intr,
            "pose": pose,
            "verts2d": dummy_verts,
            "verts_mask": dummy_vmask,
        }
        if mesh is not None:
            inputs = place_chunk_inputs(inputs, mesh)
        rgb, nrm, dep = _render_chunk(params, inputs, cfg, rng)
        res.append(
            {
                "rgb": np.asarray(rgb),
                "normal": np.asarray(nrm),
                "depth": np.asarray(dep),
                "_valid": chunk["_valid"],
            }
        )
    merged = merge_output(res, n)
    return {
        "rgb": merged["rgb"].reshape(h, w, 3),
        "normal": merged["normal"].reshape(h, w, 3),
        "depth": merged["depth"].reshape(h, w),
    }


def render_views_psnr(
    params,
    cfg: NeatConfig,
    scene,
    out_dir: Optional[str] = None,
    views: Optional[list] = None,
    chunksize: int = 1024,
    save_images: bool = True,
    mesh=None,
) -> Dict[str, float]:
    """Render views, compute PSNR vs GT, optionally write pngs + csv."""
    views = views if views is not None else list(range(scene.n_images))
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    psnrs = []
    for view in views:
        out = render_view(params, cfg, scene, view, chunksize, mesh=mesh)
        gt = scene.rgb[view].reshape(*scene.img_res, 3)
        mse = float(np.mean((out["rgb"] - gt) ** 2))
        psnr = -10.0 * np.log(mse) / np.log(10.0)
        psnrs.append(psnr)
        if out_dir and save_images:
            import imageio.v2 as imageio

            imageio.imwrite(
                osp.join(out_dir, f"eval_{view:03d}.png"),
                (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8),
            )
            imageio.imwrite(
                osp.join(out_dir, f"normal_{view:03d}.png"),
                (np.clip((out["normal"] + 1) / 2, 0, 1) * 255).astype(np.uint8),
            )
    psnrs = np.asarray(psnrs)
    if out_dir:
        with open(osp.join(out_dir, "psnr.csv"), "w") as f:
            for v, p in zip(views, psnrs):
                f.write(f"{v},{p:.6f}\n")
            f.write(f"mean,{psnrs.mean():.6f}\nstd,{psnrs.std():.6f}\n")
    return {"psnr_mean": float(psnrs.mean()), "psnr_std": float(psnrs.std())}


def export_scene_mesh(
    params,
    cfg: NeatConfig,
    path: str,
    resolution: int = 100,
    grid_boundary=(-1.5, 1.5),
    chunk: int = 65536,
    scale_mat=None,
    keep_largest_component: bool = False,
) -> None:
    """Marching surface of the SDF -> PLY (reference plots.py:140-218).
    ``chunk`` is the grid-evaluation batch; raise it for high resolutions
    to amortize per-dispatch latency (512^3 = 2048 dispatches at the
    default).

    The DTU/BMVS eval protocol exports in WORLD coordinates with only the
    biggest connected component (reference eval.py:152-158:
    mesh.apply_transform(scale_mat) then split + areas.argmax) — pass the
    scene's scale_mat and keep_largest_component=True to match; the
    defaults keep the raw normalized-coordinate surface (debug/ABC use)."""

    @jax.jit
    def sdf_fn(pts):
        return implicit_sdf(params["implicit"], pts, cfg.implicit)[..., 0]

    verts, faces = sdf_to_mesh(
        lambda p: np.asarray(sdf_fn(jnp.asarray(p))),
        resolution=resolution,
        grid_boundary=grid_boundary,
        chunk=chunk,
    )
    if scale_mat is not None:
        sm = np.asarray(scale_mat)
        verts = verts @ sm[:3, :3].T + sm[:3, 3]
    if keep_largest_component:
        from ..viz.mesh import largest_component

        verts, faces = largest_component(verts, faces)
    save_ply(path, verts, faces)


def main(argv=None):
    from ..utils.platform import apply_env_platform

    apply_env_platform()
    from ..train.config import load_experiment_config
    from ..train.checkpoint import load_checkpoint
    from ..data.datasets import load_scene_for_config

    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, required=True, help="runconf.conf path")
    parser.add_argument("--checkpoint", default="latest", type=str)
    parser.add_argument("--data_root", default="../data", type=str)
    parser.add_argument("--resolution", default=100, type=int)
    parser.add_argument("--chunksize", default=1024, type=int)
    parser.add_argument("--views", default=None, type=str, help="comma-separated ids")
    parser.add_argument("--mesh", default=0, type=int, dest="mesh_devices",
                        help="shard full-image rendering over an N-device "
                        "mesh (0 = single device)")
    args = parser.parse_args(argv)

    rundir = osp.dirname(args.conf)
    cfg = load_experiment_config(args.conf)
    state, epoch = load_checkpoint(osp.join(rundir, "checkpoints"), args.checkpoint)

    scene = load_scene_for_config(cfg, args.data_root)

    out_dir = osp.join(rundir, "evaluation")
    views = [int(v) for v in args.views.split(",")] if args.views else None
    mesh = None
    if args.mesh_devices:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_devices)
    stats = render_views_psnr(
        state.params, cfg.model, scene, out_dir, views, args.chunksize,
        mesh=mesh,
    )
    print(f"PSNR {stats['psnr_mean']:.3f} +- {stats['psnr_std']:.3f}")
    # DTU/BMVS scenes (non-identity scale_mat) export in world coordinates
    # with only the biggest component, the frame eval_dtu_mesh scores in
    # (reference eval.py:152-158); ABC/blender scenes keep normalized coords
    sm = np.asarray(scene.scale_mat)
    is_world = not np.allclose(sm, np.eye(4))
    export_scene_mesh(
        state.params,
        cfg.model,
        osp.join(out_dir, f"surface_{epoch}.ply"),
        resolution=args.resolution,
        grid_boundary=cfg.grid_boundary,
        scale_mat=sm if is_world else None,
        keep_largest_component=is_world,
    )


if __name__ == "__main__":
    main()
