"""Measure the implementation-cost ratio: reference torch step vs neat_tpu
step on the SAME CPU.

BASELINE.md's `vs_baseline` denominator (2,500 rays/s on an A100) is an
estimate because the reference publishes no numbers. This tool anchors the
*relative* cost of the two implementations with a measured number: it runs
the reference's own training step (code/training/volsdf_train.py:361-374 —
forward, loss, backward, Adam) via the interop harness, and the repo's full
jitted train step, both on this host's CPU at the reference batch size of
1024 rays and the abc-neat-a configuration, and reports the ratio.

The reference pins torch.set_num_threads(1) by design
(code/training/volsdf_train.py:68); we report that configuration AND an
all-cores run so the comparison cannot be accused of strangling torch.

Usage: python -m tools.measure_reference_ratio [--rays 1024] [--steps 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# must precede any jax import
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def _scene_inputs(n_rays: int, n_verts: int = 32, seed: int = 3):
    rs = np.random.RandomState(seed)
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = 400.0
    k[0, 2] = k[1, 2] = 256.0
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    pose[:3, 3] = [0.0, 0.0, 2.5]
    uv = rs.uniform(96, 416, size=(n_rays, 2)).astype(np.float32)
    lines = rs.uniform(96, 416, size=(n_rays, 4)).astype(np.float32)
    score = rs.uniform(0.5, 1.0, size=(n_rays, 1)).astype(np.float32)
    return {
        "intrinsics": k,
        "pose": pose,
        "uv": uv,
        "uv_proj": (uv + rs.uniform(-4, 4, size=uv.shape)).astype(np.float32),
        "verts2d": rs.uniform(96, 416, size=(n_verts, 2)).astype(np.float32),
        "rgb": rs.uniform(0, 1, size=(n_rays, 3)).astype(np.float32),
        "lines2d": np.concatenate([lines, score], axis=1),
    }


def time_reference_step(n_rays: int, n_steps: int, threads: int) -> float:
    """Seconds per reference train step (forward+loss+backward+Adam)."""
    import torch

    from neat_tpu.interop.reference_runtime import (
        WireframeStub,
        build_reference_loss,
        build_reference_model,
    )

    torch.set_num_threads(threads)
    conf = os.path.join(os.path.dirname(__file__), "..", "confs", "abc-neat-a.conf")
    model = build_reference_model(conf)
    loss_fn = build_reference_loss()
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)

    s = _scene_inputs(n_rays)
    t = lambda a: torch.as_tensor(a)
    inputs = {
        "uv": t(s["uv"])[None],
        "uv_proj": t(s["uv_proj"])[None],
        "pose": t(s["pose"])[None],
        "intrinsics": t(s["intrinsics"])[None],
        "wireframe": [WireframeStub(s["verts2d"])],
    }
    gt = {"rgb": t(s["rgb"])[None], "lines2d": t(s["lines2d"])[None]}

    def one_step():
        out = model(inputs)
        loss = loss_fn(out, gt)["loss"]
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    one_step()  # warmup (allocator, autograd graph caches)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        one_step()
    return (time.perf_counter() - t0) / n_steps


def time_repo_step(n_rays: int, n_steps: int) -> float:
    """Seconds per neat_tpu full jitted train step on CPU (f32, strict
    config — same math as the reference; no bf16/pallas)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from neat_tpu.model.loss import LossConfig
    from neat_tpu.model.neat import NeatConfig, init_neat
    from neat_tpu.train.step import init_train_state, make_train_step
    from neat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = dataclasses.replace(
        NeatConfig.for_abc(), sampler_compute_dtype="float32"
    )
    img_res = (512, 512)
    hw = img_res[0] * img_res[1]
    n_views = 2
    l_max = 40
    rs = np.random.RandomState(0)
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = 400.0
    k[0, 2] = k[1, 2] = 256.0
    poses = np.tile(np.eye(4, dtype=np.float32), (n_views, 1, 1))
    poses[:, 2, 3] = 2.5
    poses[:, :3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    scene = {
        "rgb": rs.rand(n_views, hw, 3).astype(np.float32),
        "intrinsics": np.tile(k, (n_views, 1, 1)),
        "pose": poses,
        "mask": np.ones((n_views, hw), dtype=bool),
        "labels": rs.randint(0, l_max, (n_views, hw)).astype(np.int32),
        "uv_proj": rs.rand(n_views, hw, 2).astype(np.float32) * 512,
        "lines": rs.rand(n_views, l_max, 5).astype(np.float32) * 512,
        "verts2d": rs.rand(n_views, cfg.max_verts, 2).astype(np.float32) * 512,
        "verts_mask": np.concatenate(
            [np.ones((n_views, 32), bool),
             np.zeros((n_views, cfg.max_verts - 32), bool)], axis=1
        ),
        "support_idx": np.tile(np.arange(hw, dtype=np.int32), (n_views, 1)),
        "support_count": np.full((n_views,), hw, dtype=np.int32),
    }
    scene_dev = {k_: jax.device_put(jnp.asarray(v)) for k_, v in scene.items()}
    params = init_neat(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, 5e-4, 0.1, 200000)
    step = make_train_step(cfg, LossConfig(), 5e-4, 0.1, 200000, n_rays, img_res[1])

    rngs = jax.random.split(jax.random.PRNGKey(1), n_steps + 1)
    state, aux = step(state, scene_dev, rngs[0])  # compile + warmup
    float(np.asarray(aux["loss"]))
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, aux = step(state, scene_dev, rngs[1 + i])
    float(np.asarray(aux["loss"]))
    return (time.perf_counter() - t0) / n_steps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args(argv)

    ours = time_repo_step(args.rays, args.steps)
    ref_1t = time_reference_step(args.rays, args.steps, threads=1)
    ref_all = time_reference_step(
        args.rays, args.steps, threads=os.cpu_count() or 1
    )

    print(
        json.dumps(
            {
                "rays": args.rays,
                "cpu_count": os.cpu_count(),
                "ref_step_s_1thread": round(ref_1t, 3),
                "ref_step_s_allcores": round(ref_all, 3),
                "ours_step_s": round(ours, 3),
                "ratio_vs_ref_1thread": round(ref_1t / ours, 2),
                "ratio_vs_ref_allcores": round(ref_all / ours, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
