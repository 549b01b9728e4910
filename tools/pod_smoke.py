"""Smoke-run the shard_map pod train step with the fused pallas kernels.

Two modes:

  * ``--mode trace`` (default; any backend): build an 8-shard mesh
    (virtual CPU devices if needed) and jax.eval_shape the fused pod step
    at the canonical architecture — certifies the pallas sampler +
    stash-field kernels trace through jax.shard_map.
  * ``--mode exec`` (TPU): build a mesh over the real visible chips and
    EXECUTE one fused pod step. On this image's single tunneled chip that
    is a 1-device mesh — the same shard_map program a pod runs, minus the
    cross-chip collectives; on a real pod it is the full fast path.
  * ``--mode compare`` (TPU): run N fused steps through BOTH the
    shard_map pod step and the regular unsharded step from the same
    init/scene/keys and report max loss and parameter deviation — the
    executed certification VERDICT r4 #3 asked for (the pallas kernels
    run INSIDE jax.shard_map, through the psum'd-gradient path, on real
    hardware, and must agree with the single-device program).

The reference has no multi-device story at all (single-GPU torch,
code/training/volsdf_train.py); this is the framework's own pod
composition check (train/step.py _make_shard_map_step).

Usage: python tools/pod_smoke.py [--mode trace|exec] [--n_rays 1024]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--mode", default="trace",
        choices=["trace", "exec", "exec_single", "compare"],
        help="exec_single: the same fused config through the regular "
        "(non-shard_map) step — the apples-to-apples baseline for exec; "
        "compare: run both and report the deviation",
    )
    parser.add_argument("--n_rays", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=3)
    args = parser.parse_args()

    if args.mode == "trace":
        # force CPU regardless of the env (this image presets
        # JAX_PLATFORMS=axon) and pin exactly 8 virtual devices
        import re

        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+",
            "",
            os.environ.get("XLA_FLAGS", ""),
        )
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neat_tpu.model.loss import LossConfig
    from neat_tpu.model.neat import NeatConfig, init_neat
    from neat_tpu.parallel.mesh import make_mesh
    from neat_tpu.train.step import init_train_state, make_train_step
    from neat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    cfg = dataclasses.replace(
        NeatConfig.for_abc(),
        use_pallas_sampler=True,
        use_pallas_field=True,
        pallas_field_backward="stash",
        field_compute_dtype="bfloat16",
        max_verts=64,
    )
    img_w, n_views = 32, 2
    hw = img_w * img_w
    rng = np.random.RandomState(0)
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = 35.0
    k[0, 2] = k[1, 2] = img_w / 2.0
    poses = np.tile(np.eye(4, dtype=np.float32), (n_views, 1, 1))
    poses[:, 2, 3] = -2.0
    l_max = 4
    rep = NamedSharding(mesh, P())
    scene = {
        "rgb": rng.rand(n_views, hw, 3).astype(np.float32),
        "intrinsics": np.tile(k, (n_views, 1, 1)),
        "pose": poses,
        "mask": np.ones((n_views, hw), bool),
        "labels": rng.randint(0, l_max, (n_views, hw)).astype(np.int32),
        "uv_proj": (rng.rand(n_views, hw, 2) * img_w).astype(np.float32),
        "lines": (rng.rand(n_views, l_max, 5) * img_w).astype(np.float32),
        "verts2d": (rng.rand(n_views, 64, 2) * img_w).astype(np.float32),
        "verts_mask": np.ones((n_views, 64), bool),
        "support_idx": np.tile(np.arange(hw, dtype=np.int32), (n_views, 1)),
        "support_count": np.full((n_views,), hw, np.int32),
    }
    scene_dev = {
        kk: jax.device_put(jnp.asarray(v), rep) for kk, v in scene.items()
    }
    step = make_train_step(
        cfg, LossConfig(), 5e-4, 0.1, 100, args.n_rays, img_w,
        shard_map_mesh=None if args.mode == "exec_single" else mesh,
        donate=False,
    )

    if args.mode == "trace":
        state = jax.eval_shape(
            lambda key: init_train_state(init_neat(key, cfg), 5e-4, 0.1, 100),
            jax.random.PRNGKey(0),
        )
        with mesh:
            jax.eval_shape(step, state, scene_dev, jax.random.PRNGKey(1))
        print(json.dumps({
            "mode": "trace", "n_shards": n_dev, "ok": True,
            "note": "fused pod step (pallas sampler + stash field) traces",
        }))
        return

    if args.mode == "compare":
        step_1 = make_train_step(
            cfg, LossConfig(), 5e-4, 0.1, 100, args.n_rays, img_w,
            donate=False,
        )
        keys = jax.random.split(jax.random.PRNGKey(1), args.steps)
        results = {}
        for name, fn in [("pod", step), ("single", step_1)]:
            st = jax.device_put(
                init_train_state(
                    init_neat(jax.random.PRNGKey(0), cfg), 5e-4, 0.1, 100
                ),
                rep,
            )
            losses = []
            with mesh:
                for i in range(args.steps):
                    st, aux = fn(st, scene_dev, keys[i])
                    losses.append(float(np.asarray(aux["loss"])))
            results[name] = (losses, jax.tree_util.tree_leaves(st.params))
        loss_pod, leaves_pod = results["pod"]
        loss_1, leaves_1 = results["single"]
        dloss = max(
            abs(a - b) / max(abs(b), 1e-12) for a, b in zip(loss_pod, loss_1)
        )
        dparam = max(
            float(
                np.max(
                    np.abs(np.asarray(a) - np.asarray(b))
                    / np.maximum(np.abs(np.asarray(b)), 1e-6)
                )
            )
            for a, b in zip(leaves_pod, leaves_1)
        )
        print(json.dumps({
            "mode": "compare", "n_shards": n_dev, "steps": args.steps,
            "n_rays": args.n_rays,
            "loss_pod": [round(x, 8) for x in loss_pod],
            "loss_single": [round(x, 8) for x in loss_1],
            "max_rel_loss_diff": dloss, "max_rel_param_diff": dparam,
            "ok": bool(np.isfinite(loss_pod[-1])),
        }))
        return

    state = jax.device_put(
        init_train_state(init_neat(jax.random.PRNGKey(0), cfg), 5e-4, 0.1, 100),
        rep,
    )
    # pre-split every key OUTSIDE the timed loop: eager PRNGKey creation
    # dispatches small host-synced ops per call, which under the tunneled
    # TPU costs whole relay round-trips per step (bench.py does the same)
    keys = jax.random.split(jax.random.PRNGKey(1), args.steps + 1)
    with mesh:
        state, aux = step(state, scene_dev, keys[0])
        float(np.asarray(aux["loss"]))  # host fetch: the tunnel's true sync
        t0 = time.time()
        for i in range(args.steps):
            state, aux = step(state, scene_dev, keys[1 + i])
        float(np.asarray(aux["loss"]))
    dt = (time.time() - t0) / args.steps
    loss = float(np.asarray(aux["loss"]))
    assert np.isfinite(loss), f"non-finite loss {loss}"
    print(json.dumps({
        "mode": args.mode, "n_shards": n_dev, "ok": True,
        "loss": round(loss, 6), "step_ms": round(dt * 1e3, 2),
        "rays_per_s": round(args.n_rays / dt, 1),
    }))


if __name__ == "__main__":
    main()
