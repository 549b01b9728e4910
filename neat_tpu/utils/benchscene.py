"""The canonical benchmark configuration and synthetic scene.

bench.py, tools/bytes_accounting.py, and tools/phase_timing.py all measure
THE SAME training step — the flagship abc-neat-a configuration at the
reference batch size on an ABC-toy-shaped synthetic scene. This module is
the single source of truth for that setup; a config tweak here reaches
the benchmark and every probe at once (previously each tool carried a
hand-copied fork, which desynchronized whenever bench.py changed).
"""

from __future__ import annotations

import dataclasses

import numpy as np

BENCH_IMG_RES = (512, 512)
BENCH_N_VIEWS = 4  # per-step work is view-count free; keep the scene small
BENCH_N_RAYS = 1024  # the reference batch size (abc-neat-a.conf num_pixels)
BENCH_L_MAX = 40


def bench_config(
    dtype: str = "bfloat16",
    field: str | None = None,
    beta_search: str = "bisect",
    fused_rounds: str = "off",
):
    """The benchmarked NeatConfig.

    field: None = the shipped default (stashed-residual pallas field path
    on TPU backends, XLA elsewhere — the best measured config, RESULTS.md
    round 3); 'xla' | 'recompute' | 'stash' force a path for A/B probes.
    fused_rounds stays 'off' by default: measured on v5e the VMEM-resident
    round kernel is a consistent small loss vs XLA's fused round block
    (sampler 9.69 vs 9.40 ms) — TPU dispatch overhead is not GPU-launch
    overhead.
    """
    import jax

    from ..model.neat import NeatConfig
    from ..ops.fused_sdf import supports_fused_sdf

    cfg = NeatConfig.for_abc()
    on_tpu = jax.devices()[0].platform.lower() in ("tpu", "axon")
    if supports_fused_sdf(cfg.implicit) and on_tpu:
        cfg = dataclasses.replace(cfg, use_pallas_sampler=True)
    # bf16 main pass: training-parity validated (RESULTS.md 100-epoch A/B)
    cfg = dataclasses.replace(cfg, field_compute_dtype=dtype)
    if field is None:
        field = "stash" if (on_tpu and dtype == "bfloat16") else "xla"
    if field != "xla":
        cfg = dataclasses.replace(
            cfg, use_pallas_field=True, pallas_field_backward=field
        )
    if beta_search != "bisect":
        cfg = dataclasses.replace(
            cfg,
            sampler=dataclasses.replace(cfg.sampler, beta_search=beta_search),
        )
    if fused_rounds != "off":
        cfg = dataclasses.replace(
            cfg,
            sampler=dataclasses.replace(cfg.sampler, fused_rounds=fused_rounds),
        )
    return cfg


def bench_scene(cfg, device: bool = True):
    """ABC-toy-shaped synthetic scene (deterministic), optionally device-put."""
    import jax
    import jax.numpy as jnp

    hw = BENCH_IMG_RES[0] * BENCH_IMG_RES[1]
    n_views, l_max = BENCH_N_VIEWS, BENCH_L_MAX
    rng = np.random.RandomState(0)
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = 560.0
    k[0, 2] = k[1, 2] = 256.0
    poses = np.tile(np.eye(4, dtype=np.float32), (n_views, 1, 1))
    poses[:, 2, 3] = -2.0
    scene = {
        "rgb": rng.rand(n_views, hw, 3).astype(np.float32),
        "intrinsics": np.tile(k, (n_views, 1, 1)),
        "pose": poses,
        "mask": np.ones((n_views, hw), dtype=bool),
        "labels": rng.randint(0, l_max, (n_views, hw)).astype(np.int32),
        "uv_proj": rng.rand(n_views, hw, 2).astype(np.float32) * 512,
        "lines": rng.rand(n_views, l_max, 5).astype(np.float32) * 512,
        "verts2d": rng.rand(n_views, cfg.max_verts, 2).astype(np.float32) * 512,
        "verts_mask": np.concatenate(
            [np.ones((n_views, 32), bool),
             np.zeros((n_views, cfg.max_verts - 32), bool)], axis=1,
        ),
        "support_idx": np.tile(np.arange(hw, dtype=np.int32), (n_views, 1)),
        "support_count": np.full((n_views,), hw, dtype=np.int32),
    }
    if not device:
        return scene
    return {k_: jax.device_put(jnp.asarray(v)) for k_, v in scene.items()}


def bench_step(cfg, donate: bool = True, n_rays: int = BENCH_N_RAYS):
    """(step_fn, initial state) for the benchmarked configuration.

    n_rays: ray-batch size per step; default is the reference batch
    (1024). tools/batch_frontier.py sweeps this to measure the
    amortization frontier.
    """
    import jax

    from ..model.loss import LossConfig
    from ..model.neat import init_neat
    from ..train.step import init_train_state, make_train_step

    params = init_neat(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, 5e-4, 0.1, 200000)
    step = make_train_step(
        cfg, LossConfig(), 5e-4, 0.1, 200000, n_rays,
        BENCH_IMG_RES[1], donate=donate,
    )
    return step, state
