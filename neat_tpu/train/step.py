"""The jitted training step: device-side ray sampling -> forward -> loss ->
psum'd grads -> Adam update, all in one XLA program.

Reference counterpart: the per-iteration body of VolSDFTrainRunner.run
(reference code/training/volsdf_train.py:361-408) — there, every step does a
host-side DataLoader fetch, H2D copies, two CPU scipy round-trips, a torch
backward, and a scheduler step. Here the packed scene lives in HBM and the
step is a single compiled function; the optimizer is Adam with the same
per-iteration exponential LR decay (lr0 * decay_rate^(step/decay_steps),
volsdf_train.py:177-182,408).

Multi-chip: the ray batch is sharded over the mesh's 'data' axis with
sharding constraints; parameters stay replicated. Gradient reduction is
inserted by GSPMD. See parallel/mesh.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..model.neat import NeatConfig, neat_forward
from ..model.loss import LossConfig, neat_loss
from ..core.camera import psnr as psnr_fn


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def make_lr_schedule(lr: float, decay_rate: float, decay_steps: int):
    """lr0 * decay_rate ** (step / decay_steps), stepped every iteration
    (the reference's ExponentialLR(gamma=decay_rate**(1/decay_steps)))."""
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=max(decay_steps, 1),
        decay_rate=decay_rate,
        staircase=False,
    )


def make_optimizer(lr: float, decay_rate: float, decay_steps: int):
    return optax.adam(
        learning_rate=make_lr_schedule(lr, decay_rate, decay_steps),
        b1=0.9,
        b2=0.999,
        eps=1e-8,
    )


def init_train_state(params, lr: float, decay_rate: float, decay_steps: int) -> TrainState:
    opt = make_optimizer(lr, decay_rate, decay_steps)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        step=jnp.asarray(0, dtype=jnp.int32),
    )


def sample_batch(
    rng,
    scene: Dict[str, jnp.ndarray],
    n_rays: int,
    img_width: int,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Draw one view and ``n_rays`` support pixels on device.

    scene arrays (device-resident):
      rgb (V, HW, 3), mask (V, HW), labels (V, HW), uv_proj (V, HW, 2),
      lines (V, L, 5), verts2d (V, Vm, 2), verts_mask (V, Vm),
      intrinsics (V, 4, 4), pose (V, 4, 4),
      support_idx (V, S), support_count (V,)

    Mirrors the reference sampling: one random view per step (DataLoader
    shuffle, batch 1) and uniform-with-replacement pixels from the support
    mask (blender_hawp_dataset.py:186-198).
    """
    # NOTE: the dual-batch branch of make_train_step replays this exact
    # (split -> randint) sequence to reuse the same view for its uniform
    # pass; keep the first draw in sync
    r_view, r_pix = jax.random.split(rng)
    n_views = scene["rgb"].shape[0]
    v = jax.random.randint(r_view, (), 0, n_views)

    count = scene["support_count"][v]
    draw = jax.random.randint(r_pix, (n_rays,), 0, count)
    pix = scene["support_idx"][v, draw]  # (R,) flat pixel ids

    x = (pix % img_width).astype(jnp.float32)
    y = (pix // img_width).astype(jnp.float32)
    uv = jnp.stack([x, y], axis=-1)

    labels = scene["labels"][v, pix]  # (R,)
    inputs = {
        "uv": uv,
        "uv_proj": scene["uv_proj"][v, pix],
        "intrinsics": scene["intrinsics"][v],
        "pose": scene["pose"][v],
        "verts2d": scene["verts2d"][v],
        "verts_mask": scene["verts_mask"][v],
    }
    ground_truth = {
        "rgb": scene["rgb"][v, pix],
        "lines2d": scene["lines"][v, labels],  # (R, 5)
    }
    if "depth" in scene:
        ground_truth["depth"] = scene["depth"][v, pix]
    return inputs, ground_truth


def sample_uniform_batch(
    rng, scene: Dict[str, jnp.ndarray], n_rays: int, img_width: int, view
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Uniformly-sampled pixels of a given view (the dual-batch RGB pass,
    reference neat_wfr_dual.py's uv0)."""
    hw = scene["rgb"].shape[1]
    pix = jax.random.randint(rng, (n_rays,), 0, hw)
    x = (pix % img_width).astype(jnp.float32)
    y = (pix // img_width).astype(jnp.float32)
    uv = jnp.stack([x, y], axis=-1)
    inputs = {
        "uv": uv,
        "uv_proj": uv,
        "intrinsics": scene["intrinsics"][view],
        "pose": scene["pose"][view],
        "verts2d": scene["verts2d"][view],
        "verts_mask": jnp.zeros_like(scene["verts_mask"][view]),
    }
    return inputs, {"rgb": scene["rgb"][view, pix]}


def make_train_step(
    model_cfg: NeatConfig,
    loss_cfg: LossConfig,
    lr: float,
    decay_rate: float,
    decay_steps: int,
    n_rays: int,
    img_width: int,
    data_sharding=None,
    donate: bool = True,
    shard_map_mesh=None,
    shard_axis: str = "data",
    _raw: bool = False,
):
    """Build the jitted step function.

    step(state, scene, rng) -> (state, metrics)

    ``_raw=True`` returns the un-jitted python step body (for composition
    into the scanned multi-step below; not part of the public surface).

    Multi-chip modes:
      * ``data_sharding`` (GSPMD): one global program with sharding
        constraints on the ray batch; XLA partitions it. Cannot partition
        an opaque pallas_call — incompatible with the pallas fast path.
      * ``shard_map_mesh`` (pod step): the per-ray forward+backward runs
        inside jax.shard_map over ``shard_axis`` — each shard executes the
        (pallas-capable) hot path on its rows, per-ray tensors are
        all_gather'ed for the batch-global junction matching and loss, and
        parameter grads are psum'd. Numerically equivalent to the GSPMD
        step for the same sampled batch and noise (tests/test_parallel.py
        asserts it); randomness is pre-drawn at global shape via
        model.neat.draw_forward_noise so shards consume one global stream.
    """
    optimizer = make_optimizer(lr, decay_rate, decay_steps)
    if shard_map_mesh is not None and data_sharding is not None:
        raise ValueError("choose one of data_sharding (GSPMD) or shard_map_mesh")
    if shard_map_mesh is not None:
        return _make_shard_map_step(
            model_cfg, loss_cfg, optimizer, n_rays, img_width,
            shard_map_mesh, shard_axis, donate, _raw=_raw,
        )

    def loss_fn(params, inputs, ground_truth, rng):
        if model_cfg.dual_batch:
            # two-pass variant: RGB+eikonal from the uniform batch, line and
            # junction terms from the support batch (neat_wfr_dual.py:351-502)
            r0, r1 = jax.random.split(rng)
            out0 = neat_forward(
                params, ground_truth["_uniform_inputs"], model_cfg, r0, training=True
            )
            out1 = neat_forward(params, inputs, model_cfg, r1, training=True)
            out = dict(out1)
            out["rgb_values"] = out0["rgb_values"]
            out["grad_theta"] = out0["grad_theta"]
            gt = dict(ground_truth)
            gt["rgb"] = ground_truth["_uniform_rgb"]
            gt.pop("_uniform_inputs")
            gt.pop("_uniform_rgb")
            losses = neat_loss(out, gt, loss_cfg)
            aux = dict(losses)
            aux["psnr"] = psnr_fn(out["rgb_values"], gt["rgb"])
            return losses["loss"], aux
        out = neat_forward(params, inputs, model_cfg, rng, training=True)
        with jax.named_scope("loss"):
            losses = neat_loss(out, ground_truth, loss_cfg)
        aux = dict(losses)
        aux["psnr"] = psnr_fn(out["rgb_values"], ground_truth["rgb"])
        return losses["loss"], aux

    def step(state: TrainState, scene: Dict[str, jnp.ndarray], rng) -> Tuple[TrainState, Dict]:
        r_batch, r_fwd = jax.random.split(jax.random.fold_in(rng, state.step))
        with jax.named_scope("batch_sample"):
            inputs, ground_truth = sample_batch(r_batch, scene, n_rays, img_width)
        if model_cfg.dual_batch:
            # the reference's two-pass variant samples uv0 and uv from the
            # SAME DataLoader view (neat_wfr_dual.py:351-353); recover the
            # view sample_batch drew by replaying its rng split (kept in
            # sync with sample_batch's first draw)
            r_view, _ = jax.random.split(r_batch)
            view = jax.random.randint(r_view, (), 0, scene["rgb"].shape[0])
            r_uni = jax.random.fold_in(r_batch, 1)
            uni_inputs, uni_gt = sample_uniform_batch(
                r_uni, scene, n_rays, img_width, view
            )
            ground_truth = dict(ground_truth)
            ground_truth["_uniform_inputs"] = uni_inputs
            ground_truth["_uniform_rgb"] = uni_gt["rgb"]
        if data_sharding is not None:
            # Constrain only ray-leading leaves; ground_truth may contain the
            # nested _uniform_inputs dict whose (4,4) camera leaves must stay
            # replicated (they have no ray axis to shard).
            def _constrain(v):
                if v.ndim >= 1 and v.shape[0] == n_rays:
                    return jax.lax.with_sharding_constraint(v, data_sharding)
                return v

            inputs = jax.tree_util.tree_map(_constrain, inputs)
            ground_truth = jax.tree_util.tree_map(_constrain, ground_truth)
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, inputs, ground_truth, r_fwd
        )
        with jax.named_scope("adam"):
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, aux

    if _raw:
        return step
    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_train_multi_step(
    model_cfg: NeatConfig,
    loss_cfg: LossConfig,
    lr: float,
    decay_rate: float,
    decay_steps: int,
    n_rays: int,
    img_width: int,
    data_sharding=None,
    donate: bool = True,
    shard_map_mesh=None,
    shard_axis: str = "data",
):
    """A lax.scan over the train step: one XLA program executes K steps.

    multi(state, scene, rngs) -> (state, stacked_metrics)   rngs: (K, key)

    Numerically equivalent to K sequential ``make_train_step`` calls on
    the same rng sequence (the scan body IS that step; tests bound the
    compilation-variant fp drift). Measured on v5e (docs/perf_round5.md):
    steady-state scan per-step time EQUALS the dispatched step's —
    JAX's async dispatch already hides the ~30 ms tunnel latency behind
    the ~28 ms flagship step — and the scan pays a one-time ~32 s
    second-call stall (donated-layout rebind). So the runner keeps this
    OPT-IN (--epoch_scan): it only wins when the step body is far
    smaller than the host round-trip (tools/scan_probe.py's matmul
    control: 19x), e.g. tiny models or very-high-latency runtimes.

    K is fixed by the rngs leading axis at trace time (one compile per
    distinct epoch length; real scenes have a single fixed n_views).
    """
    raw = make_train_step(
        model_cfg, loss_cfg, lr, decay_rate, decay_steps, n_rays, img_width,
        data_sharding=data_sharding, donate=donate,
        shard_map_mesh=shard_map_mesh, shard_axis=shard_axis, _raw=True,
    )

    def multi(state: TrainState, scene: Dict[str, jnp.ndarray], rngs):
        def body(st, r):
            return raw(st, scene, r)

        return jax.lax.scan(body, state, rngs)

    donate_argnums = (0,) if donate else ()
    return jax.jit(multi, donate_argnums=donate_argnums)


def _make_shard_map_step(
    model_cfg: NeatConfig,
    loss_cfg: LossConfig,
    optimizer,
    n_rays: int,
    img_width: int,
    mesh,
    axis: str,
    donate: bool,
    _raw: bool = False,
):
    """The shard_map pod step (see make_train_step docstring).

    Gradient exactness: after the forward's all_gathers, every shard
    computes the SAME global loss L on the full batch. Under shard_map's
    varying-mesh-axes autodiff, the scalar actually differentiated is the
    sum of the per-shard outputs (replicated params enter through an
    implicit pvary whose transpose is a psum; the all_gather transpose
    psum-scatters the identical per-shard cotangents) — i.e. grad(Σ_k L)
    = n_shards · grad(L), uniformly for sharded and replicated gradient
    paths. Dividing the per-shard loss by n_shards makes the implicit
    objective exactly L, so the returned (already shard-invariant) grads
    equal the single-program gradient to fp precision
    (tests/test_parallel.py asserts ≤1e-5 relative). Reported metrics are
    the unscaled global values.
    """
    from ..model.neat import draw_forward_noise
    from jax.sharding import PartitionSpec as P

    n_shards = mesh.devices.size
    if n_rays % n_shards != 0:
        raise ValueError(
            f"n_rays={n_rays} must divide over the {n_shards}-shard mesh"
        )
    if model_cfg.dual_batch or model_cfg.junction_eikonal:
        raise NotImplementedError(
            "dual_batch/junction_eikonal variants are GSPMD-only "
            "(see neat_forward shard_axis gate)"
        )

    def pod_body(params, inputs, ground_truth, noise, rng):
        def loss_fn(params):
            out = neat_forward(
                params, inputs, model_cfg, rng, training=True,
                noise=noise, shard_axis=axis,
            )
            gt_g = jax.tree_util.tree_map(
                lambda v: jax.lax.all_gather(v, axis, axis=0, tiled=True),
                ground_truth,
            )
            with jax.named_scope("loss"):
                losses = neat_loss(out, gt_g, loss_cfg)
            aux = dict(losses)
            aux["psnr"] = psnr_fn(out["rgb_values"], gt_g["rgb"])
            return losses["loss"] / n_shards, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        # Most grad leaves come back invariant (the implicit pvary of the
        # replicated params is transposed to a psum). The pallas custom-VJP
        # kernels bypass that transpose — their backward returns per-shard
        # partial grads still varying over the axis — so psum exactly the
        # leaves whose vma says so; the result matches the auto-psummed
        # scale (the /n_shards above compensates both uniformly).
        def _ensure_invariant(g):
            vma = getattr(jax.typeof(g), "vma", None) or frozenset()
            return jax.lax.psum(g, axis) if axis in vma else g

        grads = jax.tree_util.tree_map(_ensure_invariant, grads)
        # metrics are already shard-identical; pmean marks them invariant
        aux = jax.lax.pmean(aux, axis)
        return grads, aux

    def step(state: TrainState, scene: Dict[str, jnp.ndarray], rng) -> Tuple[TrainState, Dict]:
        r_batch, r_fwd = jax.random.split(jax.random.fold_in(rng, state.step))
        with jax.named_scope("batch_sample"):
            inputs, ground_truth = sample_batch(r_batch, scene, n_rays, img_width)
        noise = draw_forward_noise(r_fwd, n_rays, model_cfg)

        ray = P(axis)
        rep = P()
        input_specs = {
            "uv": ray, "uv_proj": ray,
            "intrinsics": rep, "pose": rep,
            "verts2d": rep, "verts_mask": rep,
        }
        gt_specs = {k: ray for k in ground_truth}
        noise_specs = {
            k: (rep if k == "z_extra_idx" else ray) for k in noise
        }
        grads, aux = jax.shard_map(
            pod_body,
            mesh=mesh,
            in_specs=(rep, input_specs, gt_specs, noise_specs, rep),
            out_specs=(rep, rep),
        )(state.params, inputs, ground_truth, noise, r_fwd)

        with jax.named_scope("adam"):
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, aux

    if _raw:
        return step
    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
