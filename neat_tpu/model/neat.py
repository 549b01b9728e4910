"""The NEAT model: VolSDF surface + attraction field + global junctions.

One pure function computes the whole per-step forward pass with static
shapes. Parity target: reference code/model/networks/neat_wfr_rend_a.py
(VolSDFNetwork.forward, :376-538) plus the model-variant family
(neat_wfr_rend.py non-detached line weights, neat_wfr_rend_b.py
view-independent attraction, neat_uni.py uniform sampler, model/network.py
vanilla VolSDF) expressed as config flags.

Shape/masking conventions (TPU-static redesign):
  * per-view HAWP junctions are padded to ``max_verts`` with ``verts_mask``;
  * junction proposals are padded to a static count with a mask (all line
    endpoints: 2R; +l3d points when use_l3d: 3R);
  * the per-step Hungarian/DBSCAN run on-device (assignment/ package) —
    the reference round-trips to scipy/sklearn on CPU mid-step
    (neat_wfr_rend_a.py:460,473).

Detach boundaries replicate the reference exactly (SURVEY §7.3.3): the
line integral uses stop_gradient(weights) (rend_a:410), 2D projection for
the uncalibrated branch uses stop_gradient(lines3d) (rend_a:439), and the
tangent-plane intersection parameter t is detached (rend_a:453).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import get_camera_params, project2d
from ..core.density import LaplaceDensityParams, laplace_density
from ..core.render import render_weights_from_density
from ..fields.mlp import (
    ImplicitNetConfig,
    RenderNetConfig,
    GlobalJunctionsConfig,
    init_implicit_net,
    implicit_sdf,
    implicit_sdf_feat_grad,
    implicit_gradient,
    init_render_net,
    render_forward,
    init_attraction_net,
    attraction_forward,
    init_global_junctions,
    global_junctions_forward,
)
from ..sampling.samplers import (
    ErrorBoundSamplerConfig,
    UniformSamplerConfig,
    error_bound_z_vals,
    uniform_z_vals,
)
from ..assignment.matching import masked_assignment
from ..assignment.clustering import dbscan_cluster_means

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NeatConfig:
    feature_vector_size: int = 256
    scene_bounding_sphere: float = 3.0
    white_bkgd: bool = False
    bg_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    implicit: ImplicitNetConfig = ImplicitNetConfig()
    rendering: RenderNetConfig = RenderNetConfig(multires_view=4)
    attraction: RenderNetConfig = RenderNetConfig(d_out=6, multires_view=0)
    junctions: GlobalJunctionsConfig = GlobalJunctionsConfig()
    sampler: ErrorBoundSamplerConfig = ErrorBoundSamplerConfig()

    density_beta_init: float = 0.1
    density_beta_min: float = 1e-4

    # variant flags (reference model files -> flags)
    model_variant: str = "neat"  # 'neat' | 'volsdf' (no wireframe head)
    sampler_kind: str = "error_bound"  # 'error_bound' | 'uniform' (neat_uni)
    detach_line_weights: bool = True  # rend_a: True; rend: False
    # wfr/wfr_a/simple family: one attraction evaluation at the detached
    # rendered surface point (neat_wfr.py:397-409) instead of the rend
    # family's per-sample weighted line integral
    attraction_at_surface: bool = False
    # wfr/simple eval branch (neat_wfr.py:469-474, neat_simple.py:359-363):
    # in eval mode, re-evaluate the attraction at the tangent-plane point
    # l3d with fresh detached implicit outputs, overriding lines3d/lines2d
    # and the 'sdf' output (lines2d_calib intentionally keeps the
    # surface-point segments — upstream leaves it stale). wfr_a has this
    # branch commented out (wfr_a:422-425), so it gets its own flag
    eval_attraction_at_l3d: bool = False
    # along-ray family (reference model/neat_along_ray.py:329-359): instead
    # of the weighted line integral, each endpoint track is re-sorted by
    # its camera distance and volume-rendered with weights from its own
    # (detached-input) SDF evaluation; emits the reference's per-ray
    # 'score' = mean of the two tracks' peak weights
    attraction_aggregation: str = "weighted"  # 'weighted' | 'endpoint_render'
    # neat_along_ray_v2.py:268,335-336: the endpoint SDF comes from a
    # SECOND ImplicitNetwork ('neat_sdf') trained only through this term
    endpoint_sdf_separate: bool = False
    # rend family projects detached lines3d into the uncalibrated 2D loss
    # (rend_a:439); the wfr_a/simple variants project it live (wfr_a:405,
    # simple:345) so their uncalibrated-only losses still carry gradient
    detach_lines2d: bool = True
    # two-pass training (reference neat_wfr_dual.py:351-502): RGB+eikonal
    # supervised on a uniformly-sampled pixel batch, wireframe/junction
    # terms on the attraction-support batch
    dual_batch: bool = False
    dbscan_enabled: bool = False
    # rend_c variant: concatenate the decoded global junctions into the
    # endpoint set before DBSCAN clustering (the only behavioral delta of
    # reference neat_wfr_rend_c.py:427-433 vs rend_a)
    dbscan_include_global: bool = False
    use_median: bool = True
    use_l3d: bool = False
    junction_eikonal: bool = False

    # static padding for per-view HAWP junctions
    max_verts: int = 512
    assignment_method: str = "auction"  # 'auction' | 'callback'
    # reduced-precision MXU compute for the sampler's no-grad proposal SDF
    # evals ('bfloat16' | 'float32'); z-selection tolerates the ~1e-3
    # relative error and runs 2.7x faster. 'float32' restores strict parity.
    sampler_compute_dtype: str = "bfloat16"
    # reduced-precision layer chains for the main differentiated field
    # evals (implicit+grad, rendering, attraction on the R*S point batch).
    # The f32 step is HBM-bandwidth-bound (RESULTS.md roofline: 32.8 GB
    # moved/step = 100% of v5e peak); bf16 activations halve that traffic.
    # PE, sphere clamp, density/weights, losses, eikonal branch, and the
    # tiny surface-point eval stay f32. 'float32' restores strict parity.
    field_compute_dtype: str = "float32"
    # Pallas fused-MLP kernel for the sampler's SDF evals (VMEM-resident
    # layer chain, ops/fused_sdf.py). Only valid for the canonical
    # architecture and TPU backends; enable via the runner/bench, which
    # check supports_fused_sdf + backend.
    use_pallas_sampler: bool = False
    # Pallas fused main-pass kernel (implicit+grad+render+attraction with
    # a custom VJP, ops/fused_field.py): the 256-wide feature activations
    # never touch HBM. Canonical architecture + TPU backends only; enable
    # via runner/bench after checking supports_fused_field. Runs at
    # field_compute_dtype precision with f32 accumulation.
    use_pallas_field: bool = False
    # backward strategy for the fused field kernel: 'recompute' re-derives
    # the forward inside the backward kernel (jax.vjp-traced);
    # 'stash' reads residuals the forward kernel wrote (hand-derived
    # adjoint, ops/fused_field_stash.py) — no recompute, compute-dtype
    # backward matmuls
    pallas_field_backward: str = "recompute"

    @staticmethod
    def for_abc() -> "NeatConfig":
        """Defaults of confs/abc-neat-a.conf."""
        return NeatConfig(
            junctions=GlobalJunctionsConfig(num_junctions=64),
            dbscan_enabled=False,
            use_l3d=False,
            use_median=True,
        )

    @staticmethod
    def for_dtu() -> "NeatConfig":
        """Defaults of confs/dtu.conf."""
        return NeatConfig(
            scene_bounding_sphere=3.0,
            implicit=ImplicitNetConfig(bias=0.6, sphere_scale=20.0),
            junctions=GlobalJunctionsConfig(num_junctions=1024),
            dbscan_enabled=True,
            # dtu.conf: fixed 10 px assignment gate, not the per-step median
            use_median=False,
        )


def offline_eval_config(cfg: NeatConfig) -> NeatConfig:
    """Exact-f32 variant for offline rendering / finalization: the
    bf16/pallas proposal path is a training-throughput trade-off that shows
    as banding in full-image renders."""
    return dataclasses.replace(
        cfg,
        sampler_compute_dtype="float32",
        field_compute_dtype="float32",
        use_pallas_sampler=False,
        use_pallas_field=False,
    )


def init_neat(key, cfg: NeatConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params: Params = {
        "implicit": init_implicit_net(k1, cfg.implicit),
        "rendering": init_render_net(k2, cfg.rendering),
        "density": LaplaceDensityParams.init(cfg.density_beta_init),
    }
    if cfg.model_variant == "neat":
        params["attraction"] = init_attraction_net(k3, cfg.attraction)
        params["junctions"] = init_global_junctions(k4, cfg.junctions)
        if cfg.endpoint_sdf_separate:
            # along_ray_v2:268: a second ImplicitNetwork built from the
            # same conf block, trained only through the endpoint term
            params["neat_sdf"] = init_implicit_net(
                jax.random.fold_in(k1, 1), cfg.implicit
            )
    return params


def _sample_z(
    rng, ray_dirs, cam_loc, params, cfg: NeatConfig, training: bool, noise=None
):
    if cfg.sampler_kind == "error_bound":
        if cfg.use_pallas_sampler:
            from ..ops.fused_sdf import fused_sdf_eval

            sdf_fn = lambda p: fused_sdf_eval(params["implicit"], p, cfg.implicit)
        else:
            cdtype = (
                jnp.bfloat16 if cfg.sampler_compute_dtype == "bfloat16" else None
            )
            sdf_fn = lambda p: implicit_sdf(
                params["implicit"], p, cfg.implicit, compute_dtype=cdtype
            )[..., 0]
        return error_bound_z_vals(
            rng,
            ray_dirs,
            cam_loc,
            sdf_fn,
            params["density"],
            cfg.sampler,
            training,
            beta_min=cfg.density_beta_min,
            noise=noise,
        )
    elif cfg.sampler_kind == "uniform":
        ucfg = UniformSamplerConfig(
            scene_bounding_sphere=cfg.scene_bounding_sphere,
            near=cfg.sampler.near,
            n_samples=cfg.sampler.n_samples,
        )
        noise = noise or {}
        z = uniform_z_vals(
            rng, ray_dirs, cam_loc, ucfg, training, t_rand=noise.get("strat")
        )
        eik_idx = noise.get("eik_z_idx")
        if eik_idx is None:
            eik_idx = jax.random.randint(
                jax.random.fold_in(rng, 1), (z.shape[0], 1), 0, z.shape[-1]
            )
        z_eik = jnp.take_along_axis(z, eik_idx, axis=-1)
        return jax.lax.stop_gradient(z), jax.lax.stop_gradient(z_eik)
    raise ValueError(cfg.sampler_kind)


def draw_forward_noise(rng, n_rays: int, cfg: NeatConfig) -> Dict[str, jnp.ndarray]:
    """Pre-draw every random array a training-mode ``neat_forward`` consumes,
    with the exact key-split sequence the internal draws use — so
    ``neat_forward(rng=k)`` and ``neat_forward(rng=k,
    noise=draw_forward_noise(k, R, cfg))`` are bit-identical.

    The shard_map pod step (train/step.py) calls this OUTSIDE the shard body
    at global batch shape and shards the per-ray arrays over the mesh, so
    per-shard execution consumes exactly its rows of the one global stream.
    Per-ray arrays: strat, final_u, eik_z_idx, eik_uniform; ray-shared:
    z_extra_idx (replicated)."""
    from ..sampling.samplers import total_final_samples, total_proposal_samples

    r_sample, r_eik_pts = jax.random.split(rng)
    bs = cfg.scene_bounding_sphere
    noise: Dict[str, jnp.ndarray] = {
        "eik_uniform": jax.random.uniform(
            r_eik_pts, (n_rays, 3), minval=-bs, maxval=bs, dtype=jnp.float32
        )
    }
    if cfg.sampler_kind == "error_bound":
        s = cfg.sampler
        r_uni, r_final, r_perm, r_eik = jax.random.split(r_sample, 4)
        noise["strat"] = jax.random.uniform(
            r_uni, (n_rays, s.n_samples_eval), dtype=jnp.float32
        )
        noise["final_u"] = jax.random.uniform(r_final, (n_rays, s.n_samples))
        if s.n_samples_extra > 0:
            noise["z_extra_idx"] = jax.random.permutation(
                r_perm, total_proposal_samples(s)
            )[: s.n_samples_extra]
        noise["eik_z_idx"] = jax.random.randint(
            r_eik, (n_rays, 1), 0, total_final_samples(s)
        )
    elif cfg.sampler_kind == "uniform":
        noise["strat"] = jax.random.uniform(
            r_sample, (n_rays, cfg.sampler.n_samples), dtype=jnp.float32
        )
        noise["eik_z_idx"] = jax.random.randint(
            jax.random.fold_in(r_sample, 1), (n_rays, 1), 0, cfg.sampler.n_samples
        )
    else:
        raise ValueError(cfg.sampler_kind)
    return noise


def _masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """torch-style lower median over the masked entries (returns a large
    default when nothing is valid, mirroring the reference nan fallback of
    10)."""
    big = jnp.asarray(1e30, values.dtype)
    vals = jnp.where(mask, values, big)
    order = jnp.sort(vals)
    n_valid = jnp.sum(mask)
    idx = jnp.maximum((n_valid - 1) // 2, 0)
    med = order[idx]
    return jnp.where(n_valid > 0, med, jnp.asarray(10.0, values.dtype))


def neat_forward(
    params: Params,
    inputs: Dict[str, jnp.ndarray],
    cfg: NeatConfig,
    rng,
    training: bool = True,
    noise: Optional[Dict[str, jnp.ndarray]] = None,
    shard_axis: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """Full NEAT forward pass.

    inputs:
      uv          (R, 2)   sampled pixel coords (x, y)
      uv_proj     (R, 2)   attraction projection points for the same pixels
      intrinsics  (4, 4) or (3, 3)
      pose        (4, 4)   cam2world
      verts2d     (V, 2)   HAWP junctions, padded      (training only)
      verts_mask  (V,)     validity of verts2d         (training only)

    Returns the reference's output dict keys plus `_mask` companions for
    padded entries.

    ``noise`` optionally injects all random draws (draw_forward_noise).
    ``shard_axis``: when called inside jax.shard_map with the ray batch
    split over that mesh axis, the per-ray segment (sampler, field evals,
    volume rendering, attraction — the pallas-capable hot path) runs on the
    local shard, then every per-ray tensor is all_gather'ed so the
    junction-proposal block and the downstream loss see the full global
    batch, exactly as the single-program GSPMD step does. Cameras and
    params must be passed replicated, per-ray inputs/noise sharded.
    """
    if shard_axis is not None:
        if cfg.junction_eikonal or cfg.dual_batch:
            raise NotImplementedError(
                "shard_axis does not support junction_eikonal/dual_batch "
                "(their loss terms mix replicated and sharded gradient "
                "paths inside one reduction); use the GSPMD step for "
                "these variants"
            )
        if noise is None and training:
            raise ValueError(
                "shard_axis requires pre-drawn noise (draw_forward_noise "
                "at global batch shape, sharded over rays) — internal "
                "draws would be per-shard streams"
            )
    r_sample, r_eik = jax.random.split(rng)
    uv = inputs["uv"]
    pose = inputs["pose"]
    intrinsics = inputs["intrinsics"]
    n_rays = uv.shape[0]

    ray_dirs, cam_loc = get_camera_params(uv[None], pose[None], intrinsics[None])
    ray_dirs = ray_dirs[0]  # (R, 3)
    cam_loc = jnp.broadcast_to(cam_loc, (n_rays, 3))

    # named scopes mark the phase boundaries in profiles and in the HLO
    # op_name metadata (tools/bytes_accounting.py buckets by them; their
    # backward ops inherit the scope under transpose(...))
    with jax.named_scope("sampler"):
        z_vals, z_eik = _sample_z(
            r_sample, ray_dirs, cam_loc, params, cfg, training, noise=noise
        )
    n_samples = z_vals.shape[-1]

    rays_d = z_vals[..., None] * ray_dirs[:, None, :]  # (R, S, 3)
    depth_ratio = jnp.linalg.norm(rays_d, axis=-1)
    points = cam_loc[:, None, :] + rays_d
    points_flat = points.reshape(-1, 3)
    dirs_flat = jnp.broadcast_to(ray_dirs[:, None, :], points.shape).reshape(-1, 3)

    fdtype = (
        jnp.bfloat16 if cfg.field_compute_dtype == "bfloat16" else None
    )
    use_fused_field = cfg.use_pallas_field and cfg.model_variant == "neat"
    lines3d_flat = None
    if use_fused_field:
        from ..ops.fused_field import (
            MAX_FUSED_FIELD_BWD_POINTS,
            fused_field_eval,
            supports_fused_field,
        )

        if training and points_flat.shape[0] > MAX_FUSED_FIELD_BWD_POINTS:
            raise ValueError(
                f"the fused pallas field backward kernel hard-faults the "
                f"TPU worker above {MAX_FUSED_FIELD_BWD_POINTS} points "
                f"(measured on v5e; docs/batch_frontier_r5.md) and this "
                f"step needs {points_flat.shape[0]} "
                f"({n_rays} rays x {n_samples} samples); lower num_pixels "
                f"to <= {MAX_FUSED_FIELD_BWD_POINTS // n_samples} or set "
                f"use_pallas_field=False (forward-only inference at this "
                f"size is fine)"
            )
        if not supports_fused_field(cfg.implicit, cfg.rendering, cfg.attraction):
            raise ValueError(
                "use_pallas_field=True but the network architecture is not "
                "the canonical 8x256 SDF + 4x256 idr heads the fused kernel "
                "implements (e.g. inside_out, nerf-mode heads, non-256 "
                "widths); disable use_pallas_field for this config"
            )

        if cfg.pallas_field_backward == "stash":
            from ..ops.fused_field_stash import fused_field_eval_stash as _eval
        else:
            _eval = fused_field_eval
        with jax.named_scope("field_main"):
            sdf, grads, rgb_flat, lines3d_flat = _eval(
                params,
                points_flat,
                dirs_flat,
                cfg.implicit,
                cfg.rendering,
                compute_dtype=cfg.field_compute_dtype,
            )
    else:
        with jax.named_scope("field_main"):
            sdf, feats, grads = implicit_sdf_feat_grad(
                params["implicit"], points_flat, cfg.implicit, compute_dtype=fdtype
            )
            rgb_flat = render_forward(
                params["rendering"], points_flat, grads, dirs_flat, feats,
                cfg.rendering, compute_dtype=fdtype,
            )
    rgb = rgb_flat.reshape(n_rays, n_samples, 3)

    with jax.named_scope("volume_render"):
        density = laplace_density(
            sdf.reshape(n_rays, n_samples), params["density"],
            beta_min=cfg.density_beta_min,
        )
        weights = render_weights_from_density(z_vals, density)

    rgb_values = jnp.sum(weights[..., None] * rgb, axis=1)
    if cfg.white_bkgd:
        acc = jnp.sum(weights, axis=-1)
        rgb_values = rgb_values + (1.0 - acc[..., None]) * jnp.asarray(cfg.bg_color)

    depth = jnp.sum(weights * depth_ratio, axis=-1)
    out: Dict[str, jnp.ndarray] = {
        "rgb_values": rgb_values,
        "depth": depth,
        "xyz": jnp.sum(points * weights[..., None], axis=1),
        "z_vals": z_vals,
        "weights": weights,
    }

    if not training:
        normals = jax.lax.stop_gradient(grads)
        normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
        normals = normals.reshape(n_rays, n_samples, 3)
        out["normal_map"] = jnp.sum(weights[..., None] * normals, axis=1)

    gather = (
        (lambda x: jax.lax.all_gather(x, shard_axis, axis=0, tiled=True))
        if shard_axis is not None
        else (lambda x: x)
    )

    if cfg.model_variant != "neat":
        # vanilla VolSDF: eikonal points and done
        out["sdf"] = jax.lax.stop_gradient(sdf.reshape(n_rays, n_samples))
        if training:
            out["grad_theta"] = _eikonal_gradients(
                params, cfg, r_eik, n_rays, cam_loc, ray_dirs, z_eik, None,
                eik_uniform=None if noise is None else noise["eik_uniform"],
            )
        # shard_map mode: globalize the per-ray outputs for the loss
        # (grad_theta's uniform/near block order differs from the global
        # layout but the eikonal mean is permutation-invariant)
        return {k: gather(v) for k, v in out.items()}

    # surface point and a second field evaluation there
    with jax.named_scope("surface_eval"):
        points3d = jnp.sum(weights[..., None] * points, axis=1)  # (R, 3)
        points3d_sdf, points3d_feats, points_gradients = implicit_sdf_feat_grad(
            params["implicit"], points3d, cfg.implicit
        )

    # ----- attraction field ------------------------------------------------
    with jax.named_scope("attraction"):
        if cfg.attraction_at_surface:
            # wfr/wfr_a/simple family: ONE attraction evaluation at the
            # detached rendered surface point with its detached fresh
            # implicit outputs (neat_wfr.py:397-409, neat_simple.py:343) —
            # not the rend family's per-sample weighted line integral
            lines3d = attraction_forward(
                params["attraction"],
                jax.lax.stop_gradient(points3d),
                jax.lax.stop_gradient(points_gradients),
                jax.lax.stop_gradient(ray_dirs),
                jax.lax.stop_gradient(points3d_feats),
                cfg.attraction,
                compute_dtype=fdtype,
            ).reshape(n_rays, 2, 3)
        else:
            if use_fused_field:
                lines3d = lines3d_flat.reshape(n_rays, n_samples, 2, 3)
            else:
                lines3d = attraction_forward(
                    params["attraction"], points_flat, grads, dirs_flat, feats,
                    cfg.attraction, compute_dtype=fdtype,
                ).reshape(n_rays, n_samples, 2, 3)
            if cfg.attraction_aggregation == "endpoint_render":
                # along-ray family (neat_along_ray.py:329-359): re-sort
                # each endpoint track by its camera distance and
                # volume-render it with its own SDF weights. The SDF
                # input is detached (no attraction gradient through it)
                # but the evaluation still trains the scoring net; v2
                # scores with the separate 'neat_sdf' network. Both
                # tracks batch as one (R*2, S) MLP/render pass.
                sdf_params = (
                    params["neat_sdf"]
                    if cfg.endpoint_sdf_separate
                    else params["implicit"]
                )
                from ..core.render import volume_rendering_weights

                ek = lines3d.transpose(0, 2, 1, 3).reshape(
                    2 * n_rays, n_samples, 3
                )
                sdf_e = implicit_sdf(
                    sdf_params,
                    jax.lax.stop_gradient(ek.reshape(-1, 3)),
                    cfg.implicit,
                )[..., 0].reshape(2 * n_rays, n_samples)
                cam2 = jnp.repeat(cam_loc, 2, axis=0)
                z_e = jax.lax.stop_gradient(
                    jnp.linalg.norm(ek - cam2[:, None, :], axis=-1)
                )
                order = jnp.argsort(z_e, axis=-1)
                w_e = volume_rendering_weights(
                    jnp.take_along_axis(z_e, order, axis=-1),
                    jnp.take_along_axis(sdf_e, order, axis=-1),
                    params["density"],
                    beta_min=cfg.density_beta_min,
                )
                ek_s = jnp.take_along_axis(ek, order[..., None], axis=1)
                lines3d = jnp.sum(w_e[..., None] * ek_s, axis=1).reshape(
                    n_rays, 2, 3
                )
                # neat_along_ray.py:375: per-ray confidence score
                out["score"] = jnp.mean(
                    jnp.max(w_e, axis=-1).reshape(n_rays, 2), axis=-1
                )
            else:
                w_for_lines = (
                    jax.lax.stop_gradient(weights)
                    if cfg.detach_line_weights
                    else weights
                )
                lines3d = jnp.sum(
                    w_for_lines[..., None, None] * lines3d, axis=1
                )  # (R, 2, 3)

    w2c = jnp.linalg.inv(pose)
    rot = w2c[:3, :3]
    trans = w2c[:3, 3]
    k3 = intrinsics[:3, :3]
    eye3 = jnp.eye(3, dtype=k3.dtype)

    lines2d = project2d(
        k3,
        rot,
        trans,
        jax.lax.stop_gradient(lines3d) if cfg.detach_lines2d else lines3d,
    )
    lines2d_calib = project2d(eye3, rot, trans, lines3d)

    # tangent-plane intersection of the attraction-support ray (rend_a:444-454)
    line_ray_d, line_ray_o = get_camera_params(
        inputs["uv_proj"][None], pose[None], intrinsics[None]
    )
    line_ray_d = line_ray_d.reshape(-1, 3)
    line_ray_o = jnp.broadcast_to(line_ray_o, (n_rays, 3))
    denominator = jnp.sum(line_ray_d * points_gradients, axis=-1)
    denom_eps = jnp.where(denominator >= 0, 1e-6, -1e-6)
    t = jnp.sum((points3d - line_ray_o) * points_gradients, axis=-1) / (
        denominator + denom_eps
    )
    t = jax.lax.stop_gradient(t)
    l3d = line_ray_o + line_ray_d * t[:, None]

    e1, e2 = lines3d[:, 0], lines3d[:, 1]
    # guard degenerate segments (e1 == e2 early in training): 0/0 would
    # put NaNs through the median gate; matches the loss-side guard
    l3d_score = jax.lax.stop_gradient(
        jnp.linalg.norm(jnp.cross(l3d - e1, l3d - e2), axis=-1)
        / jnp.maximum(jnp.linalg.norm(e1 - e2, axis=-1), 1e-6)
    )

    if cfg.eval_attraction_at_l3d and not training:
        # wfr/simple eval branch: attraction re-evaluated at l3d with fresh
        # detached implicit outputs; the 'sdf' output follows (neat_wfr.py:
        # 469-474 rebinds points3d_sdf), lines2d_calib stays surface-based
        l3d_stop = jax.lax.stop_gradient(l3d)
        points3d_sdf, l3d_feats, l3d_grads = implicit_sdf_feat_grad(
            params["implicit"], l3d_stop, cfg.implicit
        )
        lines3d = attraction_forward(
            params["attraction"],
            l3d_stop,
            jax.lax.stop_gradient(l3d_grads),
            jax.lax.stop_gradient(ray_dirs),
            jax.lax.stop_gradient(l3d_feats),
            cfg.attraction,
            compute_dtype=fdtype,
        ).reshape(n_rays, 2, 3)
        lines2d = project2d(k3, rot, trans, lines3d)

    if shard_axis is not None:
        # Globalize every per-ray tensor: the junction-proposal block below
        # (median gating, assignment against the per-view HAWP junctions)
        # and the loss reductions are batch-global operations; gathering
        # here makes them run on the full batch, replicated across shards —
        # numerically identical to the GSPMD step. Gradients flow through
        # all_gather back to each shard's own rows (its transpose is a
        # slice), so psum'd parameter grads are exact.
        out = {k: gather(v) for k, v in out.items()}
        lines3d = gather(lines3d)
        lines2d = gather(lines2d)
        lines2d_calib = gather(lines2d_calib)
        l3d = gather(l3d)
        l3d_score = gather(l3d_score)
        points3d = gather(points3d)
        points3d_sdf = gather(points3d_sdf)

    out.update(
        {
            "l3d": l3d,
            "l3d_score": l3d_score,
            "points3d": points3d,
            "lines3d": lines3d,
            "lines2d": lines2d,
            "lines2d_calib": lines2d_calib,
            "sdf": points3d_sdf.flatten(),
            "K": k3,
        }
    )

    junctions3d_global = global_junctions_forward(params["junctions"], cfg.junctions)

    if training:
        # ----- junction proposals (padded) --------------------------------
        endpoints = jax.lax.stop_gradient(lines3d).reshape(-1, 3)  # (2R, 3)
        if cfg.dbscan_enabled:
            cluster_input = endpoints
            if cfg.dbscan_include_global:
                # rend_c: global junctions join the endpoint cloud before
                # clustering (neat_wfr_rend_c.py:427-433)
                cluster_input = jnp.concatenate(
                    [endpoints, jax.lax.stop_gradient(junctions3d_global)], axis=0
                )
            proposals, prop_mask = dbscan_cluster_means(
                cluster_input, eps=0.01, min_samples=2
            )
        elif cfg.use_l3d:
            med = jnp.maximum(_masked_median(l3d_score, jnp.ones_like(l3d_score, bool)), 0.01)
            sel = l3d_score < med  # (R,)
            ep_mask = jnp.repeat(sel, 2)
            proposals = jnp.concatenate([endpoints, l3d], axis=0)  # (3R, 3)
            prop_mask = jnp.concatenate([ep_mask, sel], axis=0)
        else:
            proposals = endpoints
            prop_mask = jnp.ones((endpoints.shape[0],), dtype=bool)

        with jax.named_scope("junction_match"):
            junctions2d = project2d(k3, rot, trans, proposals)
            junctions2d_calib = project2d(eye3, rot, trans, proposals)

            verts2d = inputs["verts2d"]
            verts_mask = inputs["verts_mask"]
            jcost = jnp.sqrt(
                jnp.sum((junctions2d[None] - verts2d[:, None]) ** 2, axis=-1) + 1e-12
            )  # (V, P)
            col_idx, assign_valid = masked_assignment(
                jcost, verts_mask, prop_mask, method=cfg.assignment_method
            )
            assigned_cost = jnp.take_along_axis(
                jcost, col_idx[:, None], axis=1
            )[:, 0]  # (V,)

        if cfg.use_median:
            median = _masked_median(
                jax.lax.stop_gradient(assigned_cost), assign_valid
            )
            is_correct = assigned_cost < median
            out["median"] = median
        else:
            is_correct = assigned_cost < 10.0
        keep = assign_valid & is_correct  # (V,)

        out["j3d_local"] = proposals[col_idx]  # (V, 3)
        out["j2d_local"] = junctions2d[col_idx]
        out["j2d_local_calib"] = junctions2d_calib[col_idx]
        out["j_local_mask"] = keep
        out["j3d_global"] = junctions3d_global
        out["j2d_global"] = project2d(k3, rot, trans, junctions3d_global)
        out["j2d_global_calib"] = project2d(eye3, rot, trans, junctions3d_global)

        # ----- eikonal sample points --------------------------------------
        with jax.named_scope("eikonal"):
            # computed on the LOCAL rays then gathered; the per-shard
            # [uniform | near] block order permutes the global layout, but
            # the eikonal loss is a mean over all points
            out["grad_theta"] = gather(
                _eikonal_gradients(
                    params,
                    cfg,
                    r_eik,
                    n_rays,
                    cam_loc,
                    ray_dirs,
                    z_eik,
                    jax.lax.stop_gradient(junctions3d_global)
                    if cfg.junction_eikonal else None,
                    eik_uniform=None if noise is None else noise["eik_uniform"],
                )
            )

    return out


def _eikonal_gradients(
    params, cfg: NeatConfig, rng, n_rays, cam_loc, ray_dirs, z_eik, extra_points,
    eik_uniform=None,
):
    """Raw SDF gradients at uniform + near-surface (+ optional junction)
    points (reference neat_wfr_rend_a.py:515-527)."""
    bs = cfg.scene_bounding_sphere
    if eik_uniform is None:
        eik_uniform = jax.random.uniform(
            rng, (n_rays, 3), minval=-bs, maxval=bs, dtype=cam_loc.dtype
        )
    eik_near = (cam_loc[:, None, :] + z_eik[..., None] * ray_dirs[:, None, :]).reshape(
        -1, 3
    )
    pts = jnp.concatenate([eik_uniform, eik_near], axis=0)
    if extra_points is not None:
        pts = jnp.concatenate([pts, extra_points], axis=0)
    return implicit_gradient(params["implicit"], pts, cfg.implicit)


def render_rgb(
    params: Params, inputs: Dict[str, jnp.ndarray], cfg: NeatConfig, rng
) -> jnp.ndarray:
    """Eval-mode RGB-only rendering (reference render_rgb, rend_a:344-375)."""
    out = neat_forward(params, inputs, cfg, rng, training=False)
    return out["rgb_values"]
