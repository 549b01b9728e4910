"""Executed numerical parity against the reference implementation itself.

The single strongest validation of every line-by-line parity claim in this
repo: load the SAME weights into the reference's own torch modules
(code/model/networks/neat_wfr_rend_a.py) via interop/torch_export +
load_state_dict(strict=True), feed IDENTICAL inputs, and diff

  * the field forwards (SDF/feature/gradient, rendering, attraction),
  * ErrorBoundSampler.get_z_vals vs error_bound_z_vals (ray_sampler.py:130-283),
  * the full eval-mode forward dict (rend_a:376-538),
  * the full train-mode forward dict incl. the junction branch, with both
    frameworks' five random draw sites routed through one shared stream,
  * the loss dict (loss_wfr.py:47-139),
  * and the parameter GRADIENTS of the total loss — the only executable
    check of the detach boundaries (rend_a:410,439,453; SURVEY §7.3.3).

Everything runs in float64 (torch .double() / jax enable_x64) so real
mismatches are not masked by f32 reassociation noise; tolerances are 1e-9
for forwards and 1e-7 for gradients.

Slow tier: CPU torch + eager jax at 64 rays takes ~1-2 min.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference/code"):
    pytest.skip("reference checkout not present", allow_module_level=True)

import contextlib

import jax
import jax.numpy as jnp

from neat_tpu.interop.reference_runtime import (
    DeterministicDraws,
    WireframeStub,
    build_reference_loss,
    build_reference_model,
    patch_jax_rng,
    patch_torch_rng,
)
from neat_tpu.interop.torch_export import params_to_reference_state
from neat_tpu.model.loss import LossConfig, neat_loss
from neat_tpu.model.neat import NeatConfig, init_neat, neat_forward

pytestmark = pytest.mark.slow

CONF = os.path.join(os.path.dirname(__file__), "..", "confs", "abc-neat-a.conf")
N_RAYS = 64
N_VERTS = 24


def _f64(tree):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), tree
    )


def _wiggle(params, scale=24.0, seed=7):
    """Perturb the SDF net's hidden layers so the surface is non-trivial and
    the error-bounded sampler stays unconverged for all 5 iterations (the
    all-iterations regime is the one whose z-structure our fixed-trip-count
    redesign reproduces exactly)."""
    rs = np.random.RandomState(seed)
    imp = dict(params["implicit"])
    for name in ("lin1", "lin2", "lin3", "lin5", "lin6"):
        lin = dict(imp[name])
        lin["v"] = lin["v"] + jnp.asarray(
            rs.normal(0.0, scale / 256.0, np.asarray(lin["v"]).shape)
        )
        imp[name] = lin
    out = dict(params)
    out["implicit"] = imp
    return out


class Env:
    """Shared f64 setup: same weights in both frameworks."""

    def __init__(self):
        self.x64 = jax.enable_x64(True)
        self.x64.__enter__()
        self._torch_default = torch.get_default_dtype()
        # everything double: torch.rand/empty/eye inside the reference
        # forward must produce f64 or the .double() weights reject them
        torch.set_default_dtype(torch.float64)
        self.cfg = NeatConfig.for_abc()
        # strict-parity mode: the bf16 proposal path is a documented
        # throughput trade-off, not the parity target
        import dataclasses

        self.cfg = dataclasses.replace(
            self.cfg,
            sampler_compute_dtype="float32",
            assignment_method="callback",
            # a trained-net-like beta: keeps the sampler's error bound above
            # eps so the reference runs all 5 iterations (the regime whose
            # z-structure the fixed-trip-count redesign reproduces exactly)
            density_beta_init=2e-3,
        )
        params = init_neat(jax.random.PRNGKey(0), self.cfg)
        params = _wiggle(params)
        self.params = _f64(params)

        self.ref = build_reference_model(CONF)
        state = params_to_reference_state(self.params, self.cfg, dtype=np.float64)
        res = self.ref.load_state_dict(state, strict=True)
        assert not res.missing_keys and not res.unexpected_keys
        self.ref.double()

        # camera: 512x512, looking at the origin from z=2.5
        k = np.eye(4)
        k[0, 0] = k[1, 1] = 400.0
        k[0, 2] = k[1, 2] = 256.0
        pose = np.eye(4)
        pose[:3, :3] = np.diag([1.0, -1.0, -1.0])  # look down -z -> +z world
        pose[:3, 3] = [0.0, 0.0, 2.5]
        self.intrinsics = k
        self.pose = pose

        rs = np.random.RandomState(3)
        self.uv = rs.uniform(96, 416, size=(N_RAYS, 2))
        self.uv_proj = self.uv + rs.uniform(-4, 4, size=(N_RAYS, 2))
        self.verts2d = rs.uniform(96, 416, size=(N_VERTS, 2))
        self.rgb_gt = rs.uniform(0, 1, size=(N_RAYS, 3))
        lines = rs.uniform(96, 416, size=(N_RAYS, 4))
        score = rs.uniform(0.5, 1.0, size=(N_RAYS, 1))
        self.lines2d_gt = np.concatenate([lines, score], axis=1)

    def close(self):
        torch.set_default_dtype(self._torch_default)
        self.x64.__exit__(None, None, None)

    # ---- input builders ----------------------------------------------------

    def torch_inputs(self):
        t = lambda a: torch.as_tensor(np.asarray(a, np.float64))
        return {
            "uv": t(self.uv)[None],
            "uv_proj": t(self.uv_proj)[None],
            "pose": t(self.pose)[None],
            "intrinsics": t(self.intrinsics)[None],
            "wireframe": [WireframeStub(self.verts2d)],
        }

    def jax_inputs(self):
        j = lambda a: jnp.asarray(a, jnp.float64)
        return {
            "uv": j(self.uv),
            "uv_proj": j(self.uv_proj),
            "pose": j(self.pose),
            "intrinsics": j(self.intrinsics),
            "verts2d": j(self.verts2d),
            "verts_mask": jnp.ones((N_VERTS,), bool),
        }

    def torch_gt(self):
        t = lambda a: torch.as_tensor(np.asarray(a, np.float64))
        return {"rgb": t(self.rgb_gt)[None], "lines2d": t(self.lines2d_gt)[None]}

    def jax_gt(self):
        return {
            "rgb": jnp.asarray(self.rgb_gt, jnp.float64),
            "lines2d": jnp.asarray(self.lines2d_gt, jnp.float64),
        }


@pytest.fixture(scope="module")
def env():
    e = Env()
    yield e
    e.close()


@contextlib.contextmanager
def _pin_cdf_boundary():
    """Neutralize the u=1.0 inverse-CDF knife edge for exact comparison.

    Each refine iteration (and the eval-mode final draw) inverts the CDF at
    u = linspace(0, 1, N) whose last entry is exactly 1.0, while cdf[-1]
    lands within ±1 ulp of 1.0 — on a side that depends on the summation
    ORDER (torch cumsum is sequential; XLA's is a parallel scan). Whether
    u=1.0 selects the last bin or interpolates the second-to-last is
    therefore a floating-point coin flip between the two frameworks, always
    in the far-z tail (bins[-1] = far) where ray weights ~ 0. Clamping u to
    1 - 1e-9 for INDEX SELECTION ONLY, identically on both sides, makes the
    branch deterministic without touching any other sample.
    """
    # Scale every linspace(0, 1, .) by (1 - 1e-12) on BOTH sides: u's last
    # entry moves off the knife edge (1e-12 dominates the ~1e-13 worst-case
    # cumsum drift), both frameworks see bit-identical u, and the only other
    # affected tensor (the uniform-sampler's t_vals) shifts z by <= 6e-12 —
    # symmetrically. No asymmetric residue.
    orig_tl = torch.linspace
    orig_jl = jnp.linspace

    def tl(start, end, steps=None, **kw):
        out = orig_tl(start, end, steps=steps, **kw)
        if float(start) == 0.0 and float(end) == 1.0:
            out = out * (1.0 - 1e-12)
        return out

    def jl(start, stop, num=50, **kw):
        out = orig_jl(start, stop, num, **kw)
        if float(start) == 0.0 and float(stop) == 1.0:
            out = out * (1.0 - 1e-12)
        return out

    torch.linspace = tl
    jnp.linspace = jl
    try:
        yield
    finally:
        torch.linspace = orig_tl
        jnp.linspace = orig_jl


def _assert_close(name, ours, ref, atol=1e-9, rtol=1e-8):
    ours = np.asarray(ours, np.float64)
    ref = (
        ref.detach().cpu().numpy().astype(np.float64)
        if isinstance(ref, torch.Tensor)
        else np.asarray(ref, np.float64)
    )
    assert ours.shape == ref.shape, f"{name}: shape {ours.shape} vs {ref.shape}"
    err = np.max(np.abs(ours - ref)) if ours.size else 0.0
    ok = np.allclose(ours, ref, atol=atol, rtol=rtol)
    assert ok, f"{name}: max |diff| = {err:.3e} (atol={atol}, rtol={rtol})"
    return err


# ---------------------------------------------------------------------------
# 1. field-level forwards
# ---------------------------------------------------------------------------


def test_field_forwards(env):
    from neat_tpu.fields.mlp import (
        attraction_forward,
        implicit_gradient,
        implicit_sdf_feat_grad,
        render_forward,
    )

    rs = np.random.RandomState(11)
    pts = rs.uniform(-1.2, 1.2, size=(257, 3))
    dirs = rs.normal(size=(257, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    jp = jnp.asarray(pts)
    jd = jnp.asarray(dirs)
    sdf, feats, grads = implicit_sdf_feat_grad(
        env.params["implicit"], jp, env.cfg.implicit
    )
    rgb = render_forward(
        env.params["rendering"], jp, grads, jd, feats, env.cfg.rendering
    )
    lines = attraction_forward(
        env.params["attraction"], jp, grads, jd, feats, env.cfg.attraction
    )
    eik = implicit_gradient(env.params["implicit"], jp, env.cfg.implicit)

    tp = torch.as_tensor(pts)
    td = torch.as_tensor(dirs)
    rsdf, rfeat, rgrad = env.ref.implicit_network.get_outputs(tp.clone())
    rrgb = env.ref.rendering_network(tp, rgrad, td, rfeat)
    rlines = env.ref.attraction_network(tp, rgrad, td, rfeat)
    reik = env.ref.implicit_network.gradient(tp.clone())

    _assert_close("sdf", sdf, rsdf)
    _assert_close("features", feats, rfeat)
    _assert_close("sdf_gradient", grads, rgrad)
    _assert_close("rgb", rgb, rrgb)
    _assert_close("attraction_lines", lines.reshape(-1, 2, 3), rlines)
    _assert_close("eikonal_gradient", eik, reik)


def test_global_junctions(env):
    from neat_tpu.fields.mlp import global_junctions_forward

    ours = global_junctions_forward(env.params["junctions"], env.cfg.junctions)
    ref = env.ref.ffn(torch.as_tensor(np.asarray(env.params["junctions"]["latents"])))
    _assert_close("global_junctions", ours, ref)


# ---------------------------------------------------------------------------
# 2. error-bounded sampler
# ---------------------------------------------------------------------------


def _rays(env):
    from neat_tpu.core.camera import get_camera_params

    ray_dirs, cam_loc = get_camera_params(
        jnp.asarray(env.uv)[None],
        jnp.asarray(env.pose)[None],
        jnp.asarray(env.intrinsics)[None],
    )
    return ray_dirs[0], jnp.broadcast_to(cam_loc, (N_RAYS, 3))


def test_sampler_z_vals_eval(env):
    from neat_tpu.fields.mlp import implicit_sdf
    from neat_tpu.sampling.samplers import error_bound_z_vals

    ray_dirs, cam_loc = _rays(env)

    calls = []
    orig = env.ref.ray_sampler.get_error_bound

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    env.ref.ray_sampler.get_error_bound = counting
    env.ref.eval()
    try:
        t_dirs = torch.as_tensor(np.asarray(ray_dirs))
        t_loc = torch.as_tensor(np.asarray(cam_loc))
        with torch.no_grad(), _pin_cdf_boundary():
            ref_z, _ = env.ref.ray_sampler.get_z_vals(t_dirs, t_loc, env.ref)
    finally:
        env.ref.ray_sampler.get_error_bound = orig
        env.ref.train()

    # the fixed-trip-count redesign reproduces the all-iterations regime;
    # assert the reference actually ran all 5 iterations (11 bound evals per
    # iteration: 1 + beta_iters)
    n_iters = len(calls) // (1 + env.cfg.sampler.beta_iters)
    assert n_iters == env.cfg.sampler.max_total_iters, (
        f"reference sampler converged after {n_iters} iters; increase the "
        "weight wiggle so the parity test exercises the full loop"
    )

    sdf_fn = lambda p: implicit_sdf(env.params["implicit"], p, env.cfg.implicit)[
        ..., 0
    ]
    with _pin_cdf_boundary():
        z, _ = error_bound_z_vals(
            jax.random.PRNGKey(0),
            ray_dirs,
            cam_loc,
            sdf_fn,
            env.params["density"],
            env.cfg.sampler,
            training=False,
            beta_min=env.cfg.density_beta_min,
        )
    # residual envelope: the inverse-CDF interpolation divides by bin
    # probabilities as small as 1e-5, amplifying the ~1e-13 cumsum
    # ordering noise (torch sequential vs XLA scan) up to ~1e-7 on a
    # handful of entries; everything else matches to 1e-9
    z_np = np.asarray(z)
    ref_np = ref_z.detach().cpu().numpy()
    frac_exact = np.mean(np.abs(z_np - ref_np) < 1e-9)
    assert frac_exact > 0.995, f"only {frac_exact:.4f} of z entries at 1e-9"
    _assert_close("z_vals(eval)", z, ref_z, atol=5e-7, rtol=1e-8)


# ---------------------------------------------------------------------------
# 3. full forward, eval mode (deterministic)
# ---------------------------------------------------------------------------

EVAL_KEYS = [
    "rgb_values",
    "depth",
    "xyz",
    "lines3d",
    "lines2d",
    "lines2d_calib",
    "l3d",
    "points3d",
    "sdf",
    "normal_map",
]


def test_eval_forward_full(env):
    # no torch.no_grad(): the reference's get_outputs needs autograd for the
    # SDF spatial gradients even in eval mode
    env.ref.eval()
    try:
        with _pin_cdf_boundary():
            ref_out = env.ref(env.torch_inputs())
    finally:
        env.ref.train()

    with _pin_cdf_boundary():
        out = neat_forward(
            env.params, env.jax_inputs(), env.cfg, jax.random.PRNGKey(0),
            training=False,
        )
    # 1e-5: z values carry a sparse ~1e-7 inverse-CDF residue (see
    # test_sampler_z_vals_eval) that downstream field Lipschitz constants
    # amplify ~10-100x; field-level parity at 1e-9 is pinned separately
    for key in EVAL_KEYS:
        _assert_close(f"eval:{key}", out[key], ref_out[key], atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# 4. full forward + loss + parameter gradients, train mode (shared RNG)
# ---------------------------------------------------------------------------


def _run_ref_train(env, draws):
    inputs = env.torch_inputs()
    with patch_torch_rng(draws), _pin_cdf_boundary():
        ref_out = env.ref(inputs)
    ref_loss = build_reference_loss()
    ref_loss_out = ref_loss(ref_out, env.torch_gt())
    return ref_out, ref_loss_out


def _jax_loss_fn(env):
    loss_cfg = LossConfig(assignment_method="callback")

    def f(params):
        out = neat_forward(
            params, env.jax_inputs(), env.cfg, jax.random.PRNGKey(0), training=True
        )
        loss_out = neat_loss(out, env.jax_gt(), loss_cfg)
        return loss_out["loss"], (out, loss_out)

    return f


def test_train_forward_loss_and_gradients(env):
    draws = DeterministicDraws(seed=1234)
    ref_out, ref_loss_out = _run_ref_train(env, draws)

    with patch_jax_rng(draws), _pin_cdf_boundary():
        (loss_val, (out, loss_out)), grads = jax.value_and_grad(
            _jax_loss_fn(env), has_aux=True
        )(env.params)

    # ---- forward dict -------------------------------------------------
    for key in EVAL_KEYS[:-1]:  # no normal_map in train mode
        _assert_close(f"train:{key}", out[key], ref_out[key], atol=1e-5, rtol=1e-5)
    _assert_close("train:grad_theta", out["grad_theta"], ref_out["grad_theta"],
                  atol=1e-8, rtol=1e-7)
    _assert_close("train:median", out["median"], ref_out["median"])

    # junction branch: reference filters by is_correct; ours pads with a mask
    keep = np.asarray(out["j_local_mask"])
    for ours_key, ref_key in [
        ("j3d_local", "j3d_local"),
        ("j2d_local", "j2d_local"),
        ("j2d_local_calib", "j2d_local_calib"),
    ]:
        _assert_close(
            f"train:{ours_key}",
            np.asarray(out[ours_key])[keep],
            ref_out[ref_key],
            atol=1e-8,
            rtol=1e-7,
        )
    _assert_close("train:j3d_global", out["j3d_global"], ref_out["j3d_global"])
    _assert_close("train:j2d_global_calib", out["j2d_global_calib"],
                  ref_out["j2d_global_calib"])

    # ---- loss dict ------------------------------------------------------
    for key in ["loss", "rgb_loss", "eikonal_loss", "line_loss", "l2d_loss",
                "j3d_loss", "j2d_loss", "j2d_stat"]:
        _assert_close(f"loss:{key}", loss_out[key], ref_loss_out[key],
                      atol=1e-9, rtol=1e-8)
    assert float(loss_out["count"]) == float(ref_loss_out["count"])
    assert float(loss_out["jcount"]) == float(ref_loss_out["jcount"])

    # ---- parameter gradients (the detach-boundary check) ----------------
    ref_loss_out["loss"].backward()
    grad_state = params_to_reference_state(grads, env.cfg, dtype=np.float64)
    named = dict(env.ref.named_parameters())
    assert set(grad_state) == set(named)
    worst = ("", 0.0)
    for key, g_ours in grad_state.items():
        g_ref = named[key].grad
        if g_ref is None:
            g_ref = torch.zeros_like(named[key])
        # density.beta is a 0-d parameter in the reference; the exporter
        # normalizes it to (1,) for checkpoint compatibility
        err = _assert_close(
            f"grad:{key}", g_ours.reshape(g_ref.shape), g_ref, atol=1e-7, rtol=1e-5
        )
        if err > worst[1]:
            worst = (key, err)
    print(f"worst gradient diff: {worst[0]} = {worst[1]:.3e}")


# ---------------------------------------------------------------------------
# 5. rend_b: view-independent attraction (neat_wfr_rend_b.py:175-183,376)
# ---------------------------------------------------------------------------


def test_rend_b_noview_parity(env):
    """Build the reference rend_b from the same conf with attraction
    d_in=6 (the reduction build_experiment_config applies for no_view
    confs written at the idr width), strict-load our no_view weights,
    and diff the attraction field forward plus the eval-mode wireframe
    outputs."""
    import dataclasses

    from neat_tpu.fields.mlp import attraction_forward, implicit_sdf_feat_grad

    cfg_b = dataclasses.replace(
        env.cfg,
        attraction=dataclasses.replace(
            env.cfg.attraction, mode="no_view", d_in=6
        ),
    )
    params = _f64(_wiggle(init_neat(jax.random.PRNGKey(2), cfg_b), seed=13))
    ref = build_reference_model(
        CONF,
        cls="model.networks.neat_wfr_rend_b.VolSDFNetwork",
        model_overrides={"attraction_network.d_in": 6},
    )
    state = params_to_reference_state(params, cfg_b, dtype=np.float64)
    res = ref.load_state_dict(state, strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    ref.double()

    # field-level: rend_b's attraction signature is (points, normals, feats)
    rs = np.random.RandomState(21)
    pts = rs.uniform(-1.2, 1.2, size=(257, 3))
    dirs = rs.normal(size=(257, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    jp = jnp.asarray(pts)
    sdf, feats, grads = implicit_sdf_feat_grad(
        params["implicit"], jp, cfg_b.implicit
    )
    lines = attraction_forward(
        params["attraction"], jp, grads, jnp.asarray(dirs), feats,
        cfg_b.attraction,
    )
    tp = torch.as_tensor(pts)
    rsdf, rfeat, rgrad = ref.implicit_network.get_outputs(tp.clone())
    rlines = ref.attraction_network(tp, rgrad, rfeat)
    _assert_close("rend_b:attraction", lines.reshape(-1, 2, 3), rlines)

    # eval-mode forward: the wireframe outputs ride the no_view field
    ref.eval()
    try:
        with _pin_cdf_boundary():
            ref_out = ref(env.torch_inputs())
    finally:
        ref.train()
    with _pin_cdf_boundary():
        out = neat_forward(
            params, env.jax_inputs(), cfg_b, jax.random.PRNGKey(0),
            training=False,
        )
    for key in ("lines3d", "lines2d", "lines2d_calib", "l3d"):
        _assert_close(f"rend_b:{key}", out[key], ref_out[key], atol=1e-5,
                      rtol=1e-5)


# ---------------------------------------------------------------------------
# 6. along-ray: endpoint volume-rendering aggregation (neat_along_ray.py)
# ---------------------------------------------------------------------------


def test_along_ray_endpoint_render_parity(env):
    """The endpoint tracks' re-sort + own-SDF volume rendering
    (neat_along_ray.py:329-359) and the per-ray peak-weight score (:375),
    diffed against the reference class in eval mode with shared weights."""
    import dataclasses

    cfg = dataclasses.replace(
        env.cfg,
        attraction=dataclasses.replace(
            env.cfg.attraction, mode="no_view", d_in=6
        ),
        attraction_aggregation="endpoint_render",
    )
    params = _f64(_wiggle(init_neat(jax.random.PRNGKey(3), cfg), seed=17))
    ref = build_reference_model(
        CONF,
        cls="model.neat_along_ray.VolSDFNetwork",
        model_overrides={
            "attraction_network.d_in": 6,
            # this variant's AttractionFieldNetwork takes no mode kwarg
            "attraction_network.mode": None,
        },
    )
    # the along-ray class has no global-junction head
    state = params_to_reference_state(params, cfg, dtype=np.float64)
    state = {
        k: v
        for k, v in state.items()
        if k != "latents" and not k.startswith("ffn.")
    }
    res = ref.load_state_dict(state, strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    ref.double()

    ref.eval()
    try:
        with _pin_cdf_boundary():
            ref_out = ref(env.torch_inputs())
    finally:
        ref.train()
    with _pin_cdf_boundary():
        out = neat_forward(
            params, env.jax_inputs(), cfg, jax.random.PRNGKey(0),
            training=False,
        )
    for key in ("rgb_values", "depth", "xyz", "lines3d", "lines2d", "score"):
        _assert_close(f"along_ray:{key}", out[key], ref_out[key], atol=1e-5,
                      rtol=1e-5)


# ---------------------------------------------------------------------------
# 7. loss variants: same forward outputs, every mapped ablation loss diffed
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def train_pair(env):
    """One shared train-mode forward (both frameworks, shared draws) plus a
    synthetic sparse depth-cue map for the spd/rpd variants."""
    draws = DeterministicDraws(seed=4321)
    inputs = env.torch_inputs()
    with patch_torch_rng(draws), _pin_cdf_boundary():
        ref_out = env.ref(inputs)
    with patch_jax_rng(draws), _pin_cdf_boundary():
        out = neat_forward(
            env.params, env.jax_inputs(), env.cfg, jax.random.PRNGKey(0),
            training=True,
        )
    rs = np.random.RandomState(17)
    depth = rs.uniform(1.0, 3.5, size=(N_RAYS,))
    depth[rs.rand(N_RAYS) < 0.3] = 0.0  # sparse cues: 0 = no depth
    return ref_out, out, depth


LOSS_VARIANTS = [
    # (reference class, ref ctor kwargs, map flags delta, loss-dict keys)
    (
        "model.networks.loss_jc.VolSDFLoss",
        {},
        {"calibrated_branch": False, "junction_mode": "jc",
         "junction_3d_weight": 0.1, "junction_2d_weight": 0.0},
        ["loss", "rgb_loss", "eikonal_loss", "line_loss", "j3d_loss"],
    ),
    # wfr_a: non-junction terms only — its junction branch re-matches
    # observed vertices on the LOSS side with a median WEIGHT, where this
    # architecture keeps the gate model-side (documented deviation in the
    # config map), so the junction values and total differ by design
    (
        "model.networks.loss_wfr_a.VolSDFLoss",
        {},
        {"calibrated_branch": False, "junction_cost_2d_scale": 0.01},
        ["rgb_loss", "eikonal_loss", "line_loss"],
    ),
    (
        "model.networks.loss_wfr_unnormalize.VolSDFLoss",
        {},
        {"calibrated_branch": False, "junction_cost_2d_scale": 0.01,
         "junction_stat_gated": True},
        ["loss", "rgb_loss", "eikonal_loss", "line_loss", "j3d_loss",
         "j2d_loss", "j2d_stat", "jcount"],
    ),
    (
        "model.networks.loss_wfr_spd.VolSDFLoss",
        {"depth_weight": 0.1},
        {"depth_weight": 0.1},
        ["loss", "rgb_loss", "eikonal_loss", "line_loss", "l2d_loss",
         "j3d_loss", "j2d_loss", "j2d_stat", "depth_loss"],
    ),
]


@pytest.mark.parametrize(
    "ref_cls,ref_kwargs,flags,keys",
    LOSS_VARIANTS,
    ids=[v[0].rsplit(".", 2)[-2] for v in LOSS_VARIANTS],
)
def test_loss_variant_parity(env, train_pair, ref_cls, ref_kwargs, flags, keys):
    ref_out, out, depth = train_pair

    ref_loss = build_reference_loss(cls=ref_cls, **ref_kwargs)
    torch_gt = env.torch_gt()
    torch_gt["depth_colmap"] = torch.as_tensor(depth)[None]
    ref_loss_out = ref_loss(ref_out, torch_gt)

    jax_gt = env.jax_gt()
    jax_gt["depth"] = jnp.asarray(depth)
    loss_cfg = LossConfig(assignment_method="callback", **flags)
    loss_out = neat_loss(out, jax_gt, loss_cfg)

    for key in keys:
        _assert_close(f"{ref_cls}:{key}", loss_out[key], ref_loss_out[key],
                      atol=1e-8, rtol=1e-7)
    assert float(loss_out["count"]) == float(ref_loss_out["count"])
    if "jcount" in keys:
        assert float(loss_out["jcount"]) == float(ref_loss_out["jcount"])


def test_ssi_depth_loss_parity():
    """The rpd variant's MiDaS scale-and-shift-invariant loss (reference
    loss_wfr_rpd.py:15-144, constructed with alpha=0.5, scales=1 at :155)
    against our closed-form implementation, with the reference's all-ones
    mask over a sparse (zero-holed) target (loss_wfr_rpd.py:224)."""
    import importlib

    from neat_tpu.interop.reference_runtime import install_reference_stubs
    from neat_tpu.model.loss import scale_shift_invariant_loss

    install_reference_stubs()
    rpd = importlib.import_module("model.networks.loss_wfr_rpd")

    rs = np.random.RandomState(5)
    pred = rs.uniform(0.5, 4.0, size=(1024,))
    target = rs.uniform(1.0, 3.5, size=(1024,))
    target[rs.rand(1024) < 0.3] = 0.0

    ref_fn = rpd.ScaleAndShiftInvariantLoss(alpha=0.5, scales=1)
    ref = ref_fn(
        torch.as_tensor(pred).reshape(1, 32, 32),
        torch.as_tensor(target).reshape(1, 32, 32),
        torch.ones((1, 32, 32), dtype=torch.float64),
    )
    ours = scale_shift_invariant_loss(
        jnp.asarray(pred, jnp.float64), jnp.asarray(target, jnp.float64)
    )
    _assert_close("ssi_depth", ours, ref)


# ---------------------------------------------------------------------------
# 8. rend: non-detached line weights (gradient-level) + uniform sampler
# ---------------------------------------------------------------------------


def test_rend_nondetached_gradient_parity(env):
    """neat_wfr_rend's single delta vs rend_a is the LIVE volume-rendering
    weights in the line integral (rend:377 vs rend_a:410). Pin it at the
    gradient level: shared draws, loss_wfr, full backward in both
    frameworks with detach_line_weights=False."""
    import dataclasses

    ref = build_reference_model(
        CONF, cls="model.networks.neat_wfr_rend.VolSDFNetwork"
    )
    state = params_to_reference_state(env.params, env.cfg, dtype=np.float64)
    res = ref.load_state_dict(state, strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    ref.double()

    draws = DeterministicDraws(seed=777)
    with patch_torch_rng(draws), _pin_cdf_boundary():
        ref_out = ref(env.torch_inputs())
    ref_loss_out = build_reference_loss()(ref_out, env.torch_gt())

    cfg = dataclasses.replace(env.cfg, detach_line_weights=False)
    loss_cfg = LossConfig(assignment_method="callback")

    def f(params):
        out = neat_forward(
            params, env.jax_inputs(), cfg, jax.random.PRNGKey(0), training=True
        )
        return neat_loss(out, env.jax_gt(), loss_cfg)["loss"]

    with patch_jax_rng(draws), _pin_cdf_boundary():
        loss_val, grads = jax.value_and_grad(f)(env.params)

    _assert_close("rend:loss", loss_val, ref_loss_out["loss"], atol=1e-9,
                  rtol=1e-8)
    ref_loss_out["loss"].backward()
    grad_state = params_to_reference_state(grads, env.cfg, dtype=np.float64)
    named = dict(ref.named_parameters())
    for key, g_ours in grad_state.items():
        g_ref = named[key].grad
        if g_ref is None:
            g_ref = torch.zeros_like(named[key])
        _assert_close(f"rend:grad:{key}", g_ours.reshape(g_ref.shape), g_ref,
                      atol=1e-7, rtol=1e-5)


def test_uniform_sampler_parity(env):
    """The neat_uni family's UniformSampler (ray_sampler.py:61-95) against
    uniform_z_vals, eval mode (deterministic linspace; the reference class
    also returns ONLY z_vals — its `return z_vals, z_samples_eik` is
    commented out, so neat_uni's 2-tuple unpack of it is broken upstream
    for any batch size != 2; the sampler math itself is what's pinned)."""
    from neat_tpu.core.camera import get_camera_params
    from neat_tpu.sampling.samplers import UniformSamplerConfig, uniform_z_vals

    install = __import__(
        "neat_tpu.interop.reference_runtime", fromlist=["install_reference_stubs"]
    ).install_reference_stubs
    install()
    from model.ray_sampler import UniformSampler  # type: ignore

    ray_dirs, cam_loc = _rays(env)

    for take_sphere in (False, True):
        ucfg = UniformSamplerConfig(
            scene_bounding_sphere=3.0, near=0.0, n_samples=32,
            take_sphere_intersection=take_sphere,
        )
        ours = uniform_z_vals(
            jax.random.PRNGKey(0), ray_dirs, cam_loc, ucfg, training=False
        )
        ref_sampler = UniformSampler(
            3.0, near=0.0, N_samples=32, take_sphere_intersection=take_sphere
        )

        class _M:
            training = False

        ref_z = ref_sampler.get_z_vals(
            torch.as_tensor(np.asarray(ray_dirs)),
            torch.as_tensor(np.asarray(cam_loc)),
            _M(),
        )
        _assert_close(f"uniform_z(sphere={take_sphere})", ours, ref_z)


def test_wfr_surface_attraction_eval_parity(env):
    """neat_wfr: one attraction evaluation at the detached surface point
    (neat_wfr.py:408) and, in eval mode, the live re-evaluation at the
    tangent-plane point l3d that rebinds lines3d/lines2d and the sdf
    output (neat_wfr.py:469-474,484)."""
    import dataclasses

    cfg = dataclasses.replace(
        env.cfg,
        attraction=dataclasses.replace(
            env.cfg.attraction, mode="no_view", d_in=6
        ),
        attraction_at_surface=True,
        eval_attraction_at_l3d=True,
    )
    params = _f64(_wiggle(init_neat(jax.random.PRNGKey(4), cfg), seed=23))
    ref = build_reference_model(
        CONF,
        cls="model.networks.neat_wfr.VolSDFNetwork",
        model_overrides={
            "attraction_network.d_in": 6,
            # this variant's AttractionFieldNetwork takes no mode kwarg
            "attraction_network.mode": None,
        },
    )
    state = params_to_reference_state(params, cfg, dtype=np.float64)
    res = ref.load_state_dict(state, strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    ref.double()

    ref.eval()
    try:
        with _pin_cdf_boundary():
            ref_out = ref(env.torch_inputs())
    finally:
        ref.train()
    with _pin_cdf_boundary():
        out = neat_forward(
            params, env.jax_inputs(), cfg, jax.random.PRNGKey(0),
            training=False,
        )
    for key in ("rgb_values", "depth", "xyz", "points3d", "l3d", "lines3d",
                "lines2d", "lines2d_calib", "sdf", "normal_map"):
        _assert_close(f"wfr:{key}", out[key], ref_out[key], atol=1e-5,
                      rtol=1e-5)


def test_dual_eval_forward_parity(env):
    """neat_wfr_dual's eval forward (dual:502,563): surface-point no_view
    attraction, NO l3d re-evaluation (commented upstream, dual:627). The
    two-pass batching itself is step-level and covered by
    tests/test_parallel.py's dual-batch equivalence; this pins the model
    convention the dual class shares with wfr."""
    import dataclasses

    cfg = dataclasses.replace(
        env.cfg,
        attraction=dataclasses.replace(
            env.cfg.attraction, mode="no_view", d_in=6
        ),
        attraction_at_surface=True,
        dual_batch=True,
    )
    params = _f64(_wiggle(init_neat(jax.random.PRNGKey(5), cfg), seed=29))
    ref = build_reference_model(
        CONF,
        cls="model.networks.neat_wfr_dual.VolSDFNetwork",
        model_overrides={
            "attraction_network.d_in": 6,
            "attraction_network.mode": None,
        },
    )
    state = params_to_reference_state(params, cfg, dtype=np.float64)
    res = ref.load_state_dict(state, strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    ref.double()

    ref.eval()
    try:
        with _pin_cdf_boundary():
            ref_out = ref(env.torch_inputs())
    finally:
        ref.train()
    with _pin_cdf_boundary():
        out = neat_forward(
            params, env.jax_inputs(), cfg, jax.random.PRNGKey(0),
            training=False,
        )
    for key in ("rgb_values", "depth", "xyz", "l3d", "lines3d", "lines2d",
                "lines2d_calib", "sdf", "normal_map"):
        _assert_close(f"dual:{key}", out[key], ref_out[key], atol=1e-5,
                      rtol=1e-5)


def test_simple_eval_forward_parity(env):
    """neat_simple: surface-point no_view attraction with the LIVE
    uncalibrated projection (simple:345), the eval-mode l3d re-evaluation
    (simple:359-363), and NO junction head or calibrated output upstream
    (ours keeps both as a documented superset — the comparison takes the
    reference's key set)."""
    import dataclasses

    cfg = dataclasses.replace(
        env.cfg,
        attraction=dataclasses.replace(
            env.cfg.attraction, mode="no_view", d_in=6
        ),
        attraction_at_surface=True,
        eval_attraction_at_l3d=True,
        detach_lines2d=False,
    )
    params = _f64(_wiggle(init_neat(jax.random.PRNGKey(6), cfg), seed=31))
    ref = build_reference_model(
        CONF,
        cls="model.networks.neat_simple.VolSDFNetwork",
        model_overrides={
            "attraction_network.d_in": 6,
            "attraction_network.mode": None,
        },
    )
    state = params_to_reference_state(params, cfg, dtype=np.float64)
    # simple has no global-junction head
    state = {
        k: v
        for k, v in state.items()
        if k != "latents" and not k.startswith("ffn.")
    }
    res = ref.load_state_dict(state, strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    ref.double()

    ref.eval()
    try:
        with _pin_cdf_boundary():
            ref_out = ref(env.torch_inputs())
    finally:
        ref.train()
    with _pin_cdf_boundary():
        out = neat_forward(
            params, env.jax_inputs(), cfg, jax.random.PRNGKey(0),
            training=False,
        )
    for key in ("rgb_values", "depth", "xyz", "points3d", "l3d", "lines3d",
                "lines2d", "sdf", "normal_map"):
        _assert_close(f"simple:{key}", out[key], ref_out[key], atol=1e-5,
                      rtol=1e-5)


# ---------------------------------------------------------------------------
# 9. multi-step training recurrence: Adam + per-iteration ExponentialLR
# ---------------------------------------------------------------------------


def test_multi_step_optimizer_recurrence():
    """Execute the reference's full training recurrence — zero_grad /
    forward / loss / backward / Adam.step / ExponentialLR.step per
    iteration (volsdf_train.py:177-182,361-374,408) — for several steps
    against this repo's shipped optimizer stack (train/step.py
    make_optimizer: optax.adam over an exponential_decay schedule), same
    weights and shared per-step RNG, and compare the full parameter
    trajectories. This executes what the single-step gradient test cannot:
    the Adam moment recurrences, bias correction, epsilon placement, and
    the schedule's step indexing.

    Step 0 compares near-exactly (worst parameter 1e-8 after one full
    forward/backward/Adam step). Later steps drift GEOMETRICALLY (~20-50x
    per step, measured: 1e-8 / 2.3e-7 / 1.2e-5): once parameters differ at
    all, the sampler's inverse-CDF bin selection is discontinuous in the
    parameters, so a 1e-8 perturbation can flip a searchsorted index and
    move a z sample by a whole bin — chaos amplification that any two
    fp-distinct replicas of the SAME implementation exhibit, not a
    recurrence mismatch. The exact recurrence is pinned separately by
    test_optimizer_recurrence_exact_under_shared_gradients.

    A fresh Env is built because the shared module fixture's reference
    model must not have its weights stepped.
    """
    import optax

    from neat_tpu.train.step import make_lr_schedule, make_optimizer

    LR, DECAY_RATE, DECAY_STEPS = 5e-4, 0.1, 8
    N_STEPS = 3
    # measured drift (see docstring) x ~8x margin
    LOSS_ATOL = [1e-9, 1e-8, 3e-6]
    PARAM_ATOL = [1e-7, 2e-6, 1e-4]

    env = Env()
    try:
        opt = make_optimizer(LR, DECAY_RATE, DECAY_STEPS)
        opt_state = opt.init(env.params)
        params = env.params
        schedule = make_lr_schedule(LR, DECAY_RATE, DECAY_STEPS)

        ref_opt = torch.optim.Adam(env.ref.parameters(), lr=LR)
        ref_sched = torch.optim.lr_scheduler.ExponentialLR(
            ref_opt, DECAY_RATE ** (1.0 / DECAY_STEPS)
        )
        loss_fn = _jax_loss_fn(env)

        for step in range(N_STEPS):
            # the schedule value our optimizer will apply THIS step must
            # equal the LR torch is currently set to
            assert abs(
                float(schedule(step)) - ref_opt.param_groups[0]["lr"]
            ) < 1e-12 * LR

            draws = DeterministicDraws(seed=900 + step)
            ref_opt.zero_grad()
            ref_out, ref_loss_out = _run_ref_train(env, draws)
            ref_loss_out["loss"].backward()
            ref_opt.step()
            ref_sched.step()

            with patch_jax_rng(draws), _pin_cdf_boundary():
                (loss_val, (_, loss_out)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
            _assert_close(
                f"step{step}:loss", loss_val, ref_loss_out["loss"],
                atol=LOSS_ATOL[step], rtol=1e-8,
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            # full parameter state after the step (geometric drift envelope,
            # see docstring)
            state = params_to_reference_state(params, env.cfg, dtype=np.float64)
            named = dict(env.ref.named_parameters())
            assert set(state) == set(named)
            for key, ours in state.items():
                _assert_close(
                    f"step{step}:{key}",
                    np.asarray(ours).reshape(tuple(named[key].shape)),
                    named[key].detach(),
                    atol=PARAM_ATOL[step],
                    rtol=1e-6,
                )
    finally:
        env.close()


def test_optimizer_recurrence_exact_under_shared_gradients():
    """The optimizer recurrence ALONE, pinned exactly: feed the identical
    gradient stream to torch.optim.Adam + ExponentialLR (the reference's
    stack, volsdf_train.py:177-182,408) and to our optax chain
    (train/step.py make_optimizer) over the real parameter pytree for 8
    steps across a full decade of LR decay, and require the parameter
    trajectories to agree to 1e-9 (torch folds the bias corrections into
    step_size/denominator where optax forms m-hat/v-hat first — identical
    algebra, ~1e-11 f64 reassociation residue). This isolates Adam's
    moment updates,
    bias correction, epsilon placement, and the schedule's step indexing
    from the forward pass's chaotic sensitivity (see
    test_multi_step_optimizer_recurrence)."""
    import optax

    from neat_tpu.train.step import make_lr_schedule, make_optimizer

    LR, DECAY_RATE, DECAY_STEPS = 5e-4, 0.1, 8

    with jax.enable_x64(True):
        cfg = NeatConfig.for_abc()
        params = _f64(init_neat(jax.random.PRNGKey(3), cfg))
        leaves, treedef = jax.tree_util.tree_flatten(params)

        # clone: as_tensor would alias the (non-writable) jax buffers and
        # torch's in-place Adam writes into aliased memory are undefined
        t_params = [
            torch.nn.Parameter(torch.as_tensor(np.asarray(l)).clone().double())
            for l in leaves
        ]
        ref_opt = torch.optim.Adam(t_params, lr=LR)
        ref_sched = torch.optim.lr_scheduler.ExponentialLR(
            ref_opt, DECAY_RATE ** (1.0 / DECAY_STEPS)
        )

        opt = make_optimizer(LR, DECAY_RATE, DECAY_STEPS)
        opt_state = opt.init(params)
        schedule = make_lr_schedule(LR, DECAY_RATE, DECAY_STEPS)

        rs = np.random.RandomState(77)
        for step in range(8):
            assert abs(
                float(schedule(step)) - ref_opt.param_groups[0]["lr"]
            ) < 1e-14 * LR
            # a gradient stream spanning magnitudes around and far below
            # Adam's eps, where the epsilon-placement conventions differ
            # most visibly
            g_leaves = [
                rs.normal(size=np.asarray(l).shape)
                * 10.0 ** rs.uniform(-10, 0)
                for l in leaves
            ]
            grads = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(g) for g in g_leaves]
            )
            for p, g in zip(t_params, g_leaves):
                p.grad = torch.as_tensor(g).double()
            ref_opt.step()
            ref_sched.step()

            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            for ours, ref in zip(jax.tree_util.tree_leaves(params), t_params):
                np.testing.assert_allclose(
                    np.asarray(ours), ref.detach().numpy(), atol=1e-9, rtol=0
                )
