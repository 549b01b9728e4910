"""End-to-end model forward/loss/grad tests on synthetic inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neat_tpu.model import NeatConfig, init_neat, neat_forward, neat_loss, LossConfig
from neat_tpu.fields.mlp import ImplicitNetConfig, GlobalJunctionsConfig
from neat_tpu.sampling.samplers import ErrorBoundSamplerConfig


def tiny_cfg(**kw):
    return NeatConfig(
        implicit=ImplicitNetConfig(dims=(32,) * 4, skip_in=(2,), multires=4),
        junctions=GlobalJunctionsConfig(num_junctions=16, dim_hidden=32),
        sampler=ErrorBoundSamplerConfig(
            n_samples=8, n_samples_eval=16, n_samples_extra=4, max_total_iters=2
        ),
        max_verts=8,
        **kw,
    )


def make_inputs(n_rays=16, n_verts=8):
    rng = np.random.RandomState(0)
    k = np.array(
        [[100.0, 0, 32, 0], [0, 100.0, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    return {
        "uv": jnp.asarray(rng.rand(n_rays, 2).astype(np.float32) * 64),
        "uv_proj": jnp.asarray(rng.rand(n_rays, 2).astype(np.float32) * 64),
        "intrinsics": jnp.asarray(k),
        "pose": jnp.asarray(pose),
        "verts2d": jnp.asarray(rng.rand(n_verts, 2).astype(np.float32) * 64),
        "verts_mask": jnp.asarray([True] * 5 + [False] * 3),
    }


def make_gt(n_rays=16):
    rng = np.random.RandomState(1)
    lines = rng.rand(n_rays, 5).astype(np.float32)
    lines[:, :4] *= 64
    return {
        "rgb": jnp.asarray(rng.rand(n_rays, 3).astype(np.float32)),
        "lines2d": jnp.asarray(lines),
    }


class TestForward:
    @pytest.mark.slow
    def test_output_shapes(self):
        cfg = tiny_cfg()
        params = init_neat(jax.random.PRNGKey(0), cfg)
        out = neat_forward(params, make_inputs(), cfg, jax.random.PRNGKey(1))
        r = 16
        s = 8 + 4 + 2
        assert out["rgb_values"].shape == (r, 3)
        assert out["z_vals"].shape == (r, s)
        assert out["lines3d"].shape == (r, 2, 3)
        assert out["lines2d"].shape == (r, 2, 2)
        assert out["j3d_local"].shape == (8, 3)
        assert out["j3d_global"].shape == (16, 3)
        assert out["grad_theta"].shape == (2 * r, 3)
        for k, v in out.items():
            assert np.isfinite(np.asarray(v)).all(), f"{k} has non-finite values"

    @pytest.mark.slow
    def test_eval_mode(self):
        cfg = tiny_cfg()
        params = init_neat(jax.random.PRNGKey(0), cfg)
        out = neat_forward(params, make_inputs(), cfg, jax.random.PRNGKey(1), training=False)
        assert "normal_map" in out
        assert "j3d_local" not in out
        assert "grad_theta" not in out

    @pytest.mark.slow
    def test_volsdf_variant(self):
        cfg = tiny_cfg(model_variant="volsdf")
        params = init_neat(jax.random.PRNGKey(0), cfg)
        assert "attraction" not in params
        out = neat_forward(params, make_inputs(), cfg, jax.random.PRNGKey(1))
        assert "lines3d" not in out
        assert "grad_theta" in out

    @pytest.mark.slow
    def test_attraction_at_surface_variant(self):
        """neat_wfr/neat_wfr_a/neat_simple (neat_wfr.py:397-409): one
        attraction evaluation at the DETACHED rendered surface point
        instead of the rend family's per-sample weighted line integral —
        both endpoints of each line must bracket the surface point
        (lines3d = xs +/- offsets), and the result must differ from the
        integral path."""
        cfg_i = tiny_cfg()
        cfg_s = tiny_cfg(attraction_at_surface=True)
        params = init_neat(jax.random.PRNGKey(0), cfg_i)
        out_i = neat_forward(params, make_inputs(), cfg_i, jax.random.PRNGKey(1))
        out_s = neat_forward(params, make_inputs(), cfg_s, jax.random.PRNGKey(1))
        assert out_s["lines3d"].shape == (16, 2, 3)
        # surface point = midpoint of the two endpoints (x + off1, x + off2
        # with off2 = -off1 only at init... the invariant that holds for
        # any offsets: endpoints are produced AT the surface point, so the
        # same surface point reproduces them exactly with one more eval
        assert not np.allclose(
            np.asarray(out_s["lines3d"]), np.asarray(out_i["lines3d"])
        )
        # and the surface path's endpoints must move with the surface
        # point: same rng, same weights -> xyz identical across variants
        np.testing.assert_allclose(
            np.asarray(out_s["xyz"]), np.asarray(out_i["xyz"]), rtol=1e-6
        )
        for k in ("lines2d", "lines2d_calib", "l3d"):
            assert np.isfinite(np.asarray(out_s[k])).all(), k

    @pytest.mark.slow
    def test_endpoint_render_variant(self):
        """neat_along_ray(+v2): each endpoint track is re-sorted by camera
        distance and volume-rendered with its own SDF weights
        (neat_along_ray.py:329-359), emitting the per-ray 'score'
        (=0.5*(max w_a + max w_b), :375); v2 scores with a second SDF net
        trained only through this term (neat_along_ray_v2.py:268,335-336)."""
        cfg_w = tiny_cfg()
        cfg_e = tiny_cfg(attraction_aggregation="endpoint_render")
        params = init_neat(jax.random.PRNGKey(0), cfg_w)
        out_w = neat_forward(params, make_inputs(), cfg_w, jax.random.PRNGKey(1))
        out_e = neat_forward(params, make_inputs(), cfg_e, jax.random.PRNGKey(1))
        assert "score" not in out_w
        assert out_e["lines3d"].shape == (16, 2, 3)
        # weights sum to <=1 and are nonnegative, so the peak-weight score
        # lives in [0, 1]
        score = np.asarray(out_e["score"])
        assert score.shape == (16,)
        assert (score >= 0).all() and (score <= 1).all()
        # a different aggregation over the same per-sample field
        assert not np.allclose(
            np.asarray(out_e["lines3d"]), np.asarray(out_w["lines3d"])
        )
        # the main render is untouched by the aggregation choice
        np.testing.assert_allclose(
            np.asarray(out_e["rgb_values"]), np.asarray(out_w["rgb_values"]),
            rtol=1e-6,
        )

        # v2: a second SDF net exists and receives gradient through the
        # endpoint weights (its ONLY path into the loss)
        cfg_v2 = tiny_cfg(
            attraction_aggregation="endpoint_render", endpoint_sdf_separate=True
        )
        params_v2 = init_neat(jax.random.PRNGKey(0), cfg_v2)
        assert "neat_sdf" in params_v2
        inputs, gt = make_inputs(), make_gt()

        def loss_fn(p):
            out = neat_forward(p, inputs, cfg_v2, jax.random.PRNGKey(1))
            return neat_loss(out, gt, LossConfig())["loss"]

        grads = jax.grad(loss_fn)(params_v2)
        assert np.abs(np.asarray(grads["neat_sdf"]["lin0"]["v"])).sum() > 0
        assert np.abs(np.asarray(grads["attraction"]["lin0"]["v"])).sum() > 0

        # along_ray projects lines3d LIVE (along_ray:365): with the family's
        # uncalibrated-only losses, the line term must still reach the
        # attraction net through lines2d
        cfg_live = tiny_cfg(
            attraction_aggregation="endpoint_render", detach_lines2d=False
        )
        params_l = init_neat(jax.random.PRNGKey(0), cfg_live)

        def line_only(p):
            out = neat_forward(p, inputs, cfg_live, jax.random.PRNGKey(1))
            lc = LossConfig(calibrated_branch=False, junction_3d_weight=0.0,
                            junction_2d_weight=0.0)
            return neat_loss(out, gt, lc)["loss"]

        g = jax.grad(line_only)(params_l)
        assert np.abs(np.asarray(g["attraction"]["lin0"]["v"])).sum() > 0

    @pytest.mark.slow
    def test_uniform_sampler_variant(self):
        cfg = tiny_cfg(sampler_kind="uniform")
        params = init_neat(jax.random.PRNGKey(0), cfg)
        out = neat_forward(params, make_inputs(), cfg, jax.random.PRNGKey(1))
        assert out["z_vals"].shape == (16, 8)

    @pytest.mark.slow
    def test_dbscan_variant(self):
        cfg = tiny_cfg(dbscan_enabled=True)
        params = init_neat(jax.random.PRNGKey(0), cfg)
        out = neat_forward(params, make_inputs(), cfg, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out["j3d_local"])).all()

    @pytest.mark.slow
    def test_rend_c_variant(self):
        """dbscan_include_global (reference neat_wfr_rend_c.py:427-433):
        the decoded global junctions join the endpoint cloud before
        clustering, so the proposal set is larger by num_junctions."""
        cfg_a = tiny_cfg(dbscan_enabled=True)
        cfg_c = tiny_cfg(dbscan_enabled=True, dbscan_include_global=True)
        params = init_neat(jax.random.PRNGKey(0), cfg_c)
        # make every decoded global junction coincide so they pass the
        # min_samples=2 DBSCAN gate (at random init they are isolated ->
        # noise, and rend_c correctly matches the endpoints-only variant,
        # exactly like the reference's sklearn DBSCAN would behave)
        latents = params["junctions"]["latents"]
        params["junctions"]["latents"] = jnp.broadcast_to(
            latents[:1], latents.shape
        )
        out_a = neat_forward(params, make_inputs(), cfg_a, jax.random.PRNGKey(1))
        out_c = neat_forward(params, make_inputs(), cfg_c, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out_c["j3d_local"])).all()
        # both produce per-vert assignments of the same padded size
        assert out_c["j3d_local"].shape == out_a["j3d_local"].shape
        # the flag must actually change the proposal set: the coincident
        # global junctions form a cluster that joins the proposals
        assert not np.allclose(
            np.asarray(out_c["j3d_local"]), np.asarray(out_a["j3d_local"])
        )


class TestLossAndGrad:
    @pytest.mark.slow
    def test_loss_finite_and_components(self):
        cfg = tiny_cfg()
        params = init_neat(jax.random.PRNGKey(0), cfg)
        out = neat_forward(params, make_inputs(), cfg, jax.random.PRNGKey(1))
        losses = neat_loss(out, make_gt(), LossConfig())
        for k in ["loss", "rgb_loss", "eikonal_loss", "line_loss", "j3d_loss", "j2d_loss"]:
            assert k in losses
            assert np.isfinite(float(losses[k])), f"{k} not finite"

    @pytest.mark.slow
    def test_grads_flow_everywhere(self):
        cfg = tiny_cfg()
        params = init_neat(jax.random.PRNGKey(0), cfg)
        inputs, gt = make_inputs(), make_gt()

        def loss_fn(p):
            out = neat_forward(p, inputs, cfg, jax.random.PRNGKey(1))
            return neat_loss(out, gt, LossConfig())["loss"]

        grads = jax.grad(loss_fn)(params)
        flat, _ = jax.tree_util.tree_flatten(grads)
        for g in flat:
            assert np.isfinite(np.asarray(g)).all()
        # every head receives gradient
        assert np.abs(np.asarray(grads["implicit"]["lin0"]["v"])).sum() > 0
        assert np.abs(np.asarray(grads["rendering"]["lin0"]["v"])).sum() > 0
        assert np.abs(np.asarray(grads["attraction"]["lin0"]["v"])).sum() > 0
        assert np.abs(np.asarray(grads["junctions"]["latents"])).sum() > 0
        assert np.abs(np.asarray(grads["density"].beta)) >= 0

    @pytest.mark.slow
    def test_dual_batch_variant(self):
        """neat_wfr_dual two-pass mode: uniform-pixel RGB pass + support
        wireframe pass compose into one finite loss."""
        import dataclasses
        from neat_tpu.train.step import init_train_state, make_train_step

        rng = np.random.RandomState(0)
        v, hw, w = 2, 64, 8
        k = np.eye(4, dtype=np.float32)
        k[0, 0] = k[1, 1] = 10.0
        k[0, 2] = k[1, 2] = 4.0
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -2.0
        scene = {
            "rgb": jnp.asarray(rng.rand(v, hw, 3).astype(np.float32)),
            "intrinsics": jnp.asarray(np.tile(k, (v, 1, 1))),
            "pose": jnp.asarray(np.tile(pose, (v, 1, 1))),
            "labels": jnp.asarray(rng.randint(0, 3, (v, hw)).astype(np.int32)),
            "uv_proj": jnp.asarray(rng.rand(v, hw, 2).astype(np.float32) * w),
            "lines": jnp.asarray(rng.rand(v, 3, 5).astype(np.float32) * w),
            "verts2d": jnp.asarray(rng.rand(v, 8, 2).astype(np.float32) * w),
            "verts_mask": jnp.ones((v, 8), dtype=bool),
            "support_idx": jnp.asarray(
                np.tile(np.arange(hw, dtype=np.int32), (v, 1))
            ),
            "support_count": jnp.full((v,), hw, dtype=jnp.int32),
        }
        cfg = dataclasses.replace(tiny_cfg(), dual_batch=True)
        params = init_neat(jax.random.PRNGKey(0), cfg)
        state = init_train_state(params, 5e-4, 0.1, 10)
        step = make_train_step(cfg, LossConfig(), 5e-4, 0.1, 10, 16, w, donate=False)
        state, aux = step(state, scene, jax.random.PRNGKey(1))
        assert np.isfinite(float(np.asarray(aux["loss"])))
        assert np.isfinite(float(np.asarray(aux["line_loss"])))

    def test_sample_batch_includes_depth(self):
        """Depth cues flow into ground_truth when the scene carries them."""
        from neat_tpu.train.step import sample_batch

        rng = np.random.RandomState(0)
        v, hw = 2, 64
        scene = {
            "rgb": jnp.asarray(rng.rand(v, hw, 3).astype(np.float32)),
            "intrinsics": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (v, 1, 1))),
            "pose": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (v, 1, 1))),
            "labels": jnp.asarray(rng.randint(0, 3, (v, hw)).astype(np.int32)),
            "uv_proj": jnp.asarray(rng.rand(v, hw, 2).astype(np.float32)),
            "lines": jnp.asarray(rng.rand(v, 3, 5).astype(np.float32)),
            "verts2d": jnp.asarray(rng.rand(v, 4, 2).astype(np.float32)),
            "verts_mask": jnp.ones((v, 4), dtype=bool),
            "support_idx": jnp.asarray(np.tile(np.arange(hw, dtype=np.int32), (v, 1))),
            "support_count": jnp.full((v,), hw, dtype=jnp.int32),
            "depth": jnp.asarray(rng.rand(v, hw).astype(np.float32)),
        }
        inputs, gt = sample_batch(jax.random.PRNGKey(0), scene, 8, 8)
        assert gt["depth"].shape == (8,)
        scene.pop("depth")
        _, gt2 = sample_batch(jax.random.PRNGKey(0), scene, 8, 8)
        assert "depth" not in gt2

    @pytest.mark.slow
    def test_jit_compiles(self):
        cfg = tiny_cfg()
        params = init_neat(jax.random.PRNGKey(0), cfg)
        inputs, gt = make_inputs(), make_gt()

        @jax.jit
        def step(p, rng):
            out = neat_forward(p, inputs, cfg, rng, training=True)
            return neat_loss(out, gt, LossConfig())["loss"]

        l1 = float(step(params, jax.random.PRNGKey(1)))
        l2 = float(step(params, jax.random.PRNGKey(2)))
        assert np.isfinite(l1) and np.isfinite(l2)


class TestLineLift:
    """The vanilla network's abandoned line-lifting forwards
    (reference model/network.py:234-380), kept on the class surface."""

    @pytest.mark.slow
    def test_minstance_loss_finite_with_gradient(self):
        from neat_tpu.model import minstance_loss

        cfg = tiny_cfg(model_variant="volsdf")
        params = init_neat(jax.random.PRNGKey(0), cfg)
        base = make_inputs()
        rng = np.random.RandomState(3)
        inputs = {
            "juncs2d": jnp.asarray(rng.rand(6, 2).astype(np.float32) * 64),
            "edges": jnp.asarray([[0, 1], [2, 3], [4, 5]], dtype=jnp.int32),
            "weights": jnp.asarray([1.0, 0.5, 0.2], dtype=jnp.float32),
            "pose": base["pose"],
            "intrinsics": base["intrinsics"],
        }

        def f(p):
            return minstance_loss(p, cfg, inputs, jax.random.PRNGKey(7))

        loss, grads = jax.value_and_grad(f)(params)
        assert np.isfinite(float(loss))
        # gradient reaches the implicit net through the lifted points
        # (the projection target is detached, the points are not)
        assert np.abs(np.asarray(grads["implicit"]["lin0"]["v"])).sum() > 0

    @pytest.mark.slow
    def test_two_view_lift_detached_geometry(self):
        from neat_tpu.model import two_view_lift

        cfg = tiny_cfg(model_variant="volsdf")
        params = init_neat(jax.random.PRNGKey(0), cfg)
        base = make_inputs()
        rng = np.random.RandomState(4)
        inputs = {
            "juncs2d": jnp.asarray(rng.rand(4, 2).astype(np.float32) * 64),
            "edges": jnp.asarray([[0, 1], [2, 3]], dtype=jnp.int32),
            "weights": jnp.asarray([1.0, 1.0], dtype=jnp.float32),
            "pose": base["pose"],
            "intrinsics": base["intrinsics"],
        }
        loss, lines3d, pts2d = two_view_lift(
            params, cfg, inputs, jax.random.PRNGKey(9), n_points=16
        )
        assert lines3d.shape == (2, 16, 3)
        assert pts2d.shape == (2, 16, 2)
        assert np.isfinite(np.asarray(lines3d)).all()
        # alignment score: mean |cos - 1| over unit vectors lies in [0, 2]
        assert 0.0 <= float(loss) <= 2.0
        # upstream detaches every lifted point (network.py:316): the
        # training-branch loss is a constant w.r.t. the parameters
        g = jax.grad(
            lambda p: two_view_lift(p, cfg, inputs, jax.random.PRNGKey(9))[0]
        )(params)
        assert np.abs(np.asarray(g["implicit"]["lin0"]["v"])).sum() == 0


@pytest.mark.slow
def test_junction_eikonal_extends_grad_theta():
    """junction_eikonal (rend_a:524-525): the detached decoded global
    junctions join the eikonal point set, growing grad_theta by
    num_junctions rows; the base rows are unchanged."""
    cfg_off = tiny_cfg()
    cfg_on = tiny_cfg(junction_eikonal=True)
    params = init_neat(jax.random.PRNGKey(0), cfg_off)
    out_off = neat_forward(params, make_inputs(), cfg_off, jax.random.PRNGKey(1))
    out_on = neat_forward(params, make_inputs(), cfg_on, jax.random.PRNGKey(1))
    n_base = out_off["grad_theta"].shape[0]
    assert out_on["grad_theta"].shape[0] == n_base + 16  # num_junctions
    np.testing.assert_allclose(
        np.asarray(out_on["grad_theta"][:n_base]),
        np.asarray(out_off["grad_theta"]),
        rtol=1e-6,
    )
    assert np.isfinite(np.asarray(out_on["grad_theta"])).all()


@pytest.mark.slow
def test_use_l3d_junction_proposals():
    """use_l3d (neat_wfr.py:432-435 / rend_a's equivalent): junction
    proposals become the sub-median-l3d_score endpoints PLUS their l3d
    points (3R padded proposal set) instead of all 2R endpoints; the
    selection mask gates both copies of each ray."""
    cfg = tiny_cfg(use_l3d=True)
    params = init_neat(jax.random.PRNGKey(0), cfg)
    out = neat_forward(params, make_inputs(), cfg, jax.random.PRNGKey(1))
    # proposals padded to 3R; j3d_local is the verts-matched subset so its
    # row count stays max_verts — the executable signal is finiteness and
    # that the forward accepts the branch
    assert out["j3d_local"].shape == (8, 3)
    for k in ("j3d_local", "j2d_local", "j2d_local_calib", "median"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    # the proposal set differs from the default branch: matched junctions
    # can now land on l3d points, so the assignment outcome changes
    out_def = neat_forward(
        params, make_inputs(), tiny_cfg(), jax.random.PRNGKey(1)
    )
    assert not np.allclose(
        np.asarray(out["j3d_local"]), np.asarray(out_def["j3d_local"])
    )


def _tiny_step_scene(v=2, hw=64, w=8, n_verts=8):
    rng = np.random.RandomState(0)
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = 10.0
    k[0, 2] = k[1, 2] = 4.0
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    return {
        "rgb": jnp.asarray(rng.rand(v, hw, 3).astype(np.float32)),
        "intrinsics": jnp.asarray(np.tile(k, (v, 1, 1))),
        "pose": jnp.asarray(np.tile(pose, (v, 1, 1))),
        "labels": jnp.asarray(rng.randint(0, 3, (v, hw)).astype(np.int32)),
        "uv_proj": jnp.asarray(rng.rand(v, hw, 2).astype(np.float32) * w),
        "lines": jnp.asarray(rng.rand(v, 3, 5).astype(np.float32) * w),
        "verts2d": jnp.asarray(rng.rand(v, n_verts, 2).astype(np.float32) * w),
        "verts_mask": jnp.ones((v, n_verts), dtype=bool),
        "support_idx": jnp.asarray(
            np.tile(np.arange(hw, dtype=np.int32), (v, 1))
        ),
        "support_count": jnp.full((v,), hw, dtype=jnp.int32),
    }


class TestMultiStep:
    def test_scan_matches_sequential_steps(self):
        """make_train_multi_step (one lax.scan program per K steps — the
        runner's dispatch-amortized epoch body) is numerically exact
        against K sequential make_train_step calls on the same rng
        sequence: same params, same opt state, stacked aux rows equal to
        the per-step aux dicts."""
        from neat_tpu.train.step import (
            init_train_state,
            make_train_step,
            make_train_multi_step,
        )

        cfg = tiny_cfg()
        scene = _tiny_step_scene()
        w, n_rays, n_steps = 8, 16, 3
        rngs = jax.random.split(jax.random.PRNGKey(7), n_steps)

        step = make_train_step(cfg, LossConfig(), 5e-4, 0.1, 10, n_rays, w,
                               donate=False)
        state_a = init_train_state(init_neat(jax.random.PRNGKey(0), cfg),
                                   5e-4, 0.1, 10)
        auxes = []
        for i in range(n_steps):
            state_a, aux = step(state_a, scene, rngs[i])
            auxes.append(aux)

        multi = make_train_multi_step(cfg, LossConfig(), 5e-4, 0.1, 10,
                                      n_rays, w, donate=False)
        state_b = init_train_state(init_neat(jax.random.PRNGKey(0), cfg),
                                   5e-4, 0.1, 10)
        state_b, stacked = multi(state_b, scene, rngs)

        assert int(state_b.step) == n_steps
        for k in stacked:
            got = np.asarray(stacked[k])
            want = np.asarray([np.asarray(a[k]) for a in auxes])
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7,
                                       err_msg=k)
        for a, b in zip(
            jax.tree_util.tree_leaves(state_a.params),
            jax.tree_util.tree_leaves(state_b.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)
