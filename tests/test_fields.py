"""Tests for the field MLPs: shapes, inits, weight norm, gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neat_tpu.fields import (
    ImplicitNetConfig,
    RenderNetConfig,
    GlobalJunctionsConfig,
    init_implicit_net,
    implicit_forward,
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


class TestImplicitNet:
    cfg = ImplicitNetConfig()

    @pytest.mark.slow  # dense 3d grid eval of the full mlp; ~6 s
    def test_geometric_init_is_spherical(self):
        """With the geometric init, the initial SDF approximates |x| - bias."""
        params = init_implicit_net(jax.random.PRNGKey(0), self.cfg)
        # points at various radii
        radii = np.array([0.2, 0.6, 1.0, 1.5])
        dirs = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [0.577, 0.577, 0.577]])
        pts = jnp.asarray(radii[:, None] * dirs)
        sdf = np.asarray(implicit_forward(params, pts, self.cfg)[:, 0])
        # zero-level set near r = bias (0.6): inside negative, outside positive
        assert sdf[0] < 0  # r=0.2
        assert sdf[3] > 0  # r=1.5
        # roughly monotone in radius
        assert sdf[0] < sdf[1] < sdf[2] < sdf[3]

    def test_sphere_clamp(self):
        params = init_implicit_net(jax.random.PRNGKey(0), self.cfg)
        far = jnp.asarray([[2.9, 0.0, 0.0]])
        sdf = float(implicit_sdf(params, far, self.cfg)[0, 0])
        clamp = self.cfg.sphere_scale * (self.cfg.sdf_bounding_sphere - 2.9)
        assert sdf <= clamp + 1e-5

    def test_gradient_matches_finite_difference(self):
        params = init_implicit_net(jax.random.PRNGKey(1), self.cfg)
        x = jnp.asarray([[0.3, -0.2, 0.5]])
        sdf, feats, grad = implicit_sdf_feat_grad(params, x, self.cfg)
        assert sdf.shape == (1, 1) and feats.shape == (1, 256) and grad.shape == (1, 3)
        h = 1e-3
        fd = []
        for d in range(3):
            xp = x.at[0, d].add(h)
            xm = x.at[0, d].add(-h)
            fd.append(
                (float(implicit_sdf(params, xp, self.cfg)[0, 0]) -
                 float(implicit_sdf(params, xm, self.cfg)[0, 0])) / (2 * h)
            )
        np.testing.assert_allclose(np.asarray(grad)[0], fd, rtol=1e-2, atol=1e-3)

    def test_eikonal_gradient_near_unit_at_init(self):
        """Geometric init should give |grad| ~ 1 (it approximates a distance
        field)."""
        params = init_implicit_net(jax.random.PRNGKey(2), self.cfg)
        x = jax.random.uniform(jax.random.PRNGKey(3), (64, 3), minval=-1, maxval=1)
        g = implicit_gradient(params, x, self.cfg)
        norms = np.asarray(jnp.linalg.norm(g, axis=-1))
        assert 0.5 < norms.mean() < 2.0

    def test_skip_connection_shape(self):
        params = init_implicit_net(jax.random.PRNGKey(0), self.cfg)
        # layer 3 feeds the skip at layer 4: out dim = 256 - 39
        assert params["lin3"]["v"].shape == (256 - 39, 256)
        assert params["lin4"]["v"].shape == (256, 256)

    def test_weight_norm_parameterization(self):
        params = init_implicit_net(jax.random.PRNGKey(0), self.cfg)
        lin = params["lin1"]
        assert set(lin.keys()) == {"v", "g", "b"}
        np.testing.assert_allclose(
            np.asarray(lin["g"]),
            np.linalg.norm(np.asarray(lin["v"]), axis=1),
            rtol=1e-5,
        )

    @pytest.mark.slow
    def test_grad_of_grad_works(self):
        """The eikonal loss differentiates through the SDF spatial gradient."""
        params = init_implicit_net(jax.random.PRNGKey(0), self.cfg)

        def loss(p):
            x = jnp.asarray([[0.1, 0.2, 0.3], [0.5, -0.1, 0.2]])
            g = implicit_gradient(p, x, self.cfg)
            return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

        grads = jax.grad(loss)(params)
        leaf = np.asarray(grads["lin0"]["v"])
        assert np.isfinite(leaf).all()
        assert np.abs(leaf).sum() > 0


class TestRenderAttraction:
    rcfg = RenderNetConfig(multires_view=4)
    acfg = RenderNetConfig(d_out=6, dims=(256,) * 4, multires_view=0)

    def test_render_range_and_shape(self):
        params = init_render_net(jax.random.PRNGKey(0), self.rcfg)
        n = 10
        rgb = render_forward(
            params,
            jnp.zeros((n, 3)),
            jnp.ones((n, 3)),
            jnp.ones((n, 3)),
            jnp.zeros((n, 256)),
            self.rcfg,
        )
        assert rgb.shape == (n, 3)
        out = np.asarray(rgb)
        assert (out >= 0).all() and (out <= 1).all()

    def test_attraction_offsets_around_point(self):
        params = init_attraction_net(jax.random.PRNGKey(0), self.acfg)
        pts = jnp.asarray([[1.0, 2.0, 3.0]])
        lines = attraction_forward(
            params, pts, jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.zeros((1, 256)), self.acfg
        )
        assert lines.shape == (1, 2, 3)
        # endpoints = point + network offsets; at default init offsets are small
        assert np.abs(np.asarray(lines) - np.asarray(pts)[:, None]).max() < 5.0


class TestGlobalJunctions:
    def test_shapes(self):
        cfg = GlobalJunctionsConfig(num_junctions=64)
        params = init_global_junctions(jax.random.PRNGKey(0), cfg)
        assert params["latents"].shape == (64, 256)
        pts = global_junctions_forward(params, cfg)
        assert pts.shape == (64, 3)
        assert np.isfinite(np.asarray(pts)).all()

    def test_latents_std(self):
        cfg = GlobalJunctionsConfig(num_junctions=1024)
        params = init_global_junctions(jax.random.PRNGKey(0), cfg)
        std = float(jnp.std(params["latents"]))
        assert 0.9 < std < 1.1


class TestReducedPrecisionFieldPath:
    """field_compute_dtype=bfloat16 runs the differentiated layer chains at
    reduced precision (the f32 step is HBM-bound — RESULTS.md roofline);
    outputs must stay within the bf16 error band of the f32 path."""

    @pytest.mark.slow  # full-size 8x256 vjp graph: slow CPU compile
    def test_implicit_bf16_close_to_f32(self):
        cfg = ImplicitNetConfig()
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=-1, maxval=1)
        sdf32, feat32, grad32 = implicit_sdf_feat_grad(params, x, cfg)
        sdfb, featb, gradb = implicit_sdf_feat_grad(
            params, x, cfg, compute_dtype=jnp.bfloat16
        )
        assert sdfb.dtype == jnp.float32 and gradb.dtype == jnp.float32
        assert np.abs(np.asarray(sdf32 - sdfb)).max() < 2e-2
        # gradients are O(1) at the geometric init
        assert np.abs(np.asarray(grad32 - gradb)).max() < 8e-2

    @pytest.mark.slow
    def test_implicit_bf16_grad_of_grad_flows(self):
        cfg = ImplicitNetConfig(dims=(32,) * 4, skip_in=(2,), multires=4)
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)

        def eik(p):
            _, _, g = implicit_sdf_feat_grad(p, x, cfg, compute_dtype=jnp.bfloat16)
            return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

        grads = jax.grad(eik)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)

    def test_render_attraction_bf16_close(self):
        rcfg = RenderNetConfig(multires_view=4)
        acfg = RenderNetConfig(d_out=6, multires_view=0)
        rp = init_render_net(jax.random.PRNGKey(0), rcfg)
        ap = init_attraction_net(jax.random.PRNGKey(1), acfg)
        n = 128
        key = jax.random.PRNGKey(2)
        pts, nrm, dirs = jax.random.normal(key, (3, n, 3))
        feats = jax.random.normal(jax.random.PRNGKey(3), (n, 256)) * 0.1
        rgb32 = render_forward(rp, pts, nrm, dirs, feats, rcfg)
        rgbb = render_forward(rp, pts, nrm, dirs, feats, rcfg, compute_dtype=jnp.bfloat16)
        assert np.abs(np.asarray(rgb32 - rgbb)).max() < 2e-2
        l32 = attraction_forward(ap, pts, nrm, dirs, feats, acfg)
        lb = attraction_forward(ap, pts, nrm, dirs, feats, acfg, compute_dtype=jnp.bfloat16)
        assert np.abs(np.asarray(l32 - lb)).max() < 5e-2
