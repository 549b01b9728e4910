"""Tests for the Pallas fused-SDF kernel (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neat_tpu.fields.mlp import ImplicitNetConfig, init_implicit_net, implicit_sdf
from neat_tpu.ops.fused_sdf import fused_sdf_eval, supports_fused_sdf


class TestFusedSdf:
    cfg = ImplicitNetConfig()

    def test_supports_guard(self):
        assert supports_fused_sdf(self.cfg)
        assert not supports_fused_sdf(ImplicitNetConfig(dims=(64,) * 4))
        assert not supports_fused_sdf(ImplicitNetConfig(skip_in=()))

    def test_matches_reference_bf16(self, rng):
        params = init_implicit_net(jax.random.PRNGKey(0), self.cfg)
        pts = jnp.asarray(rng.randn(300, 3).astype(np.float32))
        ref = np.asarray(
            implicit_sdf(params, pts, self.cfg, compute_dtype=jnp.bfloat16)
        )[:, 0]
        fused = np.asarray(fused_sdf_eval(params, pts, self.cfg, interpret=True))
        assert fused.shape == (300,)
        np.testing.assert_allclose(fused, ref, atol=2e-2, rtol=2e-2)

    def test_matches_reference_f32_loosely(self, rng):
        params = init_implicit_net(jax.random.PRNGKey(1), self.cfg)
        pts = jnp.asarray(rng.rand(64, 3).astype(np.float32) * 2 - 1)
        ref = np.asarray(implicit_sdf(params, pts, self.cfg))[:, 0]
        fused = np.asarray(fused_sdf_eval(params, pts, self.cfg, interpret=True))
        # bf16 matmuls: relative error ~1e-2 on unit-scale sdf values
        np.testing.assert_allclose(fused, ref, atol=3e-2, rtol=3e-2)

    def test_clamp_applied(self, rng):
        params = init_implicit_net(jax.random.PRNGKey(0), self.cfg)
        far = jnp.asarray([[2.9, 0.0, 0.0]] * 4)
        fused = np.asarray(fused_sdf_eval(params, far, self.cfg, interpret=True))
        clamp = self.cfg.sphere_scale * (self.cfg.sdf_bounding_sphere - 2.9)
        assert (fused <= clamp + 1e-4).all()


class TestFusedField:
    """Fused main-pass kernel (ops/fused_field.py) vs the XLA path, in
    interpret mode on CPU. The f32 kernel must agree to float tolerance in
    BOTH the forward outputs and the full parameter/input gradients
    (including the second-order terms through the inner SDF gradient)."""

    icfg = ImplicitNetConfig()
    from neat_tpu.fields.mlp import RenderNetConfig as _R

    rcfg = _R(multires_view=4)
    acfg = _R(d_out=6, multires_view=0)

    def _params(self):
        from neat_tpu.fields.mlp import init_render_net, init_attraction_net

        k = jax.random.PRNGKey(0)
        return {
            "implicit": init_implicit_net(jax.random.fold_in(k, 1), self.icfg),
            "rendering": init_render_net(jax.random.fold_in(k, 2), self.rcfg),
            "attraction": init_attraction_net(jax.random.fold_in(k, 3), self.acfg),
        }

    def _inputs(self, n=300):
        k = jax.random.PRNGKey(7)
        x = jax.random.uniform(jax.random.fold_in(k, 1), (n, 3), minval=-1, maxval=1)
        d = jax.random.normal(jax.random.fold_in(k, 2), (n, 3))
        return x, d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def test_supports_guard(self):
        from neat_tpu.ops.fused_field import supports_fused_field

        assert supports_fused_field(self.icfg, self.rcfg, self.acfg)
        assert not supports_fused_field(
            ImplicitNetConfig(dims=(64,) * 4), self.rcfg, self.acfg
        )
        assert not supports_fused_field(
            self.icfg, self._R(multires_view=4, mode="nerf"), self.acfg
        )

    @pytest.mark.slow  # full-size nested-vjp graphs: slow CPU compile
    def test_forward_and_grads_match_xla(self):
        from neat_tpu.fields.mlp import (
            implicit_sdf_feat_grad,
            render_forward,
            attraction_forward,
        )
        from neat_tpu.ops.fused_field import fused_field_eval

        params = self._params()
        x, d = self._inputs()

        sdf_r, feats_r, grads_r = implicit_sdf_feat_grad(
            params["implicit"], x, self.icfg
        )
        rgb_r = render_forward(params["rendering"], x, grads_r, d, feats_r, self.rcfg)
        att_r = attraction_forward(
            params["attraction"], x, grads_r, d, feats_r, self.acfg
        )
        sdf_k, grads_k, rgb_k, lines_k = fused_field_eval(
            params, x, d, self.icfg, self.rcfg, compute_dtype="float32",
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(sdf_k), np.asarray(sdf_r), atol=2e-5)
        np.testing.assert_allclose(np.asarray(grads_k), np.asarray(grads_r), atol=2e-4)
        np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_r), atol=2e-5)
        np.testing.assert_allclose(np.asarray(lines_k), np.asarray(att_r), atol=2e-4)

        def loss_xla(params):
            sdf, feats, grads = implicit_sdf_feat_grad(params["implicit"], x, self.icfg)
            rgb = render_forward(params["rendering"], x, grads, d, feats, self.rcfg)
            att = attraction_forward(params["attraction"], x, grads, d, feats, self.acfg)
            return (
                jnp.mean(sdf**2)
                + jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)
                + jnp.mean(rgb)
                + jnp.mean(jnp.abs(att))
            )

        def loss_fused(params):
            sdf, grads, rgb, lines = fused_field_eval(
                params, x, d, self.icfg, self.rcfg, compute_dtype="float32",
                interpret=True,
            )
            return (
                jnp.mean(sdf**2)
                + jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)
                + jnp.mean(rgb)
                + jnp.mean(jnp.abs(lines))
            )

        gx = jax.grad(loss_xla)(params)
        gf = jax.grad(loss_fused)(params)
        for px, pf in zip(
            jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gf)
        ):
            scale = np.abs(np.asarray(px)).max() + 1e-8
            err = np.abs(np.asarray(px) - np.asarray(pf)).max() / scale
            assert err < 1e-3, err
