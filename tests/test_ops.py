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
