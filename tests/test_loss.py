"""Unit tests for loss components and variants."""

import numpy as np
import jax
import jax.numpy as jnp

from neat_tpu.model.loss import (
    LossConfig,
    neat_loss,
    scale_shift_invariant_loss,
    _line_l1,
)


class TestLineLoss:
    def test_endpoint_order_invariance(self):
        pred = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        gt_fwd = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        gt_rev = jnp.asarray([[10.0, 10.0, 0.0, 0.0]])
        w = jnp.ones((1,))
        l1, _ = _line_l1(pred, gt_fwd, w, 100.0)
        l2, _ = _line_l1(pred, gt_rev, w, 100.0)
        assert float(l1) == float(l2) == 0.0

    def test_gate_excludes_far_lines(self):
        pred = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [500.0, 500.0, 900.0, 900.0]])
        gt = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0]])
        w = jnp.ones((2,))
        total, per_ray = _line_l1(pred, gt, w, 100.0)
        # far line is gated out: total equals the near line's (zero) loss
        assert float(total) == 0.0
        assert float(per_ray[1]) > 100.0


class TestSSILoss:
    def test_invariant_to_affine(self, rng):
        d = jnp.asarray(rng.rand(256).astype(np.float32) + 0.5)
        pred = 3.7 * d + 1.2  # scaled/shifted prediction of the target
        loss = scale_shift_invariant_loss(pred, d)
        assert float(loss) < 1e-8

    def test_penalizes_structure_error(self, rng):
        d = jnp.asarray(rng.rand(256).astype(np.float32))
        noise = jnp.asarray(rng.rand(256).astype(np.float32))
        loss = scale_shift_invariant_loss(noise, d)
        assert float(loss) > 1e-3

    def test_masked(self, rng):
        d = jnp.asarray(rng.rand(64).astype(np.float32) + 1)
        pred = 2 * d
        # corrupt masked-out entries only
        pred = pred.at[:32].set(99.0)
        mask = jnp.arange(64) >= 32
        loss = scale_shift_invariant_loss(pred, d, mask)
        assert float(loss) < 1e-8


class TestLossVariants:
    def _outputs(self, rng):
        r = 32
        return {
            "rgb_values": jnp.asarray(rng.rand(r, 3).astype(np.float32)),
            "grad_theta": jnp.asarray(rng.randn(r, 3).astype(np.float32)),
            "depth": jnp.asarray(rng.rand(r).astype(np.float32) * 3),
        }, {
            "rgb": jnp.asarray(rng.rand(r, 3).astype(np.float32)),
            "depth": jnp.asarray(rng.rand(r).astype(np.float32) * 3),
        }

    def test_depth_l1_variant(self, rng):
        out, gt = self._outputs(rng)
        cfg = LossConfig(depth_weight=0.5)
        losses = neat_loss(out, gt, cfg)
        assert "depth_loss" in losses
        expected = float(jnp.mean(jnp.abs(out["depth"] - gt["depth"])))
        assert np.isclose(float(losses["depth_loss"]), expected, rtol=1e-5)

    def test_depth_ssi_variant(self, rng):
        out, gt = self._outputs(rng)
        cfg = LossConfig(depth_weight=0.5, depth_loss_kind="ssi")
        losses = neat_loss(out, gt, cfg)
        assert np.isfinite(float(losses["depth_loss"]))

    def test_no_depth_without_weight(self, rng):
        out, gt = self._outputs(rng)
        losses = neat_loss(out, gt, LossConfig())
        assert "depth_loss" not in losses
