"""Golden tests for the core math layer.

Golden values are computed from the formulas cited in SURVEY.md §2 (C7, C8,
C16, volume rendering at neat_wfr_rend_a.py:540-554), independently in numpy —
not by running the reference code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neat_tpu.core import (
    positional_encoding,
    encoding_dim,
    LaplaceDensityParams,
    laplace_density,
    get_beta,
    lift,
    get_camera_params,
    project2d,
    quat_to_rot,
    rot_to_quat,
    get_sphere_intersections,
    psnr,
    render_weights_from_density,
)
from neat_tpu.core.camera import load_k_rt_from_p


class TestEmbedder:
    def test_dim(self):
        assert encoding_dim(6, 3) == 39
        assert encoding_dim(4, 3) == 27
        assert encoding_dim(0, 3) == 3

    def test_values_and_order(self, rng):
        x = jnp.asarray(rng.randn(5, 3).astype(np.float32))
        out = positional_encoding(x, 2)
        assert out.shape == (5, 15)
        np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)
        # bands 2**0, 2**1; order per freq: sin, cos
        np.testing.assert_allclose(out[:, 3:6], np.sin(np.asarray(x)), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[:, 6:9], np.cos(np.asarray(x)), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[:, 9:12], np.sin(2 * np.asarray(x)), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[:, 12:15], np.cos(2 * np.asarray(x)), rtol=1e-5, atol=1e-6)

    def test_identity_when_disabled(self, rng):
        x = jnp.asarray(rng.randn(4, 3).astype(np.float32))
        np.testing.assert_array_equal(positional_encoding(x, 0), x)


class TestLaplaceDensity:
    def test_formula(self, rng):
        params = LaplaceDensityParams.init(0.1)
        s = jnp.asarray(rng.randn(100).astype(np.float32))
        beta = 0.1 + 1e-4
        expected = (1 / beta) * (
            0.5 + 0.5 * np.sign(np.asarray(s)) * np.expm1(-np.abs(np.asarray(s)) / beta)
        )
        np.testing.assert_allclose(
            np.asarray(laplace_density(s, params)), expected, rtol=1e-5, atol=1e-5
        )

    def test_beta_floor_abs(self):
        params = LaplaceDensityParams(beta=jnp.asarray(-0.05))
        assert np.isclose(float(get_beta(params)), 0.05 + 1e-4)

    def test_limits(self):
        params = LaplaceDensityParams.init(0.01)
        # deep inside (sdf << 0): density -> alpha = 1/beta
        d_in = float(laplace_density(jnp.asarray(-1.0), params))
        assert np.isclose(d_in, 1.0 / (0.01 + 1e-4), rtol=1e-4)
        # far outside: density -> 0
        d_out = float(laplace_density(jnp.asarray(1.0), params))
        assert d_out < 1e-6
        # at surface: alpha/2
        d_zero = float(laplace_density(jnp.asarray(0.0), params))
        assert np.isclose(d_zero, 0.5 / (0.01 + 1e-4), rtol=1e-4)

    def test_explicit_beta_override(self):
        params = LaplaceDensityParams.init(0.1)
        out = laplace_density(jnp.asarray(0.0), params, beta=jnp.asarray(0.5))
        assert np.isclose(float(out), 0.5 / 0.5)


class TestCamera:
    def test_lift_no_skew(self):
        k = jnp.asarray(
            [[100.0, 0.0, 50.0], [0.0, 100.0, 40.0], [0.0, 0.0, 1.0]]
        )
        x = jnp.asarray([[150.0]])
        y = jnp.asarray([[140.0]])
        z = jnp.asarray([[2.0]])
        out = lift(x, y, z, k[None])
        # (x - cx)/fx * z = 2, (y - cy)/fy * z = 2
        np.testing.assert_allclose(np.asarray(out)[0, 0], [2.0, 2.0, 2.0, 1.0], rtol=1e-6)

    def test_lift_skew_roundtrip(self, rng):
        k = np.array([[120.0, 3.0, 64.0], [0.0, 110.0, 60.0], [0.0, 0.0, 1.0]], np.float32)
        pts_cam = rng.randn(10, 3).astype(np.float32)
        pts_cam[:, 2] = np.abs(pts_cam[:, 2]) + 1.0
        proj = (k @ pts_cam.T).T
        uv = proj[:, :2] / proj[:, 2:]
        out = lift(
            jnp.asarray(uv[None, :, 0]),
            jnp.asarray(uv[None, :, 1]),
            jnp.asarray(pts_cam[None, :, 2]),
            jnp.asarray(k)[None],
        )
        np.testing.assert_allclose(np.asarray(out)[0, :, :3], pts_cam, rtol=1e-4, atol=1e-4)

    def test_rays_through_pixels(self, rng):
        # pose = identity: rays from origin through the image plane
        k = jnp.asarray(
            [[100.0, 0.0, 50.0], [0.0, 100.0, 50.0], [0.0, 0.0, 1.0]]
        )
        pose = jnp.eye(4)
        uv = jnp.asarray([[[50.0, 50.0], [150.0, 50.0]]])
        dirs, loc = get_camera_params(uv, pose[None], k[None])
        np.testing.assert_allclose(np.asarray(loc)[0], [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(dirs)[0, 0], [0, 0, 1], atol=1e-6)
        expected = np.array([1.0, 0.0, 1.0]) / np.sqrt(2)
        np.testing.assert_allclose(np.asarray(dirs)[0, 1], expected, atol=1e-6)

    def test_project_unproject_consistency(self, rng):
        # build a nontrivial cam2world pose; project2d(K, R, T) with
        # [R|T] = pose^-1 must invert get_camera_params ray generation
        q = rng.randn(4).astype(np.float32)
        q /= np.linalg.norm(q)
        rot = np.asarray(quat_to_rot(jnp.asarray(q[None])))[0]
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = rot
        c2w[:3, 3] = [0.3, -0.2, 0.5]
        k = np.array([[90.0, 0.0, 32.0], [0.0, 85.0, 36.0], [0.0, 0.0, 1.0]], np.float32)

        uv = rng.rand(1, 7, 2).astype(np.float32) * 64
        dirs, loc = get_camera_params(jnp.asarray(uv), jnp.asarray(c2w[None]), jnp.asarray(k[None]))
        depth = 1.0 + rng.rand(7, 1).astype(np.float32)
        pts = np.asarray(loc)[0] + np.asarray(dirs)[0] * depth * 1.0

        w2c = np.linalg.inv(c2w)
        uv_back = project2d(
            jnp.asarray(k), jnp.asarray(w2c[:3, :3]), jnp.asarray(w2c[:3, 3]), jnp.asarray(pts)
        )
        np.testing.assert_allclose(np.asarray(uv_back), uv[0], rtol=1e-3, atol=1e-3)

    def test_project2d_sign_safe(self):
        # points exactly at the camera plane (z=0) must not produce inf/nan
        k = jnp.eye(3)
        r = jnp.eye(3)
        t = jnp.zeros(3)
        pts = jnp.asarray([[1.0, 1.0, 0.0]])
        out = np.asarray(project2d(k, r, t, pts))
        assert np.isfinite(out).all()

    def test_quat_rot_roundtrip(self, rng):
        q = rng.randn(5, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q[q[:, 0] < 0] *= -1  # rot_to_quat returns the w>0 branch
        r = quat_to_rot(jnp.asarray(q))
        q2 = rot_to_quat(r)
        np.testing.assert_allclose(np.asarray(q2), q, rtol=1e-4, atol=1e-4)

    def test_quat_pose_matches_matrix_pose(self, rng):
        q = rng.randn(4).astype(np.float32)
        q /= np.linalg.norm(q)
        loc = rng.randn(3).astype(np.float32)
        pose7 = jnp.asarray(np.concatenate([q, loc])[None])
        rot = np.asarray(quat_to_rot(jnp.asarray(q[None])))[0]
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = rot
        c2w[:3, 3] = loc
        k = jnp.asarray(np.array([[90, 0, 32], [0, 85, 36], [0, 0, 1]], np.float32))
        uv = jnp.asarray(rng.rand(1, 5, 2).astype(np.float32) * 64)
        d1, l1 = get_camera_params(uv, pose7, k[None])
        d2, l2 = get_camera_params(uv, jnp.asarray(c2w[None]), k[None])
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)

    def test_sphere_intersections(self):
        cam = jnp.asarray([[0.0, 0.0, -2.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        out = np.asarray(get_sphere_intersections(cam, d, radius=1.0))
        np.testing.assert_allclose(out[0], [1.0, 3.0], atol=1e-5)

    def test_psnr(self):
        a = jnp.ones((4, 3)) * 0.5
        b = jnp.ones((4, 3)) * 0.6
        expected = -10 * np.log(0.01) / np.log(10)
        assert np.isclose(float(psnr(a, b)), expected, rtol=1e-4)

    def test_load_k_rt_from_p(self, rng):
        # compose a known P = K [R | t] and check decomposition
        k = np.array([[100.0, 2.0, 48.0], [0, 95.0, 52.0], [0, 0, 1]])
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        r = np.asarray(quat_to_rot(jnp.asarray(q[None], dtype=jnp.float32)))[0].astype(np.float64)
        c = rng.randn(3)
        t = -r @ c
        p = k @ np.concatenate([r, t[:, None]], axis=1)
        intr, pose = load_k_rt_from_p(p)
        np.testing.assert_allclose(intr[:3, :3], k, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pose[:3, :3], r.T, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pose[:3, 3], c, rtol=1e-4, atol=1e-4)


class TestVolumeRendering:
    def test_weights_formula(self, rng):
        z = np.sort(rng.rand(4, 8).astype(np.float32), axis=1)
        dens = rng.rand(4, 8).astype(np.float32)
        w = np.asarray(render_weights_from_density(jnp.asarray(z), jnp.asarray(dens)))

        dists = np.concatenate([z[:, 1:] - z[:, :-1], np.full((4, 1), 1e10, np.float32)], 1)
        fe = dists * dens
        shifted = np.concatenate([np.zeros((4, 1), np.float32), fe[:, :-1]], 1)
        alpha = 1 - np.exp(-fe)
        trans = np.exp(-np.cumsum(shifted, 1))
        np.testing.assert_allclose(w, alpha * trans, rtol=1e-4, atol=1e-6)

    def test_weights_sum_to_one_when_opaque(self):
        # huge density -> first sample absorbs everything
        z = jnp.linspace(0, 1, 16)[None]
        dens = jnp.full((1, 16), 1e8)
        w = np.asarray(render_weights_from_density(z, dens))
        assert np.isclose(w.sum(), 1.0, atol=1e-4)
        assert np.isclose(w[0, 0], 1.0, atol=1e-4)

    def test_weights_nonnegative_bounded(self, rng):
        z = np.sort(rng.rand(16, 32).astype(np.float32), axis=1)
        dens = np.abs(rng.randn(16, 32)).astype(np.float32) * 10
        w = np.asarray(render_weights_from_density(jnp.asarray(z), jnp.asarray(dens)))
        assert (w >= 0).all()
        assert (w.sum(1) <= 1 + 1e-5).all()
