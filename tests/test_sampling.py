"""Tests for the ray samplers against an analytic sphere SDF."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neat_tpu.core.density import LaplaceDensityParams
from neat_tpu.sampling import (
    UniformSamplerConfig,
    ErrorBoundSamplerConfig,
    uniform_z_vals,
    error_bound_z_vals,
    sample_pdf,
)


def sphere_sdf(pts, r=1.0):
    return jnp.linalg.norm(pts, axis=-1) - r


class TestUniform:
    def test_eval_linspace(self):
        cfg = UniformSamplerConfig(scene_bounding_sphere=3.0, near=0.0, n_samples=8)
        dirs = jnp.asarray([[0.0, 0.0, 1.0]])
        loc = jnp.asarray([[0.0, 0.0, -2.0]])
        z = uniform_z_vals(jax.random.PRNGKey(0), dirs, loc, cfg, training=False)
        np.testing.assert_allclose(np.asarray(z)[0], np.linspace(0, 6, 8), atol=1e-5)

    def test_training_stratified_in_bounds(self):
        cfg = UniformSamplerConfig(n_samples=32)
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
        loc = jnp.zeros((4, 3))
        z = uniform_z_vals(jax.random.PRNGKey(0), dirs, loc, cfg, training=True)
        zz = np.asarray(z)
        assert (zz >= 0).all() and (zz <= 6).all()
        assert (np.diff(zz, axis=1) >= 0).all()  # stratified keeps order


class TestInvertCdf:
    def test_matches_searchsorted_oracle(self, rng):
        """The gather-free masked-reduction formulation must agree with the
        classic searchsorted-right + gather formulation exactly."""
        from neat_tpu.sampling.samplers import _invert_cdf

        r, s, n = 16, 33, 24
        bins = np.sort(rng.rand(r, s).astype(np.float32), axis=1)
        pdf = rng.rand(r, s - 1).astype(np.float32) + 1e-5
        pdf /= pdf.sum(1, keepdims=True)
        cdf = np.concatenate(
            [np.zeros((r, 1), np.float32), np.cumsum(pdf, 1)], axis=1
        ).astype(np.float32)
        u = rng.rand(r, n).astype(np.float32)

        got = np.asarray(_invert_cdf(jnp.asarray(bins), jnp.asarray(cdf), jnp.asarray(u)))

        # oracle: numpy searchsorted right + gathers
        want = np.empty_like(got)
        for i in range(r):
            inds = np.searchsorted(cdf[i], u[i], side="right")
            below = np.maximum(inds - 1, 0)
            above = np.minimum(inds, s - 1)
            cb, ca = cdf[i][below], cdf[i][above]
            bb, ba = bins[i][below], bins[i][above]
            denom = np.where(ca - cb < 1e-5, 1.0, ca - cb)
            want[i] = bb + (u[i] - cb) / denom * (ba - bb)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_duplicate_cdf_values(self):
        """Flat pdf regions (duplicate cdf entries) behave like the oracle."""
        from neat_tpu.sampling.samplers import _invert_cdf

        bins = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0]])
        cdf = jnp.asarray([[0.0, 0.5, 0.5, 0.5, 1.0]])
        u = jnp.asarray([[0.25, 0.5, 0.75]])
        got = np.asarray(_invert_cdf(bins, cdf, u))
        # u=0.5: below = last index with cdf<=0.5 (idx 3, bins 3.0);
        # above = first cdf>0.5 (idx 4, bins 4.0); t = 0 -> 3.0
        np.testing.assert_allclose(got[0], [0.5, 3.0, 3.5], atol=1e-6)


class TestSamplePdf:
    def test_concentrates_on_peak(self):
        bins = jnp.linspace(0, 1, 33)[None].repeat(2, 0)
        w = jnp.zeros((2, 32)).at[:, 16].set(100.0)
        s = sample_pdf(jax.random.PRNGKey(0), bins, w, 64, det=True)
        mid = np.asarray(bins)[0, 16:18].mean()
        assert np.abs(np.asarray(s).mean() - mid) < 0.05


class TestErrorBound:
    cfg = ErrorBoundSamplerConfig(
        scene_bounding_sphere=3.0,
        near=0.0,
        n_samples=16,
        n_samples_eval=32,
        n_samples_extra=8,
        eps=0.1,
        beta_iters=10,
        max_total_iters=3,
    )
    density = LaplaceDensityParams.init(0.1)

    def _run(self, training):
        n = 8
        # rays from z=-2.5 toward origin hit the unit sphere at depth 1.5
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        loc = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
        z, z_eik = error_bound_z_vals(
            jax.random.PRNGKey(0),
            dirs,
            loc,
            lambda p: sphere_sdf(p),
            self.density,
            self.cfg,
            training=training,
        )
        return z, z_eik

    @pytest.mark.slow
    def test_shapes_static(self):
        z, z_eik = self._run(training=True)
        assert z.shape == (8, 16 + 8 + 2)
        assert z_eik.shape == (8, 1)

    @pytest.mark.slow
    def test_sorted_and_bounded(self):
        z, _ = self._run(training=True)
        zz = np.asarray(z)
        assert (np.diff(zz, axis=1) >= 0).all()
        assert zz.min() >= 0.0 and zz.max() <= 6.0 + 1e-5

    @pytest.mark.slow
    def test_concentrates_near_surface(self):
        """Most final samples should land near the sphere crossing (z=1.5)."""
        z, _ = self._run(training=False)
        zz = np.asarray(z)[:, 1:-1]  # drop the near/far anchors
        frac_near = np.mean(np.abs(zz - 1.5) < 0.5)
        assert frac_near > 0.5, f"only {frac_near:.2f} of samples near surface"

    @pytest.mark.slow
    def test_no_gradient_leak(self):
        """z values are constants: no gradient flows into density params."""

        def loss(beta):
            params = LaplaceDensityParams(beta=beta)
            dirs = jnp.asarray([[0.0, 0.0, 1.0]])
            loc = jnp.asarray([[0.0, 0.0, -2.5]])
            z, _ = error_bound_z_vals(
                jax.random.PRNGKey(0), dirs, loc, sphere_sdf, params, self.cfg, True
            )
            return jnp.sum(z)

        g = jax.grad(loss)(jnp.asarray(0.1))
        assert float(g) == 0.0

    def test_jittable(self):
        f = jax.jit(lambda k: self._run(True)[0])
        out = f(jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(out)).all()


class TestBetaGridSearch:
    """beta_search='grid' — the batched log-spaced candidate pass that
    replaces the reference's 10 sequential bisection error-bound evals per
    refinement round (ray_sampler.py:176-185). Both searches pick an
    admissible beta (error <= eps) from [beta0, beta_max]; grid picks the
    smallest admissible candidate, bisection the bisection limit — the
    sampled z distributions must agree behaviorally."""

    base = dict(
        scene_bounding_sphere=3.0,
        near=0.0,
        n_samples=16,
        n_samples_eval=32,
        n_samples_extra=8,
        eps=0.1,
        beta_iters=10,
        max_total_iters=3,
    )
    density = LaplaceDensityParams.init(0.1)

    def _run(self, beta_search, training=False):
        cfg = ErrorBoundSamplerConfig(**self.base, beta_search=beta_search)
        n = 8
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        loc = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
        z, z_eik = error_bound_z_vals(
            jax.random.PRNGKey(0), dirs, loc, sphere_sdf, self.density,
            cfg, training=training,
        )
        return np.asarray(z), np.asarray(z_eik)

    @pytest.mark.slow
    def test_valid_and_concentrated(self):
        z, z_eik = self._run("grid")
        assert (np.diff(z, axis=1) >= 0).all()
        assert z.min() >= 0.0 and z.max() <= 6.0 + 1e-5
        inner = z[:, 1:-1]
        frac_near = np.mean(np.abs(inner - 1.5) < 0.5)
        assert frac_near > 0.5, f"only {frac_near:.2f} of samples near surface"

    @pytest.mark.slow
    def test_matches_bisect_distribution(self):
        """Deterministic (eval) draws from the two searches must place
        samples at nearly the same depths: both betas satisfy the same
        error bound, so the final CDFs are close."""
        z_grid, _ = self._run("grid")
        z_bis, _ = self._run("bisect")
        # compare the deterministic sample positions directly
        diff = np.abs(z_grid - z_bis)
        assert np.median(diff) < 0.05, f"median |dz| = {np.median(diff):.4f}"
        assert np.mean(diff) < 0.15, f"mean |dz| = {np.mean(diff):.4f}"


class TestAssignment:
    def test_single_column_assigns_best_row(self):
        """One live column: second_v is -inf, so the bid saturates; the
        cheapest row must still win (regression: the +inf bid used to be
        rejected by the isfinite gate and NOTHING was ever assigned)."""
        from neat_tpu.assignment.matching import auction_assignment

        cost = jnp.asarray(np.array([[3.0], [1.0], [2.0]], np.float32))
        col, valid, _ = auction_assignment(
            cost, jnp.ones(3, bool), jnp.ones(1, bool), n_iters=16
        )
        assert np.asarray(valid).tolist() == [False, True, False]
        assert int(col[1]) == 0

    def test_auction_matches_scipy_square(self):
        from neat_tpu.assignment import masked_assignment
        from scipy.optimize import linear_sum_assignment

        rng = np.random.RandomState(0)
        for trial in range(5):
            cost = rng.rand(20, 20).astype(np.float32)
            col, valid = masked_assignment(jnp.asarray(cost), method="auction")
            col = np.asarray(col)
            assert np.asarray(valid).all()
            # permutation property
            assert len(set(col.tolist())) == 20
            ri, ci = linear_sum_assignment(cost)
            opt = cost[ri, ci].sum()
            got = cost[np.arange(20), col].sum()
            assert got <= opt * 1.05 + 1e-3, f"auction cost {got} vs opt {opt}"

    def test_auction_rectangular_with_masks(self):
        from neat_tpu.assignment import masked_assignment

        rng = np.random.RandomState(1)
        cost = rng.rand(10, 30).astype(np.float32)
        row_mask = jnp.asarray([True] * 6 + [False] * 4)
        col, valid = masked_assignment(jnp.asarray(cost), row_mask, method="auction")
        v = np.asarray(valid)
        assert v[:6].all() and not v[6:].any()
        c = np.asarray(col)[:6]
        assert len(set(c.tolist())) == 6

    def test_callback_matches_scipy(self):
        from neat_tpu.assignment import masked_assignment
        from scipy.optimize import linear_sum_assignment

        rng = np.random.RandomState(2)
        cost = rng.rand(8, 12).astype(np.float32)
        col, valid = masked_assignment(jnp.asarray(cost), method="callback")
        ri, ci = linear_sum_assignment(cost)
        np.testing.assert_array_equal(np.asarray(col), ci)
        assert np.asarray(valid).all()

    def test_more_rows_than_cols(self):
        from neat_tpu.assignment import masked_assignment

        rng = np.random.RandomState(3)
        cost = rng.rand(10, 4).astype(np.float32)
        col, valid = masked_assignment(jnp.asarray(cost), method="auction")
        v = np.asarray(valid)
        assert v.sum() == 4  # only 4 rows can be assigned
        c = np.asarray(col)[v]
        assert len(set(c.tolist())) == 4

    def test_dead_columns_never_matched(self):
        """Regression: rows must not come back valid matched to masked
        columns when live columns are scarce."""
        from neat_tpu.assignment import masked_assignment

        rng = np.random.RandomState(4)
        cost = rng.rand(8, 6).astype(np.float32)
        # zero live columns
        col, valid = masked_assignment(
            jnp.asarray(cost),
            col_mask=jnp.zeros((6,), dtype=bool),
            method="auction",
        )
        assert not np.asarray(valid).any()
        # one live column -> exactly one valid row, matched to it
        cm = jnp.asarray([False, False, True, False, False, False])
        col, valid = masked_assignment(jnp.asarray(cost), col_mask=cm, method="auction")
        v = np.asarray(valid)
        assert v.sum() == 1
        assert np.asarray(col)[v][0] == 2


class TestClustering:
    def test_two_clusters_and_noise(self):
        from neat_tpu.assignment import dbscan_cluster_means

        pts = np.array(
            [
                [0.0, 0.0, 0.0],
                [0.005, 0.0, 0.0],
                [0.0, 0.004, 0.0],
                [1.0, 1.0, 1.0],
                [1.0, 1.0, 1.005],
                [5.0, 5.0, 5.0],  # noise: no neighbor
            ],
            dtype=np.float32,
        )
        means, valid = dbscan_cluster_means(jnp.asarray(pts), eps=0.01)
        v = np.asarray(valid)
        m = np.asarray(means)
        assert v.sum() == 2
        reps = np.nonzero(v)[0]
        np.testing.assert_allclose(m[reps[0]], pts[:3].mean(0), atol=1e-5)
        np.testing.assert_allclose(m[reps[1]], pts[3:5].mean(0), atol=1e-5)

    def test_long_chain_single_cluster(self):
        """Regression: a chain whose graph diameter exceeds the iteration
        cap must still collapse to one cluster (pointer jumping)."""
        from neat_tpu.assignment import dbscan_cluster_means
        import jax.numpy as jnp

        pts = np.zeros((200, 3), dtype=np.float32)
        pts[:, 0] = np.arange(200) * 0.009  # eps 0.01 chain, diameter 199
        means, valid = dbscan_cluster_means(jnp.asarray(pts), eps=0.01)
        v = np.asarray(valid)
        assert v.sum() == 1
        np.testing.assert_allclose(
            np.asarray(means)[v][0], pts.mean(0), atol=1e-4
        )

    @pytest.mark.slow
    def test_matches_sklearn(self):
        from neat_tpu.assignment import dbscan_cluster_means
        from sklearn.cluster import DBSCAN

        rng = np.random.RandomState(0)
        # clumps of points
        centers = rng.rand(5, 3)
        pts = (centers[:, None] + rng.randn(5, 10, 3) * 0.002).reshape(-1, 3).astype(
            np.float32
        )
        means, valid = dbscan_cluster_means(jnp.asarray(pts), eps=0.01)
        ours = np.sort(np.asarray(means)[np.asarray(valid)], axis=0)

        labels = DBSCAN(eps=0.01, min_samples=2).fit(pts).labels_
        ref = np.sort(
            np.stack([pts[labels == i].mean(0) for i in range(labels.max() + 1)]),
            axis=0,
        )
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-4)
