"""DTU surface-eval protocol tests, including the ObsMask/Plane masking
path (reference eval-dtu.py:96-158) — exercised on synthetic geometry
where the correct answer is known analytically."""

import numpy as np
import pytest

from neat_tpu.evaluation.eval_dtu import downsample_points, eval_dtu_points


def _plane_points(n=4000, extent=40.0, z=0.0, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, 3))
    pts[:, 0] = rng.uniform(-extent, extent, n)
    pts[:, 1] = rng.uniform(-extent, extent, n)
    pts[:, 2] = z
    return pts


class TestDownsample:
    def test_radius_enforced(self):
        pts = _plane_points(2000, extent=10.0)
        down = downsample_points(pts, radius=2.0)
        from scipy.spatial import cKDTree

        tree = cKDTree(down)
        pairs = tree.query_pairs(r=2.0 - 1e-9)
        assert len(pairs) == 0
        assert 0 < len(down) < len(pts)


class TestEvalDtuPoints:
    def test_offset_planes_distance(self):
        """Prediction = GT plane shifted by 1.5 -> ACC ~ COMP ~ 1.5."""
        stl = _plane_points(4000, z=0.0, seed=0)
        pred = _plane_points(4000, z=1.5, seed=1)
        res = eval_dtu_points(pred, stl, downsample_radius=0.2)
        # the in-plane nearest-neighbor spacing (~0.5 at this density)
        # adds in quadrature: expect slightly above 1.5, well below 2
        assert 1.5 <= res["accuracy_d2s"] < 1.9
        assert 1.5 <= res["completeness_s2d"] < 1.9
        assert 1.5 <= res["overall"] < 1.9

    def test_obs_mask_excludes_outliers_from_accuracy(self):
        """Outlier prediction points landing OUTSIDE the observation mask
        must not hurt ACC (the whole point of ObsMask filtering,
        reference eval-dtu.py:106-122)."""
        stl = _plane_points(4000, z=0.0, seed=0)
        pred = _plane_points(4000, z=0.0, seed=1)
        outliers = _plane_points(500, extent=10.0, z=150.0, seed=2)
        pred_noisy = np.concatenate([pred, outliers])

        # mask grid covering z in [-5, 5] only
        bb = np.array([[-45.0, -45.0, -5.0], [45.0, 45.0, 5.0]])
        res_grid = 5.0
        shape = tuple((np.ceil((bb[1] - bb[0]) / res_grid)).astype(int) + 1)
        obs = np.ones(shape, dtype=np.uint8)

        masked = eval_dtu_points(
            pred_noisy, stl, obs_mask=obs, bb=bb, res=res_grid,
            downsample_radius=0.2,
        )
        # compare against (a) the same points unmasked with no distance
        # cap (outliers poison ACC) and (b) the outlier-free baseline
        # (masking should recover it)
        unmasked = eval_dtu_points(
            pred_noisy, stl, downsample_radius=0.2, max_dist=1e9
        )
        base = eval_dtu_points(pred, stl, downsample_radius=0.2)
        assert abs(masked["accuracy_d2s"] - base["accuracy_d2s"]) < 0.1
        assert unmasked["accuracy_d2s"] > base["accuracy_d2s"] + 5.0

    def test_ground_plane_filters_completeness(self):
        """GT points below the plane are excluded from COMP
        (reference eval-dtu.py:139-147)."""
        stl_above = _plane_points(2000, z=2.0, seed=0)
        stl_below = _plane_points(2000, z=-50.0, seed=1)
        stl = np.concatenate([stl_above, stl_below])
        pred = _plane_points(2000, z=2.0, seed=2)
        plane = np.array([0.0, 0.0, 1.0, 0.0])  # keep z > 0

        with_plane = eval_dtu_points(
            pred, stl, ground_plane=plane, downsample_radius=0.2, max_dist=1e9
        )
        without = eval_dtu_points(
            pred, stl, downsample_radius=0.2, max_dist=1e9
        )
        # above-plane GT matches the prediction up to sampling spacing;
        # keeping the buried half drags COMP toward the 52-unit offset
        assert with_plane["completeness_s2d"] < 2.0
        assert without["completeness_s2d"] > 10.0
