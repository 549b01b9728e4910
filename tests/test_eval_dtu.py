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


class TestMeshToPointProtocol:
    """The reference mesh->points conversion (eval-dtu.py:46-71):
    deterministic per-triangle barycentric grid at the downsample density
    plus all vertices."""

    def test_grid_sample_density_and_vertices(self):
        from neat_tpu.viz.mesh import grid_sample_mesh

        # one large right triangle in the z=0 plane, legs 10 x 10
        verts = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0]], dtype=np.float64)
        faces = np.array([[0, 1, 2]])
        pts = grid_sample_mesh(verts, faces, density=0.2)
        # all vertices present (reference concatenates them)
        for v in verts:
            assert np.any(np.all(pts == v, axis=-1))
        # deterministic
        np.testing.assert_array_equal(pts, grid_sample_mesh(verts, faces, 0.2))
        # grid samples lie inside the triangle and cover it at ~density
        inner = pts[3:]
        assert np.all(inner[:, 2] == 0)
        assert np.all(inner.sum(-1) <= 10 + 1e-9) and np.all(inner[:, :2] >= 0)
        # target spacing 0.2 over a 50-area triangle -> ~1250 cells; the
        # n=floor(l/thr) grid yields the same order of magnitude
        assert 800 < len(inner) < 3000
        from scipy.spatial import cKDTree

        d, _ = cKDTree(inner).query(inner, k=2)
        assert np.median(d[:, 1]) < 0.45  # neighbors at ~density spacing

    def test_zero_area_triangles_skipped(self):
        from neat_tpu.viz.mesh import grid_sample_mesh

        verts = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], dtype=np.float64)
        faces = np.array([[0, 1, 2]])  # collinear
        pts = grid_sample_mesh(verts, faces, density=0.1)
        assert len(pts) == 3  # only the vertices


class TestLargestComponent:
    def test_keeps_biggest_area_component(self):
        from neat_tpu.viz.mesh import largest_component

        # small triangle (area 0.5) + big quad (2 triangles, area 50)
        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0],
             [5, 5, 0], [15, 5, 0], [15, 10, 0], [5, 10, 0]],
            dtype=np.float64,
        )
        faces = np.array([[0, 1, 2], [3, 4, 5], [3, 5, 6]])
        kv, kf = largest_component(verts, faces)
        assert len(kv) == 4 and len(kf) == 2
        assert kv.min(0)[0] == 5.0  # the quad survived
        # faces reindexed into the kept vertex set
        assert kf.max() < len(kv)

    def test_empty_faces_passthrough(self):
        from neat_tpu.viz.mesh import largest_component

        verts = np.zeros((5, 3))
        faces = np.zeros((0, 3), dtype=np.int64)
        kv, kf = largest_component(verts, faces)
        assert len(kv) == 5 and len(kf) == 0


class TestScanNetProtocol:
    """eval-lsr-scannet.py:42-140: x/scale + offset map, voxel-0.02 GT,
    no prediction downsample, Prec/Recall/F-score at 0.05."""

    def test_voxel_downsample_centroids(self):
        from neat_tpu.evaluation.eval_lsr import voxel_downsample

        pts = np.array(
            [[0.001, 0.001, 0.001], [0.009, 0.009, 0.009],  # same voxel
             [0.5, 0.5, 0.5]]
        )
        out = voxel_downsample(pts, 0.02)
        assert len(out) == 2
        np.testing.assert_allclose(sorted(out[:, 0]), [0.005, 0.5])

    def test_perfect_prediction_scores_one(self, tmp_path):
        from neat_tpu.evaluation.eval_lsr import eval_scannet_lines

        rng = np.random.default_rng(0)
        # GT vertices along two segments in world meters
        a = np.stack([np.linspace(0, 1, 200), np.zeros(200), np.zeros(200)], -1)
        b = np.stack([np.zeros(150), np.linspace(0, 1, 150), np.ones(150)], -1)
        gt = np.concatenate([a, b])
        scale, offset = 0.5, np.array([1.0, 2.0, 3.0])
        # predictions in the normalized frame: x_norm = (x_world - offset)*scale
        lines_w = np.array([[[0, 0, 0], [1, 0, 0]], [[0, 0, 1], [0, 1, 1]]], float)
        lines_n = (lines_w - offset) * scale
        npz = tmp_path / "pred.npz"
        np.savez(npz, lines3d=lines_n)

        out = eval_scannet_lines(str(npz), gt, scale, offset)
        assert out["precision"] == 1.0 and out["recall"] == 1.0
        assert out["fscore"] == 1.0
        assert out["accuracy_d2s"] < 0.01 and out["completeness_s2d"] < 0.01

    def test_wrong_prediction_scores_zero_precision(self, tmp_path):
        from neat_tpu.evaluation.eval_lsr import eval_scannet_lines

        gt = np.zeros((100, 3))
        lines_n = np.array([[[5.0, 5, 5], [6, 5, 5]]])
        npz = tmp_path / "pred.npz"
        np.savez(npz, lines3d=lines_n)
        out = eval_scannet_lines(str(npz), gt, 1.0, np.zeros(3))
        assert out["precision"] == 0.0
