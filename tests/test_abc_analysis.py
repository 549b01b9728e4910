"""GT-detectability analysis tools (reference evaluation/abc-analysis.py):
the in-repo OBJ reader + Moller-Trumbore ray caster, and the full
per-view matching sweep on the hermetic synthetic scene."""

import numpy as np

from neat_tpu.evaluation.abc_analysis import (
    analyze_detectability,
    load_obj_mesh,
    ray_cast_first_hit,
)


def test_load_obj_mesh_fan_triangulation(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n"          # quad -> 2 triangles
        "f 1/1/1 2/2/2 3/3/3\n"  # v/vt/vn indices
    )
    verts, faces = load_obj_mesh(str(p))
    assert verts.shape == (4, 3)
    assert faces.tolist() == [[0, 1, 2], [0, 2, 3], [0, 1, 2]]


def test_ray_cast_first_hit_and_miss():
    # two parallel triangles at z=1 and z=2: the caster must return the
    # FIRST hit, and +inf for rays that miss both
    verts = np.array(
        [[0, 0, 1], [1, 0, 1], [0, 1, 1],
         [0, 0, 2], [1, 0, 2], [0, 1, 2]],
        dtype=np.float64,
    )
    faces = np.array([[3, 4, 5], [0, 1, 2]])  # far triangle listed first
    dirs = np.array([[0.2, 0.2, 1.0], [5.0, 5.0, 1.0]])
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.zeros((2, 3))
    t = ray_cast_first_hit(origins, dirs, verts, faces)
    hit = origins[0] + dirs[0] * t[0]
    np.testing.assert_allclose(hit[2], 1.0, rtol=1e-12)  # near, not far
    assert np.isinf(t[1])


def test_detectability_sweep_on_synthetic_scene(tmp_path):
    """The synthetic scene's HAWP detections are projected GT, so the
    sweep must cover every junction and line with a positive per-view
    hit rate (accumulator semantics of reference abc-analysis.py:110-183)."""
    from neat_tpu.data.datasets import load_blender_scene
    from neat_tpu.data.synthetic import generate_scene

    generate_scene(str(tmp_path / "toy"), n_views=4, res=(48, 48))
    scene = load_blender_scene(
        "toy", (48, 48), data_root=str(tmp_path), distance_threshold=1.0
    )
    res = analyze_detectability(scene, str(tmp_path / "toy"), verbose=False)
    n_j = res["junctions3d"].shape[0]
    n_l = res["lines3d"].shape[0]
    assert n_j > 0 and n_l > 0
    assert res["junctions_covered"] == n_j
    assert res["lines_covered"] == n_l
    assert 0.0 < res["junction_hit_rate_per_view"] <= 1.0
    assert 0.0 < res["line_hit_rate_per_view"] <= 1.0
    assert res["junction_hits"].shape == (n_j,)
