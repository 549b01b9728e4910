"""Hermetic end-to-end pipeline test on the synthetic cuboid scene:
generate data -> pack scene -> train a tiny model -> finalize a wireframe
-> run the ABC eval protocol. The CPU analogue of the reference's manual
toy-scene workflow (SURVEY.md §4)."""

import json
import os
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # trains end-to-end; opt-in via -m slow

from neat_tpu.data.synthetic import generate_scene
from neat_tpu.data.datasets import load_blender_scene
from neat_tpu.model.neat import NeatConfig, init_neat
from neat_tpu.model.loss import LossConfig
from neat_tpu.fields.mlp import ImplicitNetConfig, GlobalJunctionsConfig
from neat_tpu.sampling.samplers import ErrorBoundSamplerConfig
from neat_tpu.train.step import init_train_state, make_train_step
from neat_tpu.train.runner import scene_to_device


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synthetic")
    generate_scene(str(d / "toy"), n_views=8, res=(64, 64))
    return str(d)


@pytest.fixture(scope="module")
def scene(scene_dir):
    return load_blender_scene(
        "toy", (64, 64), data_root=scene_dir, distance_threshold=3.0, max_verts=16
    )


def tiny_cfg():
    return NeatConfig(
        scene_bounding_sphere=3.0,
        implicit=ImplicitNetConfig(
            dims=(32,) * 4, skip_in=(2,), multires=4, bias=0.6,
        ),
        junctions=GlobalJunctionsConfig(num_junctions=16, dim_hidden=32),
        sampler=ErrorBoundSamplerConfig(
            n_samples=12, n_samples_eval=24, n_samples_extra=6, max_total_iters=2
        ),
        max_verts=16,
    )


class TestTrainOnSynthetic:
    def test_loss_decreases(self, scene):
        cfg = tiny_cfg()
        scene_dev = scene_to_device(scene)
        params = init_neat(jax.random.PRNGKey(0), cfg)
        state = init_train_state(params, 5e-4, 0.1, 400)
        step = make_train_step(
            cfg, LossConfig(), 5e-4, 0.1, 400, n_rays=64,
            img_width=64, donate=False,
        )
        rngs = jax.random.split(jax.random.PRNGKey(1), 60)
        losses = []
        for r in rngs:
            state, aux = step(state, scene_dev, r)
            losses.append(float(np.asarray(aux["rgb_loss"])))
        first = np.mean(losses[:10])
        last = np.mean(losses[-10:])
        assert np.isfinite(losses).all()
        assert last < first, f"rgb loss did not decrease: {first:.4f} -> {last:.4f}"

    def test_finalization_runs(self, scene):
        """Finalize from an (untrained) model: exercises chunked field
        eval, matching, voting, graph assembly, visibility checking."""
        from neat_tpu.wireframe.finalize import initial_recon, visibility_checking

        cfg = tiny_cfg()
        params = init_neat(jax.random.PRNGKey(0), cfg)
        results = initial_recon(
            params, cfg, scene, chunksize=256,
            line_dis_threshold=1000.0,  # untrained: accept everything
            line_score_threshold=1e9,
            junc_match_threshold=1e9,
            verbose=False,
        )
        assert results["lines3d_all"].ndim == 3
        # permissive thresholds keep every line; an impossible view count
        # drops them all
        checked = visibility_checking(
            results["lines3d_wfi"], scene, mindis_th=1e9, min_visible_views=1
        )
        assert checked.shape[0] == results["lines3d_wfi"].shape[0]
        none = visibility_checking(
            results["lines3d_wfi"], scene, mindis_th=1e9,
            min_visible_views=scene.n_images + 1,
        )
        assert none.shape[0] == 0

    def test_eval_abc_protocol(self, scene_dir, tmp_path):
        """Run the ABC P/R protocol on the GT wireframe itself -> perfect
        scores (validates the scaling + matching math)."""
        import pickle
        from neat_tpu.evaluation.eval_abc import eval_abc

        with open(osp.join(scene_dir, "toy", "lines.json")) as f:
            gt = json.load(f)
        junctions = np.asarray(gt["junctions"])
        lines = junctions[np.asarray(gt["lines"])]
        results = {
            "junctions3d_initial": junctions,
            "lines3d_wfi_checked": lines,
        }
        p = tmp_path / "perfect.pkl"
        with open(p, "wb") as f:
            pickle.dump(results, f)
        out = eval_abc(str(p), osp.join(scene_dir, "toy"), verbose=False)
        assert out["junction_precision"][0] == pytest.approx(1.0)
        assert out["junction_recall"][0] == pytest.approx(1.0)
        assert out["line_precision"][0] == pytest.approx(1.0)
        assert out["line_recall"][0] == pytest.approx(1.0)

    def test_fuse_lines(self, scene_dir, scene):
        """Cross-view score fusion keeps GT-aligned lines and drops garbage."""
        from neat_tpu.wireframe.distill import fuse_lines

        with open(osp.join(scene_dir, "toy", "lines.json")) as f:
            gt = json.load(f)
        j = np.asarray(gt["junctions"], dtype=np.float32)
        lines = j[np.asarray(gt["lines"])]
        garbage = lines + np.asarray([5.0, 5.0, 5.0])[None, None]
        fused = fuse_lines(scene, np.concatenate([lines, garbage]))
        assert fused.shape[0] == lines.shape[0]

    def test_refinement_recon(self, scene_dir, scene):
        """Reference refinement.py semantics: the sdf pre-filter gates
        everything, and per-view re-matching replaces matched GROUPS with
        their mean (cross-view consensus), never moving endpoints
        individually."""
        from neat_tpu.wireframe.distill import refinement_recon

        cfg = tiny_cfg()
        params = init_neat(jax.random.PRNGKey(0), cfg)
        with open(osp.join(scene_dir, "toy", "lines.json")) as f:
            gt = json.load(f)
        j = np.asarray(gt["junctions"], dtype=np.float32)
        lines = j[np.asarray(gt["lines"])]
        rng = np.random.RandomState(0)
        dup = np.repeat(lines, 3, axis=0) + rng.randn(
            3 * len(lines), 2, 3
        ).astype(np.float32) * 0.005

        # an impossible sdf gate drops everything
        assert refinement_recon(
            params, cfg, scene, dup, sdf_threshold=1e-12
        ).shape[0] == 0
        # scores gate composes with it
        assert refinement_recon(
            params, cfg, scene, dup, sdf_threshold=1e9,
            scores=np.full(len(dup), 1.0), score_threshold=0.01,
        ).shape[0] == 0
        # permissive gates: duplicates of one GT line match the same
        # detection and collapse to group means
        out = refinement_recon(
            params, cfg, scene, dup, sdf_threshold=1e9, match_threshold=1e9
        )
        assert out.shape == (out.shape[0], 2, 3)
        assert 0 < out.shape[0] < dup.shape[0]
        assert np.isfinite(out).all()

    def test_dgrid_recon_smoke(self, scene):
        """dgrid: surface grid points -> per-view attraction evaluation at
        their projections -> label-signature clustering. The geometric
        init gives a spherical zero set, so the grid filter finds points;
        an untrained attraction field may or may not pass the 1 px
        orthogonal gate — the contract is shape/finiteness."""
        from neat_tpu.wireframe.distill import dgrid_recon

        cfg = tiny_cfg()
        params = init_neat(jax.random.PRNGKey(0), cfg)
        out = dgrid_recon(
            params, cfg, scene, resolution=16, sdf_eps=0.1,
            grid_bounds=((-1, -1, -1), (1, 1, 1)), chunksize=256,
        )
        assert out.ndim == 3 and out.shape[1:] == (2, 3)
        assert np.isfinite(out).all()

    def test_mesh_and_render_eval(self, scene):
        from neat_tpu.evaluation.render_eval import render_view, export_scene_mesh

        cfg = tiny_cfg()
        params = init_neat(jax.random.PRNGKey(0), cfg)
        out = render_view(params, cfg, scene, 0, chunksize=512)
        assert out["rgb"].shape == (64, 64, 3)
        assert np.isfinite(out["rgb"]).all()

        import tempfile

        from neat_tpu.viz.mesh import load_ply

        with tempfile.TemporaryDirectory() as d:
            ply = osp.join(d, "surf.ply")
            export_scene_mesh(params, cfg, ply, resolution=40,
                              grid_boundary=(-1.5, 1.5))
            verts, faces = load_ply(ply)
            # the geometric init is a sphere: the extracted surface must
            # be non-empty and near unit radius
            assert len(verts) > 100 and len(faces) > 100
            r = np.linalg.norm(verts, axis=1)
            assert 0.3 < r.mean() < 1.5


def test_view_field_lines_honours_eval_l3d_branch(scene):
    """Distillation consumes the eval forward, so the wfr/simple
    eval-attraction-at-l3d flag must change what view_field_lines
    returns (neat_wfr.py:469-474 — what their finalization actually
    distills)."""
    import dataclasses as dc

    from neat_tpu.wireframe.finalize import view_field_lines

    base = dc.replace(
        tiny_cfg(),
        attraction=dc.replace(tiny_cfg().attraction, mode="no_view", d_in=6),
        attraction_at_surface=True,
    )
    cfg_l3d = dc.replace(base, eval_attraction_at_l3d=True)
    params = init_neat(jax.random.PRNGKey(0), base)

    l3_base, l2_base, _, _ = view_field_lines(params, base, scene, 0, 256)
    l3_l3d, l2_l3d, _, _ = view_field_lines(params, cfg_l3d, scene, 0, 256)
    assert l3_base.shape == l3_l3d.shape
    assert not np.allclose(l3_base, l3_l3d)
    assert np.isfinite(l3_l3d).all() and np.isfinite(l2_l3d).all()


def test_distill_cache_key_type_canonical(tmp_path):
    """The distill cache sha hashes repr(): an int 10 (e.g. an argparse
    DEFAULT, which type= does not convert) must key identically to the
    API's 10.0, or every CLI run silently re-distills (a ~25 min CPU
    stall on the full ABC scene before the fix)."""
    from neat_tpu.train.runner import TrainRunner
    from neat_tpu.wireframe.finalize import wireframe_recon

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_runner import TINY_CONF

    os.makedirs(tmp_path / "toy")
    generate_scene(str(tmp_path / "toy"), n_views=3, res=(48, 48))
    conf = tmp_path / "tiny.conf"
    conf.write_text(TINY_CONF)
    r = TrainRunner(
        conf=str(conf), data_root=str(tmp_path),
        exps_folder=str(tmp_path / "exps"), nepochs=1, max_verts=16,
    )
    r.run()
    runconf = osp.join(r.rundir, "runconf.conf")

    wireframe_recon(conf=runconf, checkpoint="latest",
                    data_root=str(tmp_path), distance=10, ckdist=100)
    wireframe_recon(conf=runconf, checkpoint="latest",
                    data_root=str(tmp_path), distance=10.0, ckdist=100.0)
    import glob

    distills = glob.glob(osp.join(r.rundir, "wireframes", "*-distill.pkl"))
    assert len(distills) == 1, distills
    # and the assembled outputs collapse to ONE sha too
    pkls = glob.glob(osp.join(r.rundir, "wireframes", "*-neat.pkl"))
    assert len(pkls) == 1, pkls
