"""Tests for chunking, meters, plots, and the distillation helpers."""

import os
import os.path as osp

import numpy as np
import pytest

from neat_tpu.utils.chunking import split_input, merge_output
from neat_tpu.utils.meters import AverageMeter


class TestChunking:
    def test_split_merge_roundtrip(self, rng):
        n = 1000
        model_input = {
            "uv": rng.rand(n, 2).astype(np.float32),
            "uv_proj": rng.rand(n, 2).astype(np.float32),
            "pose": np.eye(4),
        }
        chunks = split_input(model_input, n, n_pixels=256)
        assert len(chunks) == 4
        assert all(c["uv"].shape == (256, 2) for c in chunks)  # padded
        outs = [{"rgb": c["uv"] * 2, "_valid": c["_valid"]} for c in chunks]
        merged = merge_output(outs, n)
        np.testing.assert_allclose(merged["rgb"], model_input["uv"] * 2)

    def test_non_pixel_keys_passthrough(self, rng):
        model_input = {"uv": rng.rand(10, 2), "pose": np.eye(4)}
        chunks = split_input(model_input, 10, n_pixels=4)
        for c in chunks:
            np.testing.assert_array_equal(c["pose"], np.eye(4))


class TestMeters:
    def test_running_mean(self):
        m = AverageMeter()
        m.push({"loss": 1.0})
        m.push({"loss": 3.0, "psnr": 10.0})
        out = m()
        assert out["loss"] == 2.0
        assert out["psnr"] == 10.0
        m.reset()
        assert m() == {}


class TestPlots:
    def test_figures_written(self, tmp_path, rng):
        from neat_tpu.viz.plots import (
            plot_image_grid,
            plot_cameras,
            plot_wireframe3d,
            plot_lines2d_overlay,
        )

        img = rng.rand(16, 16, 3)
        plot_image_grid(str(tmp_path / "grid.png"), img, img, img * 2 - 1)
        poses = np.tile(np.eye(4), (3, 1, 1))
        plot_cameras(str(tmp_path / "cams.png"), poses)
        lines = rng.rand(5, 2, 3)
        plot_wireframe3d(str(tmp_path / "wf.png"), lines, junctions=rng.rand(4, 3))
        plot_lines2d_overlay(
            str(tmp_path / "ov.png"), img, rng.rand(3, 4) * 16, rng.rand(2, 4) * 16
        )
        for f in ("grid.png", "cams.png", "wf.png", "ov.png"):
            assert (tmp_path / f).stat().st_size > 0


class TestDistillHelpers:
    def test_greedy_suppress_keeps_best(self, rng):
        from neat_tpu.wireframe.distill import greedy_suppress_lines

        base = np.asarray([[[0, 0, 0], [1, 0, 0]]], np.float32)
        dups = base + rng.randn(10, 2, 3).astype(np.float32) * 1e-4
        far = np.asarray([[[0, 5, 0], [1, 5, 0]]], np.float32)
        lines = np.concatenate([dups, far])
        scores = np.concatenate([np.arange(10) * 0.1, [0.0]])
        out = greedy_suppress_lines(lines, scores, threshold=0.01)
        assert out.shape[0] == 2

    def test_nms_snaps_endpoints_to_count_maxima(self, rng):
        """Reference nms.py semantics: endpoints snap to grid cells that
        locally maximize the endpoint count; all lines are kept, and
        near-duplicates collapse to IDENTICAL snapped segments sharing
        junction coordinates."""
        from neat_tpu.wireframe.distill import nms_lines

        # three junctions spanning a genuine 3D bbox (the grid deltas are
        # per-axis bbox/resolution, as in the reference)
        base = np.asarray(
            [[[0, 0, 0], [1, 0, 0]], [[1, 0, 0], [1, 1, 1]]], np.float32
        )
        jitter = rng.randn(8, 2, 3).astype(np.float32) * 1e-3
        lines = np.concatenate([np.repeat(base, 4, axis=0) + jitter])
        out = nms_lines(lines, resolution=8)
        # every input line survives (reference cost<10000 keeps all)
        assert out.shape[0] == lines.shape[0]
        # endpoints collapsed onto shared junction coordinates
        uniq = np.unique(out.reshape(-1, 3), axis=0)
        assert uniq.shape[0] == 3
        # the shared junction (1,0,0) is bitwise-identical across lines
        snapped_ends = out.reshape(-1, 3)
        d = np.linalg.norm(uniq[:, None] - base.reshape(-1, 3)[None], axis=-1)
        assert d.min(axis=1).max() < 0.05  # maxima near the true junctions
        assert snapped_ends.dtype == lines.dtype

    def test_merge_relative_nearest_only(self):
        """Reference wireframe-merge.py:201-209: an existing line
        suppresses only its single nearest incoming line, within
        0.05x its own LENGTH."""
        from neat_tpu.wireframe.distill import merge_wireframes

        a = np.asarray([[[0, 0, 0], [1, 0, 0]]], np.float32)  # length 1
        # two near-duplicates of a: only the NEAREST one is suppressed
        b = np.concatenate([a + 1e-3, a + 2e-3])
        out = merge_wireframes([a, b], rel_threshold=0.05)
        assert out.shape[0] == 2
        # a short existing line (length 0.1 -> radius 0.005) does NOT
        # absorb an incoming line 0.01 away...
        s = np.asarray([[[0, 0, 0], [0.1, 0, 0]]], np.float32)
        near = s + 0.01
        assert merge_wireframes([s, near], rel_threshold=0.05).shape[0] == 2
        # ...while a long line (length 10 -> radius 0.5) absorbs the same
        # absolute offset
        long = np.asarray([[[0, 0, 0], [10, 0, 0]]], np.float32)
        assert merge_wireframes([long, long + 0.01]).shape[0] == 1


class TestViewerCapture:
    """Pinhole capture / camera save-load / replay flows (reference
    show.py:152-280, 368-413)."""

    def _wireframe(self):
        rng = np.random.RandomState(0)
        return rng.randn(10, 2, 3).astype(np.float32) * 0.3

    def test_cli_loads_object_dtype_npz(self, tmp_path):
        """Reference artifacts (wireframe.py/debug.py) store lines3d as an
        object array of per-view (L, 2, 3) arrays; the viewer must
        concatenate them like show.py:462, and honor the scores
        --threshold filter."""
        from neat_tpu.viz.viewer import main as viewer_main

        per_view = np.empty(2, dtype=object)
        per_view[0] = self._wireframe()[:4]
        per_view[1] = self._wireframe()[4:]
        scores = np.concatenate(
            [np.zeros(4, np.float32), np.ones(6, np.float32)]
        )
        p = tmp_path / "record.npz"
        np.savez(p, lines3d=per_view, scores=scores)
        out = tmp_path / "frames"
        viewer_main([
            "--data", str(p), "--out", str(out),
            "--mode", "record", "--frames", "2",
            "--pose", "dtu", "--threshold", "0.5",
        ])
        import glob as g
        assert len(g.glob(str(out / "image_*.png"))) == 2
        assert len(g.glob(str(out / "cam_*.json"))) == 2

    def test_camera_json_roundtrip(self, tmp_path):
        from neat_tpu.viz.viewer import save_camera_json, load_camera_json

        k3 = np.array([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
        w2c = np.eye(4)
        w2c[:3, 3] = [0.1, -0.2, 3.0]
        p = str(tmp_path / "cam_0000.json")
        save_camera_json(p, k3, w2c, 512, 512)
        k2, w2, wd, ht = load_camera_json(p)
        np.testing.assert_allclose(k2, k3)
        np.testing.assert_allclose(w2, w2c)
        assert (wd, ht) == (512, 512)
        # o3d schema: column-major flat matrices under the o3d keys
        import json

        payload = json.load(open(p))
        assert payload["class_name"] == "PinholeCameraParameters"
        assert len(payload["extrinsic"]) == 16
        assert len(payload["intrinsic"]["intrinsic_matrix"]) == 9

    def test_record_then_replay(self, tmp_path):
        from neat_tpu.viz.viewer import capture_spherical_views, replay_views

        lines = self._wireframe()
        rec = str(tmp_path / "rec")
        capture_spherical_views(lines, rec, n_frames=3, width=64, height=64,
                                focal=60.0)
        assert len([f for f in os.listdir(rec) if f.startswith("cam_")]) == 3
        assert len([f for f in os.listdir(rec) if f.startswith("image_")]) == 3
        out = str(tmp_path / "replay")
        n = replay_views(lines, rec, out)
        assert n == 3
        assert osp.exists(out + ".gif")

    def test_viewer_cli_record(self, tmp_path):
        from neat_tpu.viz import viewer

        npz = tmp_path / "wf-wfi.npz"
        np.savez(npz, lines3d=self._wireframe())
        out = str(tmp_path / "frames")
        viewer.main([
            "--data", str(npz), "--out", out, "--mode", "record",
            "--frames", "2", "--show-junctions",
        ])
        assert len(os.listdir(out)) == 4  # 2 images + 2 cam jsons


class TestFinalizePostProcessing:
    """Post-vote precision knobs (finalize.py): junction merge, edge vote
    gating. All default-off = reference parity."""

    def test_merge_voted_junctions(self):
        from neat_tpu.wireframe.finalize import merge_voted_junctions

        j = np.array(
            [[0.0, 0, 0], [0.004, 0, 0], [1.0, 0, 0], [0.0, 0.003, 0]],
            dtype=np.float32,
        )
        votes = np.array([5, 2, 3, 1], dtype=np.int32)
        merged, mvotes = merge_voted_junctions(j, votes, eps=0.01)
        assert merged.shape == (2, 3)
        # vote-weighted mean of the 3-cluster; votes summed
        assert sorted(mvotes.tolist()) == [3, 8]
        big = merged[np.argmax(mvotes)]
        expect = (j[0] * 5 + j[1] * 2 + j[3] * 1) / 8.0
        np.testing.assert_allclose(big, expect, atol=1e-6)
        # eps=0 is a no-op (parity)
        same, sv = merge_voted_junctions(j, votes, eps=0.0)
        assert same.shape == (4, 3)

    def test_edge_vote_threshold(self):
        from neat_tpu.wireframe.finalize import wireframe_from_lines_and_junctions

        junctions = np.array(
            [[0.0, 0, 0], [1.0, 0, 0], [0.0, 1.0, 0]], dtype=np.float32
        )
        # two lines support edge (0,1); one line supports edge (0,2)
        lines = np.array(
            [
                [[0.01, 0, 0], [0.99, 0, 0]],
                [[-0.01, 0, 0], [1.01, 0, 0]],
                [[0.0, 0.02, 0], [0.0, 0.98, 0]],
            ],
            dtype=np.float32,
        )
        g1, wf1 = wireframe_from_lines_and_junctions(lines, junctions)
        assert wf1.shape[0] == 2  # parity: both edges
        g2, wf2 = wireframe_from_lines_and_junctions(
            lines, junctions, edge_vote_threshold=2
        )
        assert wf2.shape[0] == 1  # only the doubly-supported edge
        np.testing.assert_allclose(wf2[0], junctions[[0, 1]])

    def test_merge_mode_max(self):
        """Winner-takes-all keeps the highest-voted member's coordinates
        untouched (a low-vote duplicate is usually the WORSE-localized
        twin; the mean would drag the good one toward it)."""
        from neat_tpu.wireframe.finalize import merge_voted_junctions

        j = np.array(
            [[0.0, 0, 0], [0.004, 0, 0], [1.0, 0, 0]], dtype=np.float32
        )
        votes = np.array([5, 2, 3], dtype=np.int32)
        merged, mvotes = merge_voted_junctions(j, votes, eps=0.01, mode="max")
        assert merged.shape == (2, 3)
        assert sorted(mvotes.tolist()) == [3, 7]
        big = merged[np.argmax(mvotes)]
        np.testing.assert_allclose(big, j[0], atol=0)  # untouched

    def _distilled(self):
        """Two latents on one corner splitting 3+2 votes, one spurious
        latent with 1 vote, one clean far corner with 4 votes."""
        global_junctions = np.array(
            [
                [0.0, 0.0, 0.0],     # corner A, twin 1 (3 votes)
                [0.015, 0.0, 0.0],   # corner A, twin 2 (2 votes)
                [1.0, 0.0, 0.0],     # corner B (4 votes)
                [0.5, 0.5, 0.5],     # spurious (1 vote)
            ],
            dtype=np.float32,
        )
        votes_idx = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 3], dtype=np.int32)
        votes_pts = np.array(
            [
                [0.001, 0, 0], [0.002, 0, 0], [0.003, 0, 0],
                [0.004, 0, 0], [0.005, 0, 0],
                [1.001, 0, 0], [1.002, 0, 0], [1.003, 0, 0], [1.004, 0, 0],
                [0.51, 0.5, 0.5],
            ],
            dtype=np.float32,
        )
        return {
            "global_junctions": global_junctions,
            "lines3d_raw": np.zeros((0, 2, 3), dtype=np.float32),
            "scores_raw": np.zeros((0,), dtype=np.float32),
            "votes_idx": votes_idx,
            "votes_pts": votes_pts,
        }

    def test_merge_before_vote_recombines_split_votes(self):
        """Gate 2: post-gate merge loses twin 2 (2 votes) BEFORE merging,
        while pre-gate merge pools 3+2=5 votes and keeps corner A."""
        from neat_tpu.wireframe.finalize import assemble_wireframe

        distilled = self._distilled()
        post = assemble_wireframe(
            distilled, None, None, vote_threshold=2,
            junction_merge_eps=0.02,
        )
        # twin 2 and the spurious latent fall below the gate; corner A
        # survives on twin 1's 3 votes alone (no merge partner left)
        assert post["junctions3d_initial"].shape == (2, 3)
        assert sorted(post["junction_votes"].tolist()) == [3, 4]

        pre = assemble_wireframe(
            distilled, None, None, vote_threshold=2,
            junction_merge_eps=0.02, merge_before_vote=True,
        )
        assert pre["junctions3d_initial"].shape == (2, 3)
        # corner A carries its full pooled support
        assert sorted(pre["junction_votes"].tolist()) == [4, 5]
        # gate 4: post-gate drops corner A entirely (3 < 4 votes after
        # losing its twin); pre-gate keeps it at 5 pooled votes
        post4 = assemble_wireframe(
            distilled, None, None, vote_threshold=4,
            junction_merge_eps=0.02,
        )
        assert post4["junctions3d_initial"].shape == (0, 3)
        pre4 = assemble_wireframe(
            distilled, None, None, vote_threshold=4,
            junction_merge_eps=0.02, merge_before_vote=True,
        )
        assert pre4["junctions3d_initial"].shape == (1, 3)

    def test_junction_coords_vote_mean(self):
        """vote_mean replaces each junction's latent coordinate with the
        mean of its voting endpoints; with merge_mode=mean a merged
        group's coordinate is exactly the pooled endpoint mean."""
        from neat_tpu.wireframe.finalize import assemble_wireframe

        distilled = self._distilled()
        res = assemble_wireframe(
            distilled, None, None, vote_threshold=1,
            junction_merge_eps=0.02, merge_before_vote=True,
            junction_coords="vote_mean",
        )
        assert res["junctions3d_initial"].shape == (2, 3)
        ji = res["junctions3d_initial"]
        a = ji[np.argmin(ji[:, 0])]
        pooled = distilled["votes_pts"][:5].mean(0)
        np.testing.assert_allclose(a, pooled, atol=1e-6)

        med = assemble_wireframe(
            distilled, None, None, vote_threshold=1,
            junction_coords="vote_median",
        )
        # no merge: corner B coordinate = median of its 4 endpoints
        b = med["junctions3d_initial"][
            np.argmax(med["junctions3d_initial"][:, 0])
        ]
        np.testing.assert_allclose(
            b, np.median(distilled["votes_pts"][5:9], axis=0), atol=1e-6
        )


class TestVoteRatio:
    def test_effective_vote_threshold(self):
        from neat_tpu.wireframe.finalize import effective_vote_threshold

        # disabled -> absolute threshold passes through
        assert effective_vote_threshold(1, 0.0, 100) == 1
        assert effective_vote_threshold(4, 0.0, 100) == 4
        # ratio of the view count, rounded
        assert effective_vote_threshold(1, 0.1, 100) == 10
        assert effective_vote_threshold(1, 0.1, 49) == 5
        # never drops below the absolute threshold
        assert effective_vote_threshold(8, 0.1, 30) == 8

    def test_effective_check_views(self):
        from neat_tpu.wireframe.finalize import effective_check_views

        # disabled -> the absolute reference ckview passes through
        assert effective_check_views(5, 0.0, 24) == 5
        # ratio 0.1 reproduces the reference's "5 views for dtu24"
        # (neat-final-parsing.py:415,440; DTU scan24 has 49 views)
        assert effective_check_views(5, 0.1, 49) == 5
        # ...and scales honestly to smaller captures: the 24-view
        # synthetic stacked scene's contact edge has 4 supervising views
        # and must clear the gate (docs/geometry_sweep_r5.md)
        assert effective_check_views(5, 0.1, 24) == 2
        # never below 1 view
        assert effective_check_views(5, 0.01, 10) == 1

    def test_recipe_preset_cli(self, monkeypatch):
        """--recipe calibrated fills every knob left at its reference
        default; explicit flags win over the preset."""
        from neat_tpu.wireframe import finalize

        captured = {}
        monkeypatch.setattr(
            finalize, "wireframe_recon",
            lambda **kw: captured.update(kw) or {},
        )
        base = ["--conf", "x/runconf.conf"]
        finalize.main(base + ["--recipe", "calibrated"])
        assert captured["vote_ratio"] == 0.2
        assert captured["junction_merge_eps"] == 0.02
        assert captured["merge_before_vote"] is True
        assert captured["junction_coords"] == "vote_mean"
        assert captured["check_view_ratio"] == 0.1

        captured.clear()
        finalize.main(base + ["--recipe", "calibrated",
                              "--vote-ratio", "0.3",
                              "--junction-coords", "vote_median"])
        assert captured["vote_ratio"] == 0.3
        assert captured["junction_coords"] == "vote_median"
        assert captured["merge_before_vote"] is True  # still preset

        captured.clear()
        finalize.main(base)  # default recipe = reference parity
        assert captured["vote_ratio"] == 0.0
        assert captured["junction_merge_eps"] == 0.0
        assert captured["merge_before_vote"] is False
        assert captured["junction_coords"] == "latent"
        assert captured["check_view_ratio"] == 0.0


class TestLossConfOverrides:
    """The conf's loss block must win over the loss-class map defaults
    (the reference instantiates the loss class with the conf's kwargs)."""

    def _parse(self, loss_class, loss_block):
        import textwrap

        from neat_tpu.train.config import build_experiment_config, parse_hocon

        conf = parse_hocon(textwrap.dedent(f"""
            train {{
                expname = t
                dataset_class = datasets.blender_hawp_dataset.BlenderDataset
                model_class = model.networks.neat_wfr_rend_a.VolSDFNetwork
                loss_class = {loss_class}
                num_pixels = 8
            }}
            loss {{
            {loss_block}
            }}
            dataset {{
                data_dir = toy
                img_res = [8, 8]
            }}
            model {{
            }}
        """))
        return build_experiment_config(conf)

    def test_conf_depth_weight_wins_over_class_map(self):
        cfg = self._parse(
            "model.networks.loss_wfr_spd.VolSDFLoss", "    depth_weight = 0.5"
        )
        assert cfg.loss.depth_weight == 0.5

    def test_class_map_default_applies_without_conf_key(self):
        cfg = self._parse("model.networks.loss_wfr_rpd.VolSDFLoss", "")
        assert cfg.loss.depth_weight == 0.1
        assert cfg.loss.depth_loss_kind == "ssi"

    def test_plain_loss_accepts_conf_depth(self):
        cfg = self._parse(
            "model.networks.loss_wfr.VolSDFLoss", "    depth_weight = 0.2"
        )
        assert cfg.loss.depth_weight == 0.2

    def test_detach_lines2d_variant_flags(self):
        from neat_tpu.train.config import _MODEL_CLASS_MAP

        assert _MODEL_CLASS_MAP[
            "model.networks.neat_wfr_a.VolSDFNetwork"
        ]["detach_lines2d"] is False
        assert "detach_lines2d" not in _MODEL_CLASS_MAP[
            "model.networks.neat_wfr_rend_a.VolSDFNetwork"
        ]


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        """Unit-sphere SDF -> mesh with all vertices on the surface; also
        exercises the slab-chunked sign-change filter (seams at slab
        boundaries must not drop or duplicate cubes)."""
        from neat_tpu.viz.mesh import marching_tetrahedra

        n = 40
        g = np.linspace(-1.2, 1.2, n).astype(np.float32)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        vals = np.sqrt(X**2 + Y**2 + Z**2) - 1.0
        verts, faces = marching_tetrahedra(
            vals, origin=[-1.2] * 3, spacing=[g[1] - g[0]] * 3
        )
        assert len(verts) > 1000 and len(faces) > 1000
        r = np.linalg.norm(verts, axis=1)
        assert abs(r.mean() - 1.0) < 0.01 and r.std() < 0.01

    def test_empty_grid(self):
        from neat_tpu.viz.mesh import marching_tetrahedra

        vals = np.ones((8, 8, 8), np.float32)  # no crossing anywhere
        verts, faces = marching_tetrahedra(vals, [0, 0, 0], [1, 1, 1])
        assert verts.shape == (0, 3) and faces.shape == (0, 3)


class TestProfilingUtils:
    """utils/profiling.py (SURVEY §5: the reference has no profiler —
    these are the TPU-native additions the runner/bench use)."""

    def test_step_timer_and_force_sync(self):
        import jax.numpy as jnp

        from neat_tpu.utils.profiling import force_sync, step_timer

        holder = {}
        with step_timer("block", holder):
            v = force_sync(jnp.asarray(2.0) * 3.0)
        assert v == 6.0
        assert holder["block"] > 0.0

    def test_trace_writes_profile(self, tmp_path):
        import jax.numpy as jnp

        from neat_tpu.utils.profiling import trace

        with trace(str(tmp_path)):
            (jnp.arange(8.0) ** 2).block_until_ready()
        import glob

        assert glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)

    @pytest.mark.slow  # runs the xla profiler over a jitted step; ~8 s
    def test_parse_profile_reads_trace(self, tmp_path, capsys):
        import sys

        import jax.numpy as jnp

        from neat_tpu.utils.profiling import trace

        sys.path.insert(0, "tools")
        import parse_profile

        with trace(str(tmp_path)):
            (jnp.arange(64.0) ** 2).sum().block_until_ready()
        parse_profile.parse(str(tmp_path), top=5)
        out = capsys.readouterr().out
        assert "ms" in out and "==" in out


class TestBytesAccounting:
    """tools/bytes_accounting.py — the post-fusion HLO traffic model that
    backs the RESULTS.md roofline closure. Parser-level checks on a small
    compiled module (the full-step run is the tool's CLI use on TPU)."""

    def test_shape_bytes_and_bucketing(self):
        import sys

        sys.path.insert(0, "tools")
        import bytes_accounting as ba

        assert ba.shape_bytes("f32", "4,8") == 128
        assert ba.shape_bytes("bf16", "16") == 32
        assert ba.shape_bytes("token", "") == 0
        assert ba.bucket_for("sampler/foo", "fusion") == "sampler/fwd"
        assert ba.bucket_for("transpose(sampler/foo)", "fusion") == "sampler/bwd"
        assert ba.bucket_for("x", "copy") == "copies"
        assert ba.bucket_for("x", "all-gather") == "collectives"

    def test_entry_parse_on_compiled_module(self):
        import sys

        import jax
        import jax.numpy as jnp

        sys.path.insert(0, "tools")
        import bytes_accounting as ba

        def f(x, w):
            with jax.named_scope("sampler"):
                h = jnp.tanh(x @ w)
            with jax.named_scope("volume_render"):
                return (h * h).sum()

        x = jnp.zeros((64, 32), jnp.float32)
        w = jnp.zeros((32, 16), jnp.float32)
        hlo = jax.jit(f).lower(x, w).compile().as_text()
        rows = list(ba.parse_entry_instructions(hlo))
        assert rows, "no entry instructions parsed"
        total = sum(r[2] + r[3] for r in rows)
        assert total > 0
        # the input parameters alone move x + w bytes through the entry
        assert total >= (64 * 32 + 32 * 16) * 4
        buckets = {ba.bucket_for(r[4], r[1]) for r in rows}
        assert any(b.startswith("sampler/") for b in buckets), buckets


def test_apply_env_platform(monkeypatch):
    """CLI mains honor an explicit JAX_PLATFORMS even though this image's
    sitecustomize clobbers it after the env was read (a dead axon tunnel
    otherwise hangs every CLI op indefinitely)."""
    import jax

    from neat_tpu.utils.platform import apply_env_platform

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    apply_env_platform()
    assert jax.config.jax_platforms == "cpu"
    # unset -> leaves the active value alone
    monkeypatch.delenv("JAX_PLATFORMS")
    apply_env_platform()
    assert jax.config.jax_platforms == "cpu"


class TestCheckpointDurability:
    """Atomic snapshot writes + corrupted-resume fallback: a preemption
    mid-save must never cost more than one save interval (the runner's
    crash-and-resume contract; the reference has no such guarantee —
    volsdf_train.py torch.save writes in place)."""

    def _state(self, val):
        import jax.numpy as jnp

        from neat_tpu.train.step import TrainState

        return TrainState(
            params={"w": jnp.full((4,), float(val))},
            opt_state={"m": jnp.zeros((4,))},
            step=jnp.asarray(val, jnp.int32),
        )

    def test_truncated_latest_falls_back_to_newest_epoch(self, tmp_path):
        import numpy as np

        from neat_tpu.train.checkpoint import load_checkpoint, save_checkpoint

        d = str(tmp_path / "ckpts")
        save_checkpoint(d, self._state(1), epoch=1)
        save_checkpoint(d, self._state(2), epoch=2)
        # simulate a kill mid-write of latest.ckpt (torn file)
        p = tmp_path / "ckpts" / "latest.ckpt"
        blob = p.read_bytes()
        p.write_bytes(blob[: len(blob) // 2])
        state, epoch = load_checkpoint(d, "latest")
        assert epoch == 2
        assert float(np.asarray(state.params["w"][0])) == 2.0

    def test_garbage_latest_falls_back(self, tmp_path):
        from neat_tpu.train.checkpoint import load_checkpoint, save_checkpoint

        d = str(tmp_path / "ckpts")
        save_checkpoint(d, self._state(5), epoch=5)
        (tmp_path / "ckpts" / "latest.ckpt").write_bytes(b"\x00" * 64)
        state, epoch = load_checkpoint(d, "latest")
        assert epoch == 5

    def test_unrecoverable_raises(self, tmp_path):
        import pytest as _pytest

        from neat_tpu.train.checkpoint import load_checkpoint

        d = tmp_path / "ckpts"
        d.mkdir()
        (d / "latest.ckpt").write_bytes(b"junk")
        with _pytest.raises(RuntimeError, match="corrupt"):
            load_checkpoint(str(d), "latest")

    def test_missing_latest_falls_back_to_newest_epoch(self, tmp_path):
        """A kill between the epoch-tag write and the latest-tag write
        leaves the numeric tag as the newest snapshot (observed live:
        the round-4 relay wedge killed a run before latest existed)."""
        import os

        from neat_tpu.train.checkpoint import load_checkpoint, save_checkpoint

        d = str(tmp_path / "ckpts")
        save_checkpoint(d, self._state(3), epoch=3)
        os.remove(tmp_path / "ckpts" / "latest.ckpt")
        state, epoch = load_checkpoint(d, "latest")
        assert epoch == 3

    def test_empty_dir_raises_runtime_error(self, tmp_path):
        """No snapshot at all -> RuntimeError (not FileNotFoundError):
        the runner's --is_continue catches it and starts fresh instead
        of crashing an unattended watchdog relaunch."""
        import pytest as _pytest

        from neat_tpu.train.checkpoint import load_checkpoint

        d = tmp_path / "ckpts"
        d.mkdir()
        with _pytest.raises(RuntimeError):
            load_checkpoint(str(d), "latest")

    def test_resume_without_checkpoint_starts_fresh(self, tmp_path):
        """Runner-level: --is_continue against a rundir killed before its
        first save must start from scratch, not crash (the watchdog's
        unattended relaunch path)."""
        import os

        from neat_tpu.data.synthetic import generate_scene
        from neat_tpu.train.runner import TrainRunner
        from test_runner import TINY_CONF

        os.makedirs(tmp_path / "toy")
        generate_scene(str(tmp_path / "toy"), n_views=2, res=(48, 48))
        conf = tmp_path / "tiny.conf"
        conf.write_text(TINY_CONF)
        r1 = TrainRunner(
            conf=str(conf), data_root=str(tmp_path),
            exps_folder=str(tmp_path / "exps"), nepochs=0,
        )
        # killed before any save: no checkpoint files exist
        assert not os.listdir(osp.join(r1.rundir, "checkpoints"))
        r2 = TrainRunner(
            conf=str(conf), data_root=str(tmp_path),
            exps_folder=str(tmp_path / "exps"), nepochs=1,
            is_continue=True,
        )
        assert r2.start_epoch == 0

    def test_save_interrupted_midwrite_preserves_previous(self, tmp_path, monkeypatch):
        """Kill the process (simulated as an exception) inside the tmp-file
        write: the previous latest.ckpt must remain valid and no tmp litter
        survives."""
        import numpy as np

        import neat_tpu.train.checkpoint as ck

        d = str(tmp_path / "ckpts")
        ck.save_checkpoint(d, self._state(1), epoch=1)

        calls = {"n": 0}
        real = ck._atomic_write

        def flaky(path, write_fn):
            calls["n"] += 1
            if calls["n"] == 2:  # die mid-way through the second file
                raise KeyboardInterrupt
            real(path, write_fn)

        monkeypatch.setattr(ck, "_atomic_write", flaky)
        try:
            ck.save_checkpoint(d, self._state(9), epoch=9)
        except KeyboardInterrupt:
            pass
        state, epoch = ck.load_checkpoint(d, "latest")
        assert epoch in (1, 9)  # whichever replace completed — both valid
        assert float(np.asarray(state.params["w"][0])) == float(epoch)
        leftovers = [f for f in (tmp_path / "ckpts").iterdir() if ".tmp" in f.name]
        assert not leftovers
