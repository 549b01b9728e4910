"""Tests for chunking, meters, plots, and the distillation helpers."""

import numpy as np

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
    def test_nms_keeps_best(self, rng):
        from neat_tpu.wireframe.distill import nms_lines

        base = np.asarray([[[0, 0, 0], [1, 0, 0]]], np.float32)
        dups = base + rng.randn(10, 2, 3).astype(np.float32) * 1e-4
        far = np.asarray([[[0, 5, 0], [1, 5, 0]]], np.float32)
        lines = np.concatenate([dups, far])
        scores = np.concatenate([np.arange(10) * 0.1, [0.0]])
        out = nms_lines(lines, scores, threshold=0.01)
        assert out.shape[0] == 2

    def test_merge(self, rng):
        from neat_tpu.wireframe.distill import merge_wireframes

        a = np.asarray([[[0, 0, 0], [1, 0, 0]]], np.float32)
        b = a + 1e-5
        c = np.asarray([[[0, 2, 0], [1, 2, 0]]], np.float32)
        out = merge_wireframes([a, b, c], dedup_threshold=0.01)
        assert out.shape[0] == 2
