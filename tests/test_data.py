"""Tests for wireframe IO, the encodels rasterizer, and the dataset packers."""

import json
import os.path as osp

import numpy as np
import jax.numpy as jnp
import pytest

from neat_tpu.data.wireframe import WireframeGraph
from neat_tpu.data.encodels import (
    encode_line_attraction,
    _encodels_numpy,
    attraction_support,
)

TOY = "/root/reference/data/abc/00075213"


def make_graph(tmp_path):
    g = WireframeGraph(
        vertices=np.asarray([[0, 0], [10, 0], [10, 10]], np.float32),
        v_confidences=np.asarray([0.9, 0.8, 0.7], np.float32),
        edges=np.asarray([[0, 1], [1, 2]], np.int64),
        weights=np.asarray([0.9, 0.03], np.float32),
        frame_width=20,
        frame_height=16,
    )
    return g


class TestWireframeGraph:
    def test_line_segments_threshold(self, tmp_path):
        g = make_graph(tmp_path)
        lines = g.line_segments(0.05)
        assert lines.shape == (1, 5)
        np.testing.assert_allclose(lines[0], [0, 0, 10, 0, 0.9])
        assert g.line_segments(0.01).shape == (2, 5)

    def test_json_roundtrip(self, tmp_path):
        g = make_graph(tmp_path)
        p = tmp_path / "wf.json"
        g.save_json(p)
        g2 = WireframeGraph.load_json(p)
        np.testing.assert_allclose(g2.vertices, g.vertices)
        assert g2.frame_width == 20 and g2.frame_height == 16

    def test_rescale(self, tmp_path):
        g = make_graph(tmp_path)
        g.rescale(40, 32)
        np.testing.assert_allclose(g.vertices[1], [20, 0])

    @pytest.mark.skipif(not osp.exists(TOY), reason="toy data unavailable")
    def test_load_real_hawp_json(self):
        g = WireframeGraph.load_json(osp.join(TOY, "hawp", "image_0000.json"))
        assert g.num_vertices > 0 and g.num_edges > 0
        assert g.frame_width == 512 and g.frame_height == 512
        lines = g.line_segments(0.05)
        assert lines.shape[1] == 5
        assert (lines[:, :4] >= 0).all() and (lines[:, :4] <= 512).all()


class TestEncodels:
    lines = np.asarray(
        [[10, 10, 50, 10], [10, 10, 10, 50], [30, 30, 55, 55]], np.float32
    )

    def test_native_matches_numpy(self):
        lmapC, labC = encode_line_attraction(self.lines, 64, 64, backend="native")
        lmapN, labN = _encodels_numpy(self.lines, 64, 64)
        np.testing.assert_array_equal(labC, labN)
        np.testing.assert_allclose(lmapC, lmapN, atol=1e-5)

    def test_attraction_point_on_segment(self):
        lmap, labels = encode_line_attraction(self.lines, 64, 64)
        # pixel (30, 10): on line 0 exactly -> zero offset
        assert labels[10, 30] == 0
        np.testing.assert_allclose(lmap[:2, 10, 30], [0, 0], atol=1e-5)
        # pixel (30, 14): 4 px below line 0 -> offset (0, -4)
        np.testing.assert_allclose(lmap[:2, 14, 30], [0, -4], atol=1e-5)

    def test_endpoint_attraction_clamped(self):
        # pixel beyond the endpoint: attraction point clamps to the endpoint
        lmap, labels = encode_line_attraction(
            np.asarray([[10, 10, 20, 10]], np.float32), 40, 40
        )
        # pixel (30, 10): beyond (20,10) -> offset points to (20,10)
        np.testing.assert_allclose(lmap[:2, 10, 30], [-10, 0], atol=1e-5)

    def test_support_mask(self):
        mask, labels, proj = attraction_support(self.lines, 64, 64, 5.0)
        m = mask.reshape(64, 64)
        assert m[10, 30]  # on line
        assert m[14, 30]  # 4 px away < 5
        assert not m[17, 30]  # 7 px away > 5
        # proj of a masked pixel lies on the segment
        p = proj.reshape(64, 64, 2)[14, 30]
        np.testing.assert_allclose(p, [30, 10], atol=1e-5)


@pytest.mark.skipif(not osp.exists(TOY), reason="toy data unavailable")
class TestBlenderScene:
    @pytest.fixture(scope="class")
    def scene(self):
        from neat_tpu.data.datasets import load_blender_scene

        return load_blender_scene(
            "abc/00075213",
            (512, 512),
            data_root="/root/reference/data",
            max_verts=64,
        )

    def test_shapes(self, scene):
        v = scene.n_images
        assert v > 90
        assert scene.rgb.shape == (v, 512 * 512, 3)
        assert scene.mask.shape == (v, 512 * 512)
        assert scene.verts2d.shape[2] == 2
        assert (scene.support_count > 0).all()
        assert scene.intrinsics.shape == (v, 4, 4)

    def test_rgb_range(self, scene):
        assert scene.rgb.min() >= 0 and scene.rgb.max() <= 1

    def test_support_indices_valid(self, scene):
        for i in (0, scene.n_images - 1):
            idx = scene.support_idx[i]
            assert scene.mask[i][idx].all()

    def test_lines_indexed_by_labels(self, scene):
        i = 0
        pix = scene.support_idx[i][:100]
        labels = scene.labels[i][pix]
        assert (labels < scene.n_lines[i]).all()


class TestGeometryFamilies:
    """The geometry-generalization scene families (tools/geometry_sweep.py).

    Each family must honor the full scene contract (cameras + images +
    hawp json + lines.json GT) AND exhibit the structural property it was
    designed to stress — otherwise the sweep silently measures six copies
    of the cuboid."""

    def test_contract_and_structure(self, tmp_path):
        from neat_tpu.data.synthetic import GEOMETRIES, generate_scene

        stats = {}
        for name, fn in GEOMETRIES.items():
            verts, edges, faces, colors = fn()
            assert edges.max() < len(verts), name
            assert colors.shape == (faces.shape[0], 3), name
            # no duplicate vertices (junction GT must be unambiguous)
            d = np.linalg.norm(verts[:, None] - verts[None], axis=-1)
            assert (d + np.eye(len(verts)) * 10).min() > 1e-6, name
            # no duplicate edges
            key = {tuple(sorted(e)) for e in edges.tolist()}
            assert len(key) == len(edges), name
            stats[name] = (verts, edges)

        # structural properties each family claims
        def valence(verts, edges):
            return np.bincount(np.asarray(edges).ravel(),
                               minlength=len(verts))

        assert valence(*stats["bipyramid"]).max() >= 6  # high valence
        v, e = stats["slab"]
        assert np.ptp(v[:, 2]) <= 0.11  # near-parallel pair gap
        assert len(stats["grid"][1]) >= 40  # dense cells
        assert len(stats["tetra"][1]) == 6  # sparse frame
        assert len(stats["stacked"][0]) == 16  # two boxes

        # scene contract end-to-end for one non-cuboid family
        from neat_tpu.data.datasets import load_blender_scene

        generate_scene(str(tmp_path / "bp"), n_views=3, res=(48, 48),
                       geometry="bipyramid")
        with open(tmp_path / "bp" / "lines.json") as f:
            gt = json.load(f)
        assert len(gt["junctions"]) == 8 and len(gt["lines"]) == 18
        scene = load_blender_scene("bp", (48, 48),
                                   data_root=str(tmp_path), max_verts=32)
        assert scene.n_images == 3
        assert scene.n_lines.max() > 0  # synthetic HAWP saw the edges


class TestSceneLineDepthCues:
    """3D-line-conditioned depth supervision (reference
    scene_line_dataset.py / scene_line_depth_dataset.py -> scene_line
    loader kind)."""

    def test_attach_cues_on_synthetic_dtu(self, tmp_path):
        import json

        from neat_tpu.data.synthetic import generate_scene
        from neat_tpu.data.datasets import load_scene

        d = tmp_path / "sl"
        generate_scene(str(d / "toy" / "scan1"), n_views=4, res=(64, 64),
                       convention="dtu")
        # precomputed 3D lines = the GT wireframe itself
        with open(d / "toy" / "scan1" / "lines.json") as f:
            gt = json.load(f)
        j = np.asarray(gt["junctions"], dtype=np.float32)
        lines3d = j[np.asarray(gt["lines"], dtype=np.int64)]
        npz = d / "lines3d.npz"
        np.savez(npz, lines3d=lines3d)

        scene = load_scene(
            "scene_line",
            lines_npz=str(npz),
            data_dir="toy",
            img_res=(64, 64),
            scan_id=1,
            data_root=str(d),
            distance_threshold=3.0,
            max_verts=16,
        )
        assert scene.depth is not None and scene.depth.shape == (4, 64 * 64)
        # cues are sparse but present, positive where set
        n_cues = (scene.depth > 0).sum()
        assert n_cues > 0
        pos = scene.depth[scene.depth > 0]
        assert (pos > 0.1).all() and (pos < 10.0).all()

    def test_depth_loss_masks_empty_pixels(self):
        from neat_tpu.model.loss import LossConfig, neat_loss

        cfg = LossConfig(depth_weight=0.1, line_weight=0.0,
                         junction_3d_weight=0.0, junction_2d_weight=0.0)
        n = 8
        outputs = {
            "rgb_values": jnp.zeros((n, 3)),
            "depth": jnp.full((n,), 5.0),
            "grad_theta": jnp.ones((n, 3)),
        }
        gt_depth = jnp.zeros((n,)).at[0].set(2.0)  # one valid cue
        gt = {"rgb": jnp.zeros((n, 3)), "depth": gt_depth}
        stats = neat_loss(outputs, gt, cfg)
        # only the one valid pixel contributes: |5-2| = 3
        np.testing.assert_allclose(float(stats["depth_loss"]), 3.0, atol=1e-5)
        # all-invalid -> zero loss, no nan
        gt["depth"] = jnp.zeros((n,))
        stats = neat_loss(outputs, gt, cfg)
        assert float(stats["depth_loss"]) == 0.0

    def test_ssi_depth_loss_masks_empty_pixels(self):
        from neat_tpu.model.loss import LossConfig, neat_loss

        cfg = LossConfig(depth_weight=0.1, depth_loss_kind="ssi",
                         depth_mask_zeros=True,  # repaired sparse-cue mode
                         line_weight=0.0, junction_3d_weight=0.0,
                         junction_2d_weight=0.0)
        n = 16
        rng = np.random.RandomState(0)
        true_d = rng.rand(n).astype(np.float32) + 1.0
        gt_depth = np.zeros(n, np.float32)
        gt_depth[:4] = true_d[:4]  # sparse cues; 0 = no depth
        # prediction is an exact affine transform of the true depth:
        # with masking the SSI fit is perfect on the 4 cue pixels
        pred = 2.0 * true_d + 0.5
        outputs = {
            "rgb_values": jnp.zeros((n, 3)),
            "depth": jnp.asarray(pred),
            "grad_theta": jnp.ones((n, 3)),
        }
        gt = {"rgb": jnp.zeros((n, 3)), "depth": jnp.asarray(gt_depth)}
        stats = neat_loss(outputs, gt, cfg)
        # unmasked zeros would ruin the fit (loss ~0.1); the alpha-gradient
        # term is first order in the f32 alignment residual, hence 1e-5
        assert float(stats["depth_loss"]) < 1e-5

    def test_missing_lines_npz_is_a_clear_error(self):
        import pytest

        from neat_tpu.data.datasets import load_scene

        with pytest.raises(ValueError, match="lines_npz"):
            load_scene("scene_line", lines_npz=None, data_dir="toy",
                       img_res=(64, 64), scan_id=1, data_root="/nonexistent",
                       distance_threshold=3.0, max_verts=16)


class TestScanNetScene:
    """ScanNet layout (reference scannet_hawp_dataset.py:16-95): pose/
    txts + shared intrinsic.txt + hawp jsons + optional depth_colmap."""

    @pytest.fixture(scope="class")
    def scene_dir(self, tmp_path_factory):
        from neat_tpu.data.synthetic import generate_scene

        d = tmp_path_factory.mktemp("scannet")
        generate_scene(str(d / "scn" / "0"), n_views=3, res=(48, 48),
                       convention="scannet")
        # one sparse colmap depth map: valid value + one beyond the 2 m clip
        dd = d / "scn" / "0" / "depth_colmap"
        dd.mkdir()
        dep = np.zeros((48, 48), np.float32)
        dep[10, 10] = 1.5
        dep[20, 20] = 5.0  # clipped to 0 by the loader
        np.save(dd / "image_0000.npy", dep)
        return str(d)

    def test_load(self, scene_dir):
        from neat_tpu.data.datasets import load_scene

        scene = load_scene(
            "scannet", data_dir="scn", scan_id="0", img_res=(48, 48),
            data_root=scene_dir, distance_threshold=3.0, max_verts=16,
        )
        assert scene.n_images == 3
        # wireframes packed like the other loaders
        assert scene.lines is not None and scene.mask is not None
        assert scene.support_idx is not None
        # shared intrinsic replicated per view; poses differ per view
        np.testing.assert_allclose(scene.intrinsics[0], scene.intrinsics[1])
        assert not np.allclose(scene.pose[0], scene.pose[1])
        # depth: reference clips > 2.0 to 0 (scannet_hawp_dataset.py:66)
        assert scene.depth is not None
        d0 = scene.depth[0].reshape(48, 48)
        assert d0[10, 10] == 1.5 and d0[20, 20] == 0.0
        assert scene.depth[1].sum() == 0.0  # missing file -> zeros

    def test_projection_consistency(self, scene_dir):
        import json

        from neat_tpu.data.datasets import load_scene

        scene = load_scene(
            "scannet", data_dir="scn", scan_id="0", img_res=(48, 48),
            data_root=scene_dir, distance_threshold=3.0, max_verts=16,
        )
        with open(osp.join(scene_dir, "scn", "0", "lines.json")) as f:
            gt = json.load(f)
        verts = np.asarray(gt["junctions"])
        k3 = scene.intrinsics[0][:3, :3]
        w2c = np.linalg.inv(scene.pose[0].astype(np.float64))
        cam = verts @ w2c[:3, :3].T + w2c[:3, 3]
        uv = (cam @ k3.T)
        uv = uv[:, :2] / uv[:, 2:]
        # the hawp json vertices were generated by this same projection
        with open(osp.join(scene_dir, "scn", "0", "hawp",
                           "image_0000.json")) as f:
            wf = json.load(f)
        det = np.asarray(wf["vertices"])
        d = np.abs(uv[:, None] - det[None]).sum(-1).min(1)
        assert d.max() < 1e-3


class TestLoadSceneForConfig:
    """The single runconf->scene dispatch used by runner, finalization,
    render eval, and the distill/debug CLIs (it used to exist as five
    divergent copies; scannet/scene_line misrouted to the blender loader)."""

    def _cfg(self, tmp_path, dataset_class, extra=""):
        import textwrap

        from neat_tpu.train.config import build_experiment_config, parse_hocon

        return build_experiment_config(parse_hocon(textwrap.dedent(f"""
            train {{
                expname = t
                dataset_class = {dataset_class}
                model_class = model.networks.neat_wfr_rend_a.VolSDFNetwork
                loss_class = model.networks.loss_wfr.VolSDFLoss
                num_pixels = 8
            }}
            loss {{
            }}
            dataset {{
                data_dir = toy
                img_res = [48, 48]
                distance_threshold = 3.0
                max_verts = 16
            {extra}
            }}
            model {{
            }}
        """)))

    def test_all_kinds_dispatch(self, tmp_path):
        import json

        from neat_tpu.data.synthetic import generate_scene
        from neat_tpu.data.datasets import load_scene_for_config

        generate_scene(str(tmp_path / "toy"), n_views=2, res=(48, 48))
        generate_scene(str(tmp_path / "toy" / "scan1"), n_views=2,
                       res=(48, 48), convention="dtu")
        generate_scene(str(tmp_path / "toy" / "0"), n_views=2,
                       res=(48, 48), convention="scannet")
        with open(tmp_path / "toy" / "scan1" / "lines.json") as f:
            gt = json.load(f)
        j = np.asarray(gt["junctions"], np.float32)
        np.savez(tmp_path / "lines3d.npz",
                 lines3d=j[np.asarray(gt["lines"], np.int64)])

        cases = [
            ("datasets.blender_hawp_dataset.BlenderDataset", "", True),
            ("datasets.scene_hawp_dataset.SceneDataset", "scan_id = 1", True),
            ("datasets.scannet_hawp_dataset.SceneDataset", "scan_id = 0", True),
            ("datasets.scene_line_dataset.SceneDataset",
             f"scan_id = 1\n    lines_npz = {tmp_path}/lines3d.npz", True),
            ("datasets.blender_dataset.BlenderDataset", "", False),
            ("datasets.scene_dataset.SceneDataset", "scan_id = 1", False),
        ]
        for cls, extra, has_wf in cases:
            cfg = self._cfg(tmp_path, cls, "    " + extra if extra else "")
            scene = load_scene_for_config(cfg, str(tmp_path))
            assert scene.n_images == 2, cls
            if has_wf:
                assert scene.lines is not None and scene.n_lines.max() > 0, cls
            else:
                # plain kinds carry INERT tables so the jitted step traces
                # (zero-score lines, empty verts mask, full pixel coverage)
                assert scene.n_lines.max() == 0 and not scene.verts_mask.any(), cls

    @pytest.mark.slow  # compiles + runs a train step; ~35 s
    def test_plain_dataset_kind_trains(self, tmp_path):
        """The vanilla (wireframe-less) dataset classes must TRAIN, not
        just load: the reference pairs them with plain VolSDF and samples
        pixels uniformly over the whole image (blender_dataset.py:108-112).
        Previously sample_batch crashed on the missing support tables."""
        import jax

        from neat_tpu.data.synthetic import generate_scene
        from neat_tpu.data.datasets import load_scene_for_config
        from neat_tpu.model.neat import init_neat
        from neat_tpu.model.loss import LossConfig
        from neat_tpu.train.step import init_train_state, make_train_step
        from neat_tpu.train.runner import scene_to_device

        generate_scene(str(tmp_path / "toy"), n_views=2, res=(48, 48))
        cfg = self._cfg(tmp_path, "datasets.blender_dataset.BlenderDataset")
        scene = load_scene_for_config(cfg, str(tmp_path))
        # full-coverage uniform sampling tables
        assert scene.support_count.tolist() == [48 * 48] * 2
        assert not scene.verts_mask.any()

        import dataclasses as dc

        mcfg = dc.replace(
            cfg.model,
            implicit=dc.replace(cfg.model.implicit, dims=(16,) * 4,
                                skip_in=(2,), multires=2),
            sampler=dc.replace(cfg.model.sampler, n_samples=4,
                               n_samples_eval=8, n_samples_extra=2,
                               max_total_iters=1),
        )
        params = init_neat(jax.random.PRNGKey(0), mcfg)
        state = init_train_state(params, 5e-4, 0.1, 10)
        step = make_train_step(
            mcfg, LossConfig(line_weight=0.0, junction_3d_weight=0.0,
                             junction_2d_weight=0.0),
            5e-4, 0.1, 10, n_rays=16, img_width=48, donate=False,
        )
        state, aux = step(state, scene_to_device(scene), jax.random.PRNGKey(1))
        assert np.isfinite(float(np.asarray(aux["loss"])))

    def test_scene_line_kind_samples_all_pixels(self, tmp_path):
        """scene_line keeps its line tables but draws training pixels from
        the whole image (scene_line_dataset.py:142-146)."""
        import json

        from neat_tpu.data.synthetic import generate_scene
        from neat_tpu.data.datasets import load_scene_for_config

        generate_scene(str(tmp_path / "toy" / "scan1"), n_views=2,
                       res=(48, 48), convention="dtu")
        with open(tmp_path / "toy" / "scan1" / "lines.json") as f:
            gt = json.load(f)
        j = np.asarray(gt["junctions"], np.float32)
        np.savez(tmp_path / "lines3d.npz",
                 lines3d=j[np.asarray(gt["lines"], np.int64)])
        cfg = self._cfg(
            tmp_path, "datasets.scene_line_dataset.SceneDataset",
            f"    scan_id = 1\n    lines_npz = {tmp_path}/lines3d.npz",
        )
        scene = load_scene_for_config(cfg, str(tmp_path))
        assert scene.support_count.tolist() == [48 * 48] * 2
        assert scene.lines is not None  # line supervision retained

    def test_distance_threshold_override(self, tmp_path):
        from neat_tpu.data.synthetic import generate_scene
        from neat_tpu.data.datasets import load_scene_for_config

        generate_scene(str(tmp_path / "toy"), n_views=2, res=(48, 48))
        cfg = self._cfg(tmp_path, "datasets.blender_hawp_dataset.BlenderDataset")
        wide = load_scene_for_config(cfg, str(tmp_path))
        narrow = load_scene_for_config(cfg, str(tmp_path),
                                       distance_threshold=1.0)
        # the finalization rebuild (threshold 1.0) selects fewer support
        # pixels than the training threshold
        assert narrow.mask.sum() <= wide.mask.sum()
