"""Hermetic contract tests for the monodepth preprocessing hook (C29).

The real omnidata/DPT weights are external downloads in the reference too
(data/preprocess/monodepth.py:74-103 loads omnidata_dpt_depth_v2.ckpt from
disk); this zero-egress image can never run them. What CAN be pinned
hermetically — and is, here — is the full cue contract around the model:

  stubbed backbone -> per-image ``<stem>_depth.npy`` cue files
    -> load_dtu_scene(depth_dir=...) (scene_line_depth_dataset.py:121-129)
    -> sample_batch ground_truth['depth']
    -> the spd (L1) and rpd (SSI) loss terms.

Both gated backend branches of neat_tpu/data/monodepth.py run against
stubs: the omnidata import path (fake module tree + checkpoint on disk)
and the transformers-pipeline fallback.
"""

import os
import os.path as osp
import sys
import types

import numpy as np
import pytest

from neat_tpu.data import monodepth

RES = (24, 24)


def _write_images(d, n=2, res=RES):
    import imageio.v2 as imageio

    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(n):
        img = (rs.rand(res[0], res[1], 3) * 255).astype(np.uint8)
        imageio.imwrite(osp.join(d, f"{i:06d}.png"), img)


@pytest.fixture
def fake_omnidata(tmp_path, monkeypatch):
    """Install a fake omnidata_tools module tree whose DPTDepthModel has
    the constructor/forward surface monodepth.run drives, plus a loadable
    checkpoint on disk."""
    import torch

    class DPTDepthModel(torch.nn.Module):
        def __init__(self, backbone="vitb_rn50_384", num_channels=1):
            super().__init__()
            assert backbone == "vitb_rn50_384"
            self.num_channels = num_channels
            self.scale = torch.nn.Parameter(torch.ones(()))

        def forward(self, x):  # x: (1, 3, H, W)
            d = x.mean(dim=1) * self.scale  # (1, H, W)
            if self.num_channels == 3:
                return x * self.scale  # (1, 3, H, W) pseudo-normals
            return d

    mods = {}
    for name in (
        "omnidata_tools",
        "omnidata_tools.torch",
        "omnidata_tools.torch.modules",
        "omnidata_tools.torch.modules.midas",
        "omnidata_tools.torch.modules.midas.dpt_depth",
    ):
        mods[name] = types.ModuleType(name)
    mods["omnidata_tools.torch.modules.midas.dpt_depth"].DPTDepthModel = (
        DPTDepthModel
    )
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)

    ckpt = tmp_path / "fake_omnidata.ckpt"
    torch.save({"state_dict": DPTDepthModel().state_dict()}, str(ckpt))
    monkeypatch.setenv("OMNIDATA_WEIGHTS", str(ckpt))
    return DPTDepthModel


class TestBackendBranches:
    def test_omnidata_depth_and_normal(self, tmp_path, fake_omnidata):
        img_dir = str(tmp_path / "image")
        _write_images(img_dir, n=2)
        n = monodepth.run(img_dir, str(tmp_path / "cues"), task="depth")
        assert n == 2
        for i in range(2):
            d = np.load(tmp_path / "cues" / f"{i:06d}_depth.npy")
            assert d.shape == RES
            assert np.isfinite(d).all()
        # normal task writes 3-channel cues (omnidata only)
        n = monodepth.run(img_dir, str(tmp_path / "cues"), task="normal")
        assert n == 2
        nm = np.load(tmp_path / "cues" / "000000_normal.npy")
        assert nm.shape == (3,) + RES

    @pytest.mark.slow  # loads a transformers pipeline; ~50 s
    def test_transformers_fallback(self, tmp_path, monkeypatch):
        transformers = pytest.importorskip("transformers")
        img_dir = str(tmp_path / "image")
        _write_images(img_dir, n=1)
        monkeypatch.setattr(monodepth, "_try_omnidata", lambda task: None)
        monkeypatch.setattr(
            monodepth, "_try_transformers_dpt", lambda: "transformers"
        )

        def fake_pipeline(task, device=-1):
            assert task == "depth-estimation"

            def pipe(img):
                arr = np.asarray(img, dtype=np.float32) / 255.0
                return {"predicted_depth": arr.mean(axis=-1)[None]}

            return pipe

        # transformers is a _LazyModule: the first attribute READ swaps
        # sys.modules["transformers"] for a materialized module, so patch
        # the post-materialization object or run()'s `from transformers
        # import pipeline` would see the real function
        _ = transformers.pipeline
        monkeypatch.setattr(
            sys.modules["transformers"], "pipeline", fake_pipeline
        )
        n = monodepth.run(img_dir, str(tmp_path / "cues"), task="depth")
        assert n == 1
        d = np.load(tmp_path / "cues" / "000000_depth.npy")
        assert d.shape == RES  # squeezed from (1, H, W)

    def test_no_backend_is_a_clear_error(self, tmp_path, monkeypatch):
        monkeypatch.setattr(monodepth, "_try_omnidata", lambda task: None)
        monkeypatch.setattr(monodepth, "_try_transformers_dpt", lambda: None)
        with pytest.raises(SystemExit, match="No monocular-cue backend"):
            monodepth.run(str(tmp_path), str(tmp_path / "cues"))


class TestCueToLossChain:
    """Cue files produced by the (stubbed) preprocessor feed the spd/rpd
    losses through the real loader and batch sampler."""

    @pytest.fixture(scope="class")
    def scene(self, tmp_path_factory):
        import contextlib

        from neat_tpu.data.datasets import load_dtu_scene
        from neat_tpu.data.synthetic import generate_scene

        root = tmp_path_factory.mktemp("mono_chain")
        inst = root / "DTU" / "scan0"
        generate_scene(str(inst), n_views=3, res=(32, 32), convention="dtu")

        # run the omnidata-stubbed preprocessor over the scene's own images
        import torch

        class DPTDepthModel(torch.nn.Module):
            def __init__(self, backbone="vitb_rn50_384", num_channels=1):
                super().__init__()
                self.scale = torch.nn.Parameter(torch.ones(()))

            def forward(self, x):
                return x.mean(dim=1) * self.scale + 1.0  # strictly positive

        mods = {}
        for name in (
            "omnidata_tools",
            "omnidata_tools.torch",
            "omnidata_tools.torch.modules",
            "omnidata_tools.torch.modules.midas",
            "omnidata_tools.torch.modules.midas.dpt_depth",
        ):
            mods[name] = types.ModuleType(name)
        mods["omnidata_tools.torch.modules.midas.dpt_depth"].DPTDepthModel = (
            DPTDepthModel
        )
        ckpt = root / "w.ckpt"
        torch.save({"state_dict": DPTDepthModel().state_dict()}, str(ckpt))
        old_env = os.environ.get("OMNIDATA_WEIGHTS")
        old_mods = {k: sys.modules.get(k) for k in mods}
        try:
            sys.modules.update(mods)
            os.environ["OMNIDATA_WEIGHTS"] = str(ckpt)
            monodepth.run(
                str(inst / "image"), str(inst / "monodepth"), task="depth"
            )
        finally:
            for k, v in old_mods.items():
                if v is None:
                    sys.modules.pop(k, None)
                else:
                    sys.modules[k] = v
            if old_env is None:
                os.environ.pop("OMNIDATA_WEIGHTS", None)
            else:
                os.environ["OMNIDATA_WEIGHTS"] = old_env

        return load_dtu_scene(
            "DTU", (32, 32), scan_id=0, data_root=str(root),
            distance_threshold=3.0, max_verts=16, depth_dir="monodepth",
        )

    def test_loader_attaches_cues(self, scene):
        assert scene.depth is not None
        assert scene.depth.shape == (scene.n_images, 32 * 32)
        assert (scene.depth > 0).all()

    @pytest.mark.slow  # full forward+loss compile chain; ~90 s
    def test_ground_truth_and_both_loss_kinds(self, scene):
        import jax

        from neat_tpu.model.loss import LossConfig, neat_loss
        from neat_tpu.model.neat import NeatConfig, init_neat, neat_forward
        from neat_tpu.fields.mlp import GlobalJunctionsConfig, ImplicitNetConfig
        from neat_tpu.sampling.samplers import ErrorBoundSamplerConfig
        from neat_tpu.train.runner import scene_to_device
        from neat_tpu.train.step import sample_batch

        scene_dev = scene_to_device(scene)
        assert "depth" in scene_dev
        n_rays = 16
        inputs, gt = sample_batch(
            jax.random.PRNGKey(0), scene_dev, n_rays, 32
        )
        assert gt["depth"].shape == (n_rays,)

        cfg = NeatConfig(
            scene_bounding_sphere=3.0,
            implicit=ImplicitNetConfig(dims=(32,) * 3, skip_in=(1,), multires=4),
            junctions=GlobalJunctionsConfig(num_junctions=8, dim_hidden=32),
            sampler=ErrorBoundSamplerConfig(
                n_samples=6, n_samples_eval=8, n_samples_extra=2,
                max_total_iters=2,
            ),
            max_verts=16,
        )
        params = init_neat(jax.random.PRNGKey(1), cfg)
        out = neat_forward(
            params, inputs, cfg, jax.random.PRNGKey(2), training=True
        )
        base = neat_loss(out, gt, LossConfig())
        assert "depth_loss" not in base  # cues are opt-in via depth_weight
        for kind in ("l1", "ssi"):  # spd / rpd(SSI)
            losses = neat_loss(
                out, gt,
                LossConfig(depth_weight=0.1, depth_loss_kind=kind),
            )
            assert float(losses["depth_loss"]) > 0.0
            assert float(losses["loss"]) > float(base["loss"]) - 1e-6
