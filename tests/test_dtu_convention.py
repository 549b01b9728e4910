"""DTU-convention loader test on a synthetic scene: the P = world_mat @
scale_mat decomposition must recover the same cameras the blender-style
loader reads directly."""

import os

import numpy as np
import pytest

from neat_tpu.data.synthetic import generate_scene
from neat_tpu.data.datasets import load_blender_scene, load_dtu_scene


@pytest.fixture(scope="module")
def scene_dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("dtu_conv")
    os.makedirs(d / "toy")
    os.makedirs(d / "dtu_root" / "scan7", exist_ok=True)
    generate_scene(str(d / "toy"), n_views=5, res=(48, 48), convention="blender")
    generate_scene(
        str(d / "dtu_root" / "scan7"), n_views=5, res=(48, 48), convention="dtu"
    )
    return d


class TestDtuConvention:
    def test_decomposition_matches_blender(self, scene_dirs):
        b = load_blender_scene(
            "toy", (48, 48), data_root=str(scene_dirs), distance_threshold=3.0,
            max_verts=16,
        )
        dtu = load_dtu_scene(
            "dtu_root", (48, 48), scan_id=7, data_root=str(scene_dirs),
            distance_threshold=3.0, max_verts=16,
        )
        assert dtu.n_images == b.n_images
        # same camera rig (both generators use the same seed)
        np.testing.assert_allclose(dtu.pose, b.pose, atol=1e-4)
        np.testing.assert_allclose(
            dtu.intrinsics[:, :3, :3], b.intrinsics[:, :3, :3], atol=1e-3
        )
        # identical wireframe supervision tables
        np.testing.assert_array_equal(dtu.mask, b.mask)
        np.testing.assert_allclose(dtu.uv_proj, b.uv_proj, atol=1e-5)

    @pytest.mark.slow
    def test_trainable(self, scene_dirs):
        import jax
        from neat_tpu.model.neat import NeatConfig, init_neat
        from neat_tpu.model.loss import LossConfig
        from neat_tpu.fields.mlp import ImplicitNetConfig, GlobalJunctionsConfig
        from neat_tpu.sampling.samplers import ErrorBoundSamplerConfig
        from neat_tpu.train.step import init_train_state, make_train_step
        from neat_tpu.train.runner import scene_to_device

        dtu = load_dtu_scene(
            "dtu_root", (48, 48), scan_id=7, data_root=str(scene_dirs),
            distance_threshold=3.0, max_verts=16,
        )
        cfg = NeatConfig(
            implicit=ImplicitNetConfig(dims=(32,) * 4, skip_in=(2,), multires=4),
            junctions=GlobalJunctionsConfig(num_junctions=8, dim_hidden=16),
            sampler=ErrorBoundSamplerConfig(
                n_samples=8, n_samples_eval=16, n_samples_extra=4, max_total_iters=2
            ),
            max_verts=16,
            dbscan_enabled=True,  # the DTU conf path
        )
        params = init_neat(jax.random.PRNGKey(0), cfg)
        state = init_train_state(params, 5e-4, 0.1, 10)
        step = make_train_step(cfg, LossConfig(), 5e-4, 0.1, 10, 32, 48, donate=False)
        scene_dev = scene_to_device(dtu)
        state, aux = step(state, scene_dev, jax.random.PRNGKey(1))
        assert np.isfinite(float(np.asarray(aux["loss"])))
