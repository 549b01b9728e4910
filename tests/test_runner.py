"""Runner / checkpoint / config integration tests on the synthetic scene."""

import os
import os.path as osp

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # trains end-to-end; opt-in via -m slow

from neat_tpu.data.synthetic import generate_scene

TINY_CONF = """
train {
    expname = tiny
    dataset_class = datasets.blender_hawp_dataset.BlenderDataset
    model_class = model.networks.neat_wfr_rend_a.VolSDFNetwork
    loss_class = model.networks.loss_wfr.VolSDFLoss
    learning_rate = 5.0e-4
    num_pixels = 32
    checkpoint_freq = 1
    plot_freq = 100
    split_n_pixels = 256
}
plot {
    plot_nimgs = 1
    resolution = 32
    grid_boundary = [-1.5, 1.5]
}
loss {
    eikonal_weight = 0.1
    line_weight = 0.01
    rgb_loss = torch.nn.L1Loss
}
dataset {
    data_dir = toy
    img_res = [48, 48]
}
model {
    feature_vector_size = 16
    scene_bounding_sphere = 3.0
    dbscan_enabled = False
    use_median = True
    global_junctions {
        num_junctions = 8
        num_layers = 2
        dim_out = 3
        dim_hidden = 16
    }
    implicit_network {
        d_in = 3
        d_out = 1
        dims = [32, 32, 32, 32]
        geometric_init = True
        bias = 0.6
        skip_in = [2]
        weight_norm = True
        multires = 4
        sphere_scale = 20.0
    }
    attraction_network {
        d_in = 9
        d_out = 6
        dims = [16, 16]
        mode = idr
        weight_norm = True
    }
    rendering_network {
        mode = idr
        d_in = 9
        d_out = 3
        dims = [16, 16]
        weight_norm = True
        multires_view = 2
    }
    density {
        params_init { beta = 0.1 }
        beta_min = 0.0001
    }
    ray_sampler {
        near = 0.0
        N_samples = 8
        N_samples_eval = 16
        N_samples_extra = 4
        eps = 0.1
        beta_iters = 4
        max_total_iters = 2
    }
}
"""


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    d = tmp_path_factory.mktemp("runner_ws")
    os.makedirs(d / "toy")
    generate_scene(str(d / "toy"), n_views=4, res=(48, 48))
    conf = d / "tiny.conf"
    conf.write_text(TINY_CONF)
    return d


class TestRunner:
    def test_train_save_resume(self, workspace):
        from neat_tpu.train.runner import TrainRunner
        from neat_tpu.train.checkpoint import load_checkpoint, sweep_checkpoint

        r = TrainRunner(
            conf=str(workspace / "tiny.conf"),
            data_root=str(workspace),
            exps_folder=str(workspace / "exps"),
            nepochs=1,
            max_verts=16,
        )
        r.run()
        # artifacts
        assert osp.exists(osp.join(r.rundir, "runconf.conf"))
        assert osp.exists(osp.join(r.rundir, "train.log"))
        assert osp.exists(osp.join(r.ckpt_dir, "latest.ckpt"))
        assert osp.exists(osp.join(r.ckpt_dir, "ModelParameters", "latest.npz"))
        assert osp.exists(osp.join(r.junctions_dir, "0.npy"))
        assert osp.exists(osp.join(r.plots_dir, "cameras.png"))

        state, epoch = load_checkpoint(r.ckpt_dir, "latest")
        assert epoch == 1
        assert int(np.asarray(state.step)) == r.n_views * 2  # epochs 0..1

        # resume continues from the stored epoch with exact optimizer state
        r2 = TrainRunner(
            conf=str(workspace / "tiny.conf"),
            data_root=str(workspace),
            exps_folder=str(workspace / "exps"),
            nepochs=2,
            is_continue=True,
            max_verts=16,
        )
        assert r2.start_epoch == 1
        assert int(np.asarray(r2.state.step)) == int(np.asarray(state.step))
        r2.run()
        state2, epoch2 = load_checkpoint(r2.ckpt_dir, "latest")
        assert epoch2 == 2

        # sweep finds a unique checkpoint tag
        ts = sweep_checkpoint(osp.dirname(r.rundir), "0")
        assert ts == osp.basename(r.rundir)

    def test_runconf_reparses(self, workspace):
        from neat_tpu.train.runner import TrainRunner
        from neat_tpu.train.config import load_experiment_config

        exps = str(workspace / "exps")
        # any rundir from the previous test
        import glob

        runconf = sorted(glob.glob(osp.join(exps, "tiny", "*", "runconf.conf")))[0]
        cfg = load_experiment_config(runconf)
        assert cfg.expname == "tiny"
        assert cfg.model.junctions.num_junctions == 8


class TestScanNetRunner:
    """The ScanNet dataset branch trains end-to-end through a
    reference-style conf (scannet_hawp_dataset.SceneDataset)."""

    def test_train_two_epochs(self, tmp_path):
        from neat_tpu.train.runner import TrainRunner

        generate_scene(str(tmp_path / "scn" / "0"), n_views=3, res=(48, 48),
                       convention="scannet")
        conf = TINY_CONF.replace(
            "dataset_class = datasets.blender_hawp_dataset.BlenderDataset",
            "dataset_class = datasets.scannet_hawp_dataset.SceneDataset",
        ).replace(
            "data_dir = toy",
            "data_dir = scn\n    scan_id = 0\n    distance_threshold = 3.0\n"
            "    max_verts = 16",
        )
        cpath = tmp_path / "scannet.conf"
        cpath.write_text(conf)
        r = TrainRunner(conf=str(cpath), data_root=str(tmp_path),
                        exps_folder=str(tmp_path / "exps"), nepochs=2)
        r.run()
        assert osp.exists(osp.join(r.rundir, "checkpoints", "latest.ckpt"))


class TestInterruptSave:
    def test_interrupt_saves_current_epoch(self, workspace, tmp_path):
        """An interrupt mid-run must checkpoint the epoch training had
        actually reached (resume re-runs the in-flight epoch), not
        start_epoch — a stale tag would re-run the whole schedule."""
        from neat_tpu.train.checkpoint import load_checkpoint
        from neat_tpu.train.runner import TrainRunner

        r = TrainRunner(
            conf=str(workspace / "tiny.conf"),
            data_root=str(workspace),
            exps_folder=str(tmp_path / "exps"),
            nepochs=10,
        )
        orig = r.dump_junctions
        armed = {"on": True}

        def bomb(epoch):
            if epoch == 3 and armed["on"]:
                armed["on"] = False
                raise KeyboardInterrupt
            orig(epoch)

        r.dump_junctions = bomb
        with pytest.raises(KeyboardInterrupt):
            r.run()
        _, epoch = load_checkpoint(
            osp.join(r.rundir, "checkpoints"), "latest"
        )
        assert epoch == 3


class TestMeshRunner:
    def test_train_on_virtual_mesh(self, workspace, tmp_path):
        """The runner's use_mesh path trains on the 8-device virtual CPU
        mesh (scene sharded, params replicated) end-to-end."""
        from neat_tpu.train.runner import TrainRunner

        r = TrainRunner(
            conf=str(workspace / "tiny.conf"),
            data_root=str(workspace),
            exps_folder=str(tmp_path / "exps"),
            nepochs=2,
            use_mesh=True,
        )
        assert r.mesh is not None and r.mesh.devices.size == 8
        assert r.parallel_mode == "gspmd"  # auto: no pallas on CPU
        r.run()
        assert osp.exists(osp.join(r.rundir, "checkpoints", "latest.ckpt"))

    def test_train_on_virtual_mesh_shard_map(self, workspace, tmp_path):
        """--parallel_mode shard_map: the pod step (per-shard forward +
        all_gather + psum'd grads) trains end-to-end through the runner on
        the 8-device virtual mesh (num_pixels=32 divides by 8)."""
        from neat_tpu.train.runner import TrainRunner

        r = TrainRunner(
            conf=str(workspace / "tiny.conf"),
            data_root=str(workspace),
            exps_folder=str(tmp_path / "exps"),
            nepochs=2,
            use_mesh=True,
            parallel_mode="shard_map",
        )
        assert r.parallel_mode == "shard_map"
        r.run()
        assert osp.exists(osp.join(r.rundir, "checkpoints", "latest.ckpt"))
