"""Round-trip test: build a torch module tree shaped like the reference
VolSDFNetwork state dict, import it, and verify the jax forward matches a
manual torch forward of the same MLP."""

from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neat_tpu.model.neat import NeatConfig  # noqa: E402
from neat_tpu.fields.mlp import (  # noqa: E402
    ImplicitNetConfig,
    GlobalJunctionsConfig,
    implicit_sdf,
    global_junctions_forward,
)
from neat_tpu.interop.torch_import import reference_state_to_params  # noqa: E402


def build_torch_state(dims, skip_in, multires, junctions=4, hidden=16):
    """Construct a reference-shaped state dict with weight-norm params."""
    import math

    rng = np.random.RandomState(0)
    state = {}
    emb = 3 * (1 + 2 * multires)
    layer_dims = [emb] + list(dims) + [1 + 16]  # feature 16
    for l in range(len(layer_dims) - 1):
        out_d = layer_dims[l + 1] - layer_dims[0] if (l + 1) in skip_in else layer_dims[l + 1]
        in_d = layer_dims[l]
        v = rng.randn(out_d, in_d).astype(np.float32) * 0.2
        g = np.linalg.norm(v, axis=1, keepdims=True) * (1 + 0.1 * rng.rand(out_d, 1))
        state[f"implicit_network.lin{l}.weight_v"] = torch.tensor(v)
        state[f"implicit_network.lin{l}.weight_g"] = torch.tensor(g.astype(np.float32))
        state[f"implicit_network.lin{l}.bias"] = torch.tensor(
            rng.randn(out_d).astype(np.float32) * 0.01
        )
    # rendering net (5 linears for dims 4x16)
    rdims = [9 + 16] + [hidden] * 4 + [3]
    for l in range(len(rdims) - 1):
        v = rng.randn(rdims[l + 1], rdims[l]).astype(np.float32) * 0.2
        g = np.linalg.norm(v, axis=1, keepdims=True)
        state[f"rendering_network.lin{l}.weight_v"] = torch.tensor(v)
        state[f"rendering_network.lin{l}.weight_g"] = torch.tensor(g.astype(np.float32))
        state[f"rendering_network.lin{l}.bias"] = torch.tensor(
            rng.randn(rdims[l + 1]).astype(np.float32) * 0.01
        )
    # attraction (same shape but d_out 6)
    adims = [9 + 16] + [hidden] * 4 + [6]
    for l in range(len(adims) - 1):
        v = rng.randn(adims[l + 1], adims[l]).astype(np.float32) * 0.2
        g = np.linalg.norm(v, axis=1, keepdims=True)
        state[f"attraction_network.lin{l}.weight_v"] = torch.tensor(v)
        state[f"attraction_network.lin{l}.weight_g"] = torch.tensor(g.astype(np.float32))
        state[f"attraction_network.lin{l}.bias"] = torch.tensor(
            rng.randn(adims[l + 1]).astype(np.float32) * 0.01
        )
    state["density.beta"] = torch.tensor(np.float32(0.13))
    state["latents"] = torch.tensor(rng.randn(junctions, hidden).astype(np.float32))
    for i, mod in enumerate([0, 2, 4]):
        d_out = 3 if i == 2 else hidden
        state[f"ffn.{mod}.weight"] = torch.tensor(
            rng.randn(d_out, hidden).astype(np.float32) * 0.2
        )
        state[f"ffn.{mod}.bias"] = torch.tensor(
            rng.randn(d_out).astype(np.float32) * 0.01
        )
    return state


def torch_sdf_forward(state, x, dims, skip_in, multires):
    """Manual torch forward replicating the reference ImplicitNetwork."""
    import torch.nn.functional as F

    freqs = 2.0 ** torch.linspace(0.0, multires - 1, multires)
    parts = [x]
    for f in freqs:
        parts += [torch.sin(x * f), torch.cos(x * f)]
    # NOTE: reference order is per-frequency sin,cos — matches our embed
    inp = torch.cat(parts, dim=-1)
    h = inp
    emb = inp.shape[-1]
    layer_dims = [emb] + list(dims) + [1 + 16]
    n_layers = len(layer_dims)
    for l in range(n_layers - 1):
        if l in skip_in:
            h = torch.cat([h, inp], dim=1) / np.sqrt(2)
        v = state[f"implicit_network.lin{l}.weight_v"]
        g = state[f"implicit_network.lin{l}.weight_g"]
        b = state[f"implicit_network.lin{l}.bias"]
        w = g * v / v.norm(dim=1, keepdim=True)
        h = h @ w.T + b
        if l < n_layers - 2:
            h = F.softplus(h, beta=100)
    return h[:, 0]


class TestTorchImport:
    dims = (24, 24, 24, 24)
    skip_in = (2,)
    multires = 2

    def cfg(self):
        return NeatConfig(
            feature_vector_size=16,
            implicit=ImplicitNetConfig(
                feature_vector_size=16,
                dims=self.dims,
                skip_in=self.skip_in,
                multires=self.multires,
                sdf_bounding_sphere=0.0,
            ),
            rendering=dataclasses_replace_render(16, 3),
            attraction=dataclasses_replace_render(16, 6),
            junctions=GlobalJunctionsConfig(num_junctions=4, dim_hidden=16, num_layers=2),
        )

    def test_roundtrip_sdf(self):
        state = build_torch_state(self.dims, self.skip_in, self.multires)
        cfg = self.cfg()
        params = reference_state_to_params(state, cfg)

        x = np.random.RandomState(1).randn(32, 3).astype(np.float32)
        ours = np.asarray(
            implicit_sdf(params["implicit"], jnp.asarray(x), cfg.implicit)
        )[:, 0]
        theirs = (
            torch_sdf_forward(state, torch.tensor(x), self.dims, self.skip_in, self.multires)
            .detach()
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_junctions_shape(self):
        state = build_torch_state(self.dims, self.skip_in, self.multires)
        cfg = self.cfg()
        params = reference_state_to_params(state, cfg)
        pts = global_junctions_forward(params["junctions"], cfg.junctions)
        assert pts.shape == (4, 3)
        assert np.isfinite(np.asarray(pts)).all()

    def test_density_beta(self):
        state = build_torch_state(self.dims, self.skip_in, self.multires)
        params = reference_state_to_params(state, self.cfg())
        assert np.isclose(float(params["density"].beta), 0.13)


class TestConvertCli:
    def test_pth_to_rundir(self, tmp_path):
        """Full CLI path: torch .pth -> run dir consumable by load_checkpoint."""
        from neat_tpu.interop.convert_checkpoint import main as convert_main
        from neat_tpu.train.checkpoint import load_checkpoint

        state = build_torch_state((24,) * 4, (2,), 2)
        pth = tmp_path / "500.pth"
        torch.save({"epoch": 500, "model_state_dict": state}, pth)

        conf = tmp_path / "test.conf"
        conf.write_text(
            """
train {
    expname = imported
    model_class = model.networks.neat_wfr_rend_a.VolSDFNetwork
    dataset_class = datasets.blender_hawp_dataset.BlenderDataset
    loss_class = model.networks.loss_wfr.VolSDFLoss
    learning_rate = 5.0e-4
}
dataset {
    data_dir = x
    img_res = [48, 48]
}
model {
    feature_vector_size = 16
    scene_bounding_sphere = 3.0
    global_junctions {
        num_junctions = 4
        num_layers = 2
        dim_hidden = 16
    }
    implicit_network {
        d_in = 3
        d_out = 1
        dims = [24, 24, 24, 24]
        skip_in = [2]
        multires = 2
    }
    attraction_network {
        d_in = 9
        d_out = 6
        dims = [16, 16, 16, 16]
    }
    rendering_network {
        d_in = 9
        d_out = 3
        dims = [16, 16, 16, 16]
    }
    density {
        params_init { beta = 0.1 }
    }
    ray_sampler {
        near = 0.0
        N_samples = 8
        N_samples_eval = 16
        N_samples_extra = 4
    }
}
"""
        )
        out = tmp_path / "rundir"
        convert_main([
            "--pth", str(pth), "--conf", str(conf), "--out", str(out)
        ])
        state2, epoch = load_checkpoint(str(out / "checkpoints"), "latest")
        assert epoch == 500
        assert np.isclose(float(state2.params["density"].beta), 0.13)
        assert (out / "runconf.conf").exists()


def dataclasses_replace_render(feat, d_out):
    from neat_tpu.fields.mlp import RenderNetConfig

    return RenderNetConfig(
        feature_vector_size=feat, d_out=d_out, dims=(16,) * 4, multires_view=0
    )


class TestTorchExport:
    """torch_export is the exact inverse of torch_import."""

    def test_export_import_roundtrip(self):
        import jax

        from neat_tpu.interop.torch_export import params_to_reference_state
        from neat_tpu.model.neat import NeatConfig, init_neat

        cfg = NeatConfig.for_abc()
        params = init_neat(jax.random.PRNGKey(0), cfg)
        state = params_to_reference_state(params, cfg)
        # reference key layout present
        assert "implicit_network.lin0.weight_v" in state
        assert "rendering_network.lin0.weight_g" in state
        assert "attraction_network.lin0.bias" in state
        assert state["density.beta"].shape == (1,)
        assert "latents" in state and "ffn.0.weight" in state

        back = reference_state_to_params(state, cfg)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(back)}
        for k, v in flat_a:
            key = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                np.asarray(v, dtype=np.float32).reshape(np.asarray(flat_b[key]).shape),
                np.asarray(flat_b[key]),
                rtol=0, atol=0,
                err_msg=key,
            )

    def test_export_cli(self, tmp_path):
        import jax

        from neat_tpu.interop.torch_export import main as export_main
        from neat_tpu.model.neat import NeatConfig, init_neat
        from neat_tpu.train.step import init_train_state
        from neat_tpu.train.checkpoint import save_checkpoint

        # fabricate a minimal rundir
        import shutil

        rundir = tmp_path / "run"
        (rundir / "checkpoints").mkdir(parents=True)
        root = Path(__file__).resolve().parents[1]
        shutil.copy(root / "confs" / "abc-neat-a.conf", rundir / "runconf.conf")
        cfg = NeatConfig.for_abc()
        params = init_neat(jax.random.PRNGKey(0), cfg)
        state = init_train_state(params, 5e-4, 0.1, 100)
        save_checkpoint(str(rundir / "checkpoints"), state, 7)

        out = tmp_path / "export.pth"
        export_main(["--rundir", str(rundir), "--out", str(out)])
        payload = torch.load(out, map_location="cpu", weights_only=False)
        assert payload["epoch"] == 7
        assert "implicit_network.lin0.weight_v" in payload["model_state_dict"]
