"""Export neat_tpu parameters as a reference (PyTorch) checkpoint.

The exact inverse of torch_import: writes a ``model_state_dict`` whose
keys follow the reference VolSDFNetwork module tree (reference
code/model/networks/neat_wfr_rend_a.py; key layout documented in
torch_import.py), wrapped in the ``{"epoch": ..., "model_state_dict":
...}`` payload the reference's resume path and finalization scripts read
(reference code/training/volsdf_train.py:252-272,
code/neat-final-parsing.py:366). This lets a model trained here be
opened by the reference's own tooling (viewers, eval scripts) — the
switch-back path for reference users.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..model.neat import NeatConfig

Params = Dict[str, Any]


def _t(a, dtype=np.float32):
    import torch

    return torch.from_numpy(np.asarray(a, dtype=dtype))


def _export_linear(out: Dict[str, Any], prefix: str, lin: Dict[str, Any], dtype):
    if "v" in lin:
        # torch weight_norm stores g as (out, 1)
        out[f"{prefix}.weight_g"] = _t(lin["g"], dtype).reshape(-1, 1)
        out[f"{prefix}.weight_v"] = _t(lin["v"], dtype)
        out[f"{prefix}.bias"] = _t(lin["b"], dtype)
    else:
        out[f"{prefix}.weight"] = _t(lin["w"], dtype)
        out[f"{prefix}.bias"] = _t(lin["b"], dtype)


def _export_mlp(out: Dict[str, Any], prefix: str, mlp: Params, dtype):
    for name, lin in mlp.items():
        assert name.startswith("lin"), name
        _export_linear(out, f"{prefix}.{name}", lin, dtype)


def params_to_reference_state(
    params: Params, cfg: NeatConfig, dtype=np.float32
) -> Dict[str, Any]:
    """Map the neat_tpu param pytree onto a reference model_state_dict.

    ``dtype`` is float32 for checkpoint export; the f64 parity tests pass
    float64 to compare values without a narrowing cast.
    """
    state: Dict[str, Any] = {}
    _export_mlp(state, "implicit_network", params["implicit"], dtype)
    _export_mlp(state, "rendering_network", params["rendering"], dtype)
    if "attraction" in params:
        _export_mlp(state, "attraction_network", params["attraction"], dtype)
    state["density.beta"] = _t(params["density"].beta, dtype).reshape(1)
    if "junctions" in params:
        state["latents"] = _t(params["junctions"]["latents"], dtype)
        for i in range(cfg.junctions.num_layers + 1):
            _export_linear(
                state, f"ffn.{2 * i}", params["junctions"]["ffn"][f"lin{i}"], dtype
            )
    return state


def export_reference_checkpoint(
    path: str, params: Params, cfg: NeatConfig, epoch: int = 0
):
    """Write a ModelParameters-style .pth payload (requires torch)."""
    import torch

    torch.save(
        {"epoch": epoch, "model_state_dict": params_to_reference_state(params, cfg)},
        path,
    )


def main(argv=None):
    from ..utils.platform import apply_env_platform

    apply_env_platform()
    import argparse
    import os.path as osp

    parser = argparse.ArgumentParser(
        description="export a neat_tpu checkpoint as a reference .pth"
    )
    parser.add_argument("--rundir", required=True, help="training run dir")
    parser.add_argument("--checkpoint", default="latest")
    parser.add_argument("--out", required=True, help="output .pth path")
    args = parser.parse_args(argv)

    from ..train.checkpoint import load_checkpoint
    from ..train.config import load_experiment_config

    cfg = load_experiment_config(osp.join(args.rundir, "runconf.conf"))
    state, epoch = load_checkpoint(
        osp.join(args.rundir, "checkpoints"), args.checkpoint
    )
    export_reference_checkpoint(args.out, state.params, cfg.model, epoch=epoch)
    print(f"exported epoch {epoch} -> {args.out}")


if __name__ == "__main__":
    main()
