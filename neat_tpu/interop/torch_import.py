"""Import reference (PyTorch) NEAT checkpoints into neat_tpu parameters.

The reference saves ``ModelParameters/{epoch}.pth`` with a
``model_state_dict`` whose keys follow the module tree of
VolSDFNetwork (reference code/model/networks/neat_wfr_rend_a.py):

    implicit_network.lin{0..8}.{weight_g, weight_v, bias}   (weight norm)
    rendering_network.lin{0..4}.{weight_g, weight_v, bias}
    attraction_network.lin{0..4}.{weight_g, weight_v, bias}
    density.beta
    latents
    ffn.{0,2,4}.{weight, bias}          (Sequential with interleaved ReLU)

This module maps that state dict onto the neat_tpu parameter pytree so
released checkpoints can be finalized/evaluated (or fine-tuned) in this
framework directly. torch weight_norm keeps (g, v) exactly like our
parameterization — ``g`` is stored as (out, 1) and squeezed here.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..model.neat import NeatConfig

Params = Dict[str, Any]


def _to_np(t) -> np.ndarray:
    try:
        return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)
    except AttributeError:
        return np.asarray(t, dtype=np.float32)


def _import_linear(state: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    if f"{prefix}.weight_v" in state:
        return {
            "v": _to_np(state[f"{prefix}.weight_v"]),
            "g": _to_np(state[f"{prefix}.weight_g"]).reshape(-1),
            "b": _to_np(state[f"{prefix}.bias"]),
        }
    return {
        "w": _to_np(state[f"{prefix}.weight"]),
        "b": _to_np(state[f"{prefix}.bias"]),
    }


def _import_mlp(state, prefix: str, n_layers: int) -> Params:
    return {
        f"lin{l}": _import_linear(state, f"{prefix}.lin{l}") for l in range(n_layers)
    }


def reference_state_to_params(state: Dict[str, Any], cfg: NeatConfig) -> Params:
    """Map a reference model_state_dict onto the neat_tpu param pytree."""
    import jax.numpy as jnp

    n_imp = len(cfg.implicit.layer_dims()) - 1
    n_ren = len(cfg.rendering.layer_dims()) - 1
    n_att = len(cfg.attraction.layer_dims()) - 1

    params: Params = {
        "implicit": _import_mlp(state, "implicit_network", n_imp),
        "rendering": _import_mlp(state, "rendering_network", n_ren),
    }
    from ..core.density import LaplaceDensityParams

    params["density"] = LaplaceDensityParams(
        beta=jnp.asarray(_to_np(state["density.beta"]).reshape(()))
    )
    if any(k.startswith("attraction_network") for k in state):
        params["attraction"] = _import_mlp(state, "attraction_network", n_att)
    if "latents" in state:
        # reference ffn is nn.Sequential(Linear, ReLU, Linear, ReLU, Linear)
        # -> module indices 0, 2, 4, ... for the linears
        ffn = {}
        for i in range(cfg.junctions.num_layers + 1):
            ffn[f"lin{i}"] = _import_linear(state, f"ffn.{2 * i}")
        params["junctions"] = {
            "latents": _to_np(state["latents"]),
            "ffn": ffn,
        }

    # promote to jnp arrays
    import jax

    return jax.tree_util.tree_map(jnp.asarray, params)


def import_reference_checkpoint(path: str, cfg: NeatConfig) -> Params:
    """Load a reference ModelParameters/*.pth checkpoint (requires torch)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    state = payload.get("model_state_dict", payload)
    return reference_state_to_params(state, cfg)
