"""Coordinate MLP fields: SDF, radiance, attraction, global junctions.

Functional-core design: parameters are plain pytrees (nested dicts of
jnp arrays), built by ``init_*`` functions and consumed by pure ``*_forward``
functions. This keeps the whole model trivially compatible with jit/grad/
vmap/shard_map and lets sharding annotations attach at the pytree level.

Parity targets (behavior, not code):
  * ImplicitNetwork  — reference code/model/networks/neat_wfr_rend_a.py:14-137
    (8x256 softplus-100 MLP, skip concat at layer 4 divided by sqrt(2),
    geometric sphere init, weight normalization, positional encoding,
    bounding-sphere SDF clamp min(sdf, scale*(R-|x|)))
  * RenderingNetwork — neat_wfr_rend_a.py:199-255 (IDR-mode MLP + sigmoid,
    view-direction positional encoding)
  * AttractionFieldNetwork — neat_wfr_rend_a.py:139-197 (IDR-mode MLP whose
    6-dim output is two endpoint *offsets* added to the query point)
  * global junctions — neat_wfr_rend_a.py:272-303 (latent table N(0,1) +
    (num_layers+1)-linear ReLU ffn -> Nx3 points)

Weight normalization: every linear stores direction ``v`` (out, in) and
row-magnitude ``g`` (out,); the effective weight is ``g * v / ||v||_row``,
matching torch.nn.utils.weight_norm with dim=0. At init g = ||v||, so the
initial effective weight equals the underlying init — which is what the
geometric initialization relies on.

TPU note: all matmuls are (batch, features) x (features, features) with
feature widths of 256 — MXU-shaped. Gradients of the SDF w.r.t. inputs use
reverse-mode jax.grad; XLA fuses the double pass.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.embedder import positional_encoding, encoding_dim

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# linear layers with weight normalization
# ---------------------------------------------------------------------------


def _torch_default_linear(key, d_in: int, d_out: int) -> Params:
    """torch.nn.Linear default init: kaiming-uniform(a=sqrt(5)) == U(-b, b)
    with b = 1/sqrt(fan_in) for both weight and bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(kw, (d_out, d_in), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def _weight_normalize(p: Params) -> Params:
    """Re-parameterize {w, b} -> {v, g, b} with g = ||w||_row."""
    w = p["w"]
    g = jnp.linalg.norm(w, axis=1)
    return {"v": w, "g": g, "b": p["b"]}


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a linear layer; supports both plain and weight-normalized
    parameterizations. The weight is computed in f32 (weight-norm division
    is precision-sensitive) and cast to the activation dtype for the
    matmul, so bf16 activations get bf16 MXU passes."""
    if "v" in p:
        v = p["v"]
        w = p["g"][:, None] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
    else:
        w = p["w"]
    return x @ w.T.astype(x.dtype) + p["b"].astype(x.dtype)


def _softplus100(x: jnp.ndarray) -> jnp.ndarray:
    """softplus with beta=100 (reference ImplicitNetwork activation)."""
    return jax.nn.softplus(100.0 * x) / 100.0


# ---------------------------------------------------------------------------
# implicit (SDF) network
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ImplicitNetConfig:
    feature_vector_size: int = 256
    sdf_bounding_sphere: float = 3.0  # 0.0 disables the clamp (white_bkgd)
    d_in: int = 3
    d_out: int = 1
    dims: Sequence[int] = (256,) * 8
    geometric_init: bool = True
    bias: float = 0.6
    skip_in: Sequence[int] = (4,)
    weight_norm: bool = True
    multires: int = 6
    sphere_scale: float = 20.0
    inside_out: bool = False

    def layer_dims(self) -> Tuple[int, ...]:
        d0 = encoding_dim(self.multires, self.d_in) if self.multires > 0 else self.d_in
        return (d0, *self.dims, self.d_out + self.feature_vector_size)


def init_implicit_net(key, cfg: ImplicitNetConfig) -> Params:
    dims = cfg.layer_dims()
    n_layers = len(dims)
    params: Params = {}
    keys = jax.random.split(key, n_layers - 1)
    for l in range(n_layers - 1):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in cfg.skip_in else dims[l + 1]
        d_in = dims[l]
        if cfg.geometric_init:
            kw = keys[l]
            if l == n_layers - 2:
                # last layer: mean sqrt(pi)/sqrt(d_in), tiny std, bias -bias
                w = jax.random.normal(kw, (out_dim, d_in)) * 1e-4 + math.sqrt(
                    math.pi
                ) / math.sqrt(d_in)
                b = jnp.full((out_dim,), -cfg.bias)
            elif cfg.multires > 0 and l == 0:
                # zero all encoding channels, gaussian on the raw xyz part
                w = jnp.zeros((out_dim, d_in))
                w = w.at[:, :3].set(
                    jax.random.normal(kw, (out_dim, 3))
                    * (math.sqrt(2) / math.sqrt(out_dim))
                )
                b = jnp.zeros((out_dim,))
            elif cfg.multires > 0 and l in cfg.skip_in:
                w = jax.random.normal(kw, (out_dim, d_in)) * (
                    math.sqrt(2) / math.sqrt(out_dim)
                )
                w = w.at[:, -(dims[0] - 3):].set(0.0)
                b = jnp.zeros((out_dim,))
            else:
                w = jax.random.normal(kw, (out_dim, d_in)) * (
                    math.sqrt(2) / math.sqrt(out_dim)
                )
                b = jnp.zeros((out_dim,))
            lin = {"w": w, "b": b}
        else:
            lin = _torch_default_linear(keys[l], d_in, out_dim)
        if cfg.weight_norm:
            lin = _weight_normalize(lin)
        params[f"lin{l}"] = lin
    return params


def implicit_forward(
    params: Params,
    x: jnp.ndarray,
    cfg: ImplicitNetConfig,
    compute_dtype=None,
) -> jnp.ndarray:
    """Raw network output (..., 1 + feature_size). No sphere clamp.

    ``compute_dtype`` (e.g. jnp.bfloat16) runs the MLP matmuls at reduced
    precision: the positional encoding stays f32 (high-frequency bands are
    phase-sensitive), activations are cast after it, and the result is cast
    back. Used by the error-bounded sampler's no-grad proposal evals where
    z-selection tolerates ~1e-3 relative error (2.7x faster on the MXU).
    """
    inp = positional_encoding(x, cfg.multires) if cfg.multires > 0 else x
    out_dtype = inp.dtype
    if compute_dtype is not None:
        inp = inp.astype(compute_dtype)
    h = inp
    n_layers = len(cfg.layer_dims())
    for l in range(n_layers - 1):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inp], axis=-1) / math.sqrt(2)
        h = linear_apply(params[f"lin{l}"], h)
        if l < n_layers - 2:
            h = _softplus100(h)
    if cfg.inside_out:
        h = h.at[..., :1].multiply(-1.0)
    if compute_dtype is not None:
        h = h.astype(out_dtype)
    return h


def _clamp_sdf(sdf: jnp.ndarray, x: jnp.ndarray, cfg: ImplicitNetConfig) -> jnp.ndarray:
    """Bounding-sphere clamp: min(sdf, scale*(R - |x|)) so every ray is
    eventually occluded (reference neat_wfr_rend_a.py:115-118)."""
    if cfg.sdf_bounding_sphere > 0.0:
        sphere_sdf = cfg.sphere_scale * (
            cfg.sdf_bounding_sphere - jnp.linalg.norm(x, axis=-1, keepdims=True)
        )
        sdf = jnp.minimum(sdf, sphere_sdf)
    return sdf


def implicit_sdf(
    params: Params, x: jnp.ndarray, cfg: ImplicitNetConfig, compute_dtype=None
) -> jnp.ndarray:
    """Clamped SDF values (..., 1) (reference get_sdf_vals)."""
    sdf = implicit_forward(params, x, cfg, compute_dtype=compute_dtype)[..., :1]
    return _clamp_sdf(sdf, x, cfg)


def implicit_sdf_feat_grad(
    params: Params, x: jnp.ndarray, cfg: ImplicitNetConfig, compute_dtype=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(sdf, features, d sdf/d x) with the sphere clamp applied before
    differentiation (reference get_outputs). x: (N, 3).

    Single forward + single vjp backward: the cotangent selects the sdf
    channel, so features come for free from the same forward pass. The
    surrounding loss may differentiate through the returned gradients
    (eikonal / normal conditioning) — jax handles the grad-of-grad.

    ``compute_dtype`` (e.g. jnp.bfloat16) runs the MLP layer chain at
    reduced precision (positional encoding, clamp, and outputs stay f32;
    MXU accumulation is f32). This halves the HBM activation traffic of
    the training step's dominant term — the step is memory-bound at f32
    (RESULTS.md roofline) — at ~1e-3 relative output error."""

    def f(pts):
        out = implicit_forward(params, pts, cfg, compute_dtype=compute_dtype)
        sdf = _clamp_sdf(out[..., :1], pts, cfg)
        return sdf, out[..., 1:]

    (sdf, feats), vjp_fn = jax.vjp(f, x)
    (grads,) = vjp_fn((jnp.ones_like(sdf), jnp.zeros_like(feats)))
    return sdf, feats, grads


def implicit_gradient(
    params: Params, x: jnp.ndarray, cfg: ImplicitNetConfig
) -> jnp.ndarray:
    """d sdf_raw / d x without the sphere clamp (reference ``gradient()``,
    used for the eikonal term). x: (N, 3) -> (N, 3)."""

    def f(pts):
        return implicit_forward(params, pts, cfg)[..., 0]

    out, vjp_fn = jax.vjp(f, x)
    (grads,) = vjp_fn(jnp.ones_like(out))
    return grads


# ---------------------------------------------------------------------------
# rendering / attraction networks (IDR-style conditioned MLPs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RenderNetConfig:
    feature_vector_size: int = 256
    # 'idr' (points+view+normals+feat), 'nerf' (view+feat), or 'no_view'
    # (points+normals+feat — the view-independent attraction variant of
    # reference neat_wfr_rend_b.py:175-183 / neat_wfr.py:188-200)
    mode: str = "idr"
    d_in: int = 9
    d_out: int = 3
    dims: Sequence[int] = (256,) * 4
    weight_norm: bool = True
    multires_view: int = 0

    def layer_dims(self) -> Tuple[int, ...]:
        d0 = self.d_in + self.feature_vector_size
        if self.multires_view > 0 and self.mode != "no_view":
            d0 += encoding_dim(self.multires_view, 3) - 3
        return (d0, *self.dims, self.d_out)


def _init_idr_mlp(key, dims: Sequence[int], weight_norm: bool) -> Params:
    params: Params = {}
    keys = jax.random.split(key, len(dims) - 1)
    for l in range(len(dims) - 1):
        lin = _torch_default_linear(keys[l], dims[l], dims[l + 1])
        if weight_norm:
            lin = _weight_normalize(lin)
        params[f"lin{l}"] = lin
    return params


def init_render_net(key, cfg: RenderNetConfig) -> Params:
    return _init_idr_mlp(key, cfg.layer_dims(), cfg.weight_norm)


def _idr_inputs(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    view_dirs: jnp.ndarray,
    feature_vectors: jnp.ndarray,
    cfg: RenderNetConfig,
) -> jnp.ndarray:
    if cfg.mode == "no_view":
        return jnp.concatenate([points, normals, feature_vectors], axis=-1)
    if cfg.multires_view > 0:
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)
    if cfg.mode == "idr":
        return jnp.concatenate([points, view_dirs, normals, feature_vectors], axis=-1)
    elif cfg.mode == "nerf":
        return jnp.concatenate([view_dirs, feature_vectors], axis=-1)
    raise ValueError(f"unknown mode {cfg.mode}")


def _idr_mlp_forward(params: Params, x: jnp.ndarray, n_layers: int) -> jnp.ndarray:
    h = x
    for l in range(n_layers - 1):
        h = linear_apply(params[f"lin{l}"], h)
        if l < n_layers - 2:
            h = jax.nn.relu(h)
    return h


def render_forward(
    params: Params,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    view_dirs: jnp.ndarray,
    feature_vectors: jnp.ndarray,
    cfg: RenderNetConfig,
    compute_dtype=None,
) -> jnp.ndarray:
    """RGB in [0,1] (..., 3). ``compute_dtype`` as in
    implicit_sdf_feat_grad: reduced-precision layer chain, f32 in/out."""
    x = _idr_inputs(points, normals, view_dirs, feature_vectors, cfg)
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    h = _idr_mlp_forward(params, x, len(cfg.layer_dims()))
    return jax.nn.sigmoid(h.astype(out_dtype))


def init_attraction_net(key, cfg: RenderNetConfig) -> Params:
    return _init_idr_mlp(key, cfg.layer_dims(), cfg.weight_norm)


def attraction_forward(
    params: Params,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    view_dirs: jnp.ndarray,
    feature_vectors: jnp.ndarray,
    cfg: RenderNetConfig,
    compute_dtype=None,
) -> jnp.ndarray:
    """Two 3D endpoints per query point: (..., 2, 3) = point + offsets
    (reference AttractionFieldNetwork.forward, neat_wfr_rend_a.py:175-197).
    ``compute_dtype``: reduced-precision layer chain, f32 in/out."""
    x = _idr_inputs(points, normals, view_dirs, feature_vectors, cfg)
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    h = _idr_mlp_forward(params, x, len(cfg.layer_dims()))
    offsets = h.astype(out_dtype).reshape(*points.shape[:-1], 2, 3)
    return points[..., None, :] + offsets


# ---------------------------------------------------------------------------
# global junctions: latent table + feed-forward decoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GlobalJunctionsConfig:
    num_junctions: int = 1024
    num_layers: int = 2
    dim_hidden: int = 256
    dim_out: int = 3


def init_global_junctions(key, cfg: GlobalJunctionsConfig) -> Params:
    klat, kffn = jax.random.split(key)
    latents = jax.random.normal(klat, (cfg.num_junctions, cfg.dim_hidden))
    ffn: Params = {}
    keys = jax.random.split(kffn, cfg.num_layers + 1)
    for i in range(cfg.num_layers + 1):
        d_in = cfg.dim_hidden
        d_out = cfg.dim_hidden if i != cfg.num_layers else cfg.dim_out
        ffn[f"lin{i}"] = _torch_default_linear(keys[i], d_in, d_out)
    return {"latents": latents, "ffn": ffn}


def global_junctions_forward(params: Params, cfg: GlobalJunctionsConfig) -> jnp.ndarray:
    """Decode the latent table -> (num_junctions, 3) points."""
    h = params["latents"]
    for i in range(cfg.num_layers + 1):
        h = linear_apply(params["ffn"][f"lin{i}"], h)
        if i != cfg.num_layers:
            h = jax.nn.relu(h)
    return h
