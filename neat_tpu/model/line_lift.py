"""Line-lifting experiments of the vanilla VolSDF network (reference
code/model/network.py:189-454).

The reference defines two extra forwards on ``model.network.VolSDFNetwork``
that lift detected 2D line segments into 3D by volume-rendering the
expected surface point of pixels sampled along each segment
(``render``, network.py:204-234). Neither is called anywhere upstream —
they are abandoned experiments — but they are part of the class surface:

  * ``forward_minstance`` (network.py:234-283): per line, sample
    [0, u, 1] along the segment with one uniform-random interior u, lift
    all three, and take a weighted L1 between the interior point and its
    clamped PER-AXIS projection onto the (x1, x2) 3D chord (the reference
    computes ``t = -(x1-x0)*(x2-x1)/|x2-x1|^2`` elementwise — a
    per-coordinate ratio, not the dot-product projection; reproduced
    as-is). The projection target is detached; gradient flows to the
    implicit network through the lifted points.
  * ``forward_two_view`` (network.py:284-380): 16 evenly spaced samples
    per line, lifted DETACHED (network.py:316 calls ``.detach()`` per
    chunk — the training branch is a constant with no gradient; kept
    faithful and documented), scored by the mean L1 between 1 and the
    cosine of each sub-segment direction against the chord direction.
    Its eval branch returns the lifted geometry — the usable probe.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .neat import NeatConfig, neat_forward


def lift_line_points(
    params,
    cfg: NeatConfig,
    points2d: jnp.ndarray,
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    rng,
    training: bool = True,
) -> jnp.ndarray:
    """Expected 3D surface point of each pixel (reference ``render``,
    network.py:204-234): full error-bounded sampling + volume rendering,
    returning sum(w * points) per ray. points2d: (..., 2) -> (..., 3).

    training=True keeps the reference's training-mode sampler draws (the
    caller forward_minstance runs under self.training). The volsdf
    forward's eikonal branch is computed-and-discarded in eager use but
    dead-code-eliminated under jit — the reference's standalone render()
    never had it."""
    vcfg = dataclasses.replace(cfg, model_variant="volsdf")
    uv = points2d.reshape(-1, 2)
    out = neat_forward(
        params,
        {"uv": uv, "pose": pose, "intrinsics": intrinsics},
        vcfg,
        rng,
        training=training,
    )
    return out["xyz"].reshape(*points2d.shape[:-1], 3)


def _segment_points(
    juncs2d: jnp.ndarray, edges: jnp.ndarray, lambdas: jnp.ndarray
) -> jnp.ndarray:
    """(V, 2) junctions + (L, 2) edges + (L, P, 1) or (1, P, 1) lambdas
    -> (L, P, 2) pixels along each segment."""
    lines2d = juncs2d[edges]  # (L, 2, 2)
    a = lines2d[:, :1]  # (L, 1, 2)
    b = lines2d[:, 1:]
    return a + lambdas * (b - a)


def minstance_loss(
    params,
    cfg: NeatConfig,
    inputs: Dict[str, jnp.ndarray],
    rng,
) -> jnp.ndarray:
    """reference forward_minstance (network.py:234-283).

    inputs: juncs2d (V, 2), edges (L, 2) int, weights (L,), pose (4, 4),
    intrinsics (4, 4) or (3, 3). Returns the scalar loss.
    """
    r_lam, r_lift = jax.random.split(rng)
    edges = inputs["edges"]
    n_lines = edges.shape[0]
    # lambdas = [0, u, 1] with one shared-per-line uniform interior draw
    # (network.py:254-256)
    u = jax.random.uniform(r_lam, (n_lines, 1, 1))
    lambdas = jnp.concatenate([u * 0.0, u, u * 0.0 + 1.0], axis=1)  # (L,3,1)
    pts2d = _segment_points(inputs["juncs2d"], edges, lambdas)  # (L,3,2)
    lines3d = lift_line_points(
        params, cfg, pts2d, inputs["pose"], inputs["intrinsics"], r_lift
    )  # (L, 3, 3)

    x1 = lines3d[:, :1]
    x2 = lines3d[:, -1:]
    x0 = lines3d[:, 1:-1]
    norm2 = jnp.sum((x2 - x1) ** 2, axis=-1, keepdims=True)
    # the WHOLE projection target is built inside no_grad upstream
    # (network.py:274-277): per-coordinate ratio, clamped, and xp itself
    # all detached — gradient reaches the net only through x0
    t = jnp.clip(-(x1 - x0) * (x2 - x1) / norm2, 0.0, 1.0)
    xp = jax.lax.stop_gradient(x1 + (x2 - x1) * t)
    loss = jnp.abs(x0 - xp)  # (L, 1, 3)
    per_line = jnp.sum(loss, axis=(-1, -2))
    return jnp.mean(per_line * inputs["weights"])


def two_view_lift(
    params,
    cfg: NeatConfig,
    inputs: Dict[str, jnp.ndarray],
    rng,
    n_points: int = 16,
    training: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """reference forward_two_view (network.py:284-380).

    Lifts n_points evenly spaced samples per segment (detached, as
    upstream: network.py:316) and scores sub-segment/chord alignment.
    Returns (alignment_loss, lines3d (L, P, 3), lines2d_points (L, P, 2)).
    In the reference the training branch returns only the loss — which
    carries no gradient because every lifted point is detached — and the
    eval branch returns the geometry; both are returned here.
    """
    lambdas = jnp.linspace(0.0, 1.0, n_points).reshape(1, n_points, 1)
    pts2d = _segment_points(inputs["juncs2d"], inputs["edges"], lambdas)
    lines3d = jax.lax.stop_gradient(
        lift_line_points(
            params, cfg, pts2d, inputs["pose"], inputs["intrinsics"], rng,
            training=training,
        )
    )  # (L, P, 3)

    chord = lines3d[:, -1:] - lines3d[:, :1]
    chord = chord / jnp.sqrt(jnp.sum(chord**2, axis=-1, keepdims=True) + 1e-10)
    sub = lines3d[:, 1:] - lines3d[:, :-1]
    sub = sub / jnp.sqrt(jnp.sum(sub**2, axis=-1, keepdims=True) + 1e-10)
    cos = jnp.sum(sub * chord, axis=-1)  # (L, P-1)
    loss = jnp.mean(jnp.abs(cos - 1.0), axis=-1)  # (L,)
    total = jnp.mean(loss * inputs["weights"])
    return total, lines3d, pts2d
