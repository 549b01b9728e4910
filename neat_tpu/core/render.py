"""Volume rendering weights from samples along a ray.

Parity target: the log-space transmittance accumulation of the reference
(reference: code/model/networks/neat_wfr_rend_a.py:540-554 and the identical
block inside the error-bounded sampler, code/model/ray_sampler.py:189-196):

    dists_i   = z_{i+1} - z_i             (last dist = 1e10)
    fe_i      = dists_i * sigma_i
    alpha_i   = 1 - exp(-fe_i)
    T_i       = exp(-cumsum_{j<i} fe_j)
    w_i       = alpha_i * T_i

All ops are row-parallel over rays; XLA maps the cumulative sum onto the VPU
and fuses the surrounding elementwise chain.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_INF_DIST = 1e10


def render_weights_from_density(
    z_vals: jnp.ndarray, density: jnp.ndarray
) -> jnp.ndarray:
    """z_vals, density: (..., S) -> weights (..., S)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], _INF_DIST)], axis=-1
    )
    free_energy = dists * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[..., :1]), free_energy[..., :-1]], axis=-1
    )
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    return alpha * transmittance


def volume_rendering_weights(
    z_vals: jnp.ndarray,
    sdf: jnp.ndarray,
    density_params,
    beta_min: float = 1e-4,
) -> jnp.ndarray:
    """Laplace-density volume rendering weights.

    z_vals: (..., S); sdf: (..., S) (already reshaped per ray).
    """
    from .density import laplace_density

    density = laplace_density(sdf, density_params, beta_min=beta_min)
    return render_weights_from_density(z_vals, density)


def alpha_transmittance(
    z_vals: jnp.ndarray, density: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Return (alpha, transmittance, dists) — used by the error-bounded
    sampler which needs the transmittance separately."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists_inf = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], _INF_DIST)], axis=-1
    )
    free_energy = dists_inf * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[..., :1]), free_energy[..., :-1]], axis=-1
    )
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    return alpha, transmittance, dists
