"""SDF -> density transforms for volume rendering.

Parity target: the reference Laplace density (reference:
code/model/density.py:16-30):

    alpha * (0.5 + 0.5 * sign(s) * expm1(-|s|/beta)),  alpha = 1/beta

with a learnable ``beta`` floored by ``beta_min``. ``AbsDensity`` and
``SimpleDensity`` variants (density.py:33-47) are provided for the vanilla
VolSDF / NeRF-like model configurations.

All functions are pure and shape-polymorphic; the learnable state is a single
scalar carried in the parameter pytree.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class LaplaceDensityParams(NamedTuple):
    """Learnable state of the Laplace density: a single scalar beta."""

    beta: jnp.ndarray  # scalar

    @staticmethod
    def init(beta: float = 0.1) -> "LaplaceDensityParams":
        return LaplaceDensityParams(beta=jnp.asarray(beta, dtype=jnp.float32))


def get_beta(params: LaplaceDensityParams, beta_min: float = 1e-4) -> jnp.ndarray:
    """Effective beta: |beta| + beta_min (reference density.py:28-30)."""
    return jnp.abs(params.beta) + beta_min


def laplace_density(
    sdf: jnp.ndarray,
    params: LaplaceDensityParams,
    beta_min: float = 1e-4,
    beta: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Laplace CDF density of the (negated) SDF.

    ``beta`` overrides the learnable value (used by the error-bounded sampler,
    which sweeps beta during its bisection line search).
    """
    if beta is None:
        beta = get_beta(params, beta_min)
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


def abs_density(sdf: jnp.ndarray) -> jnp.ndarray:
    """NeRF++-style |sdf| density (reference density.py:33-35)."""
    return jnp.abs(sdf)


def simple_density(
    sdf: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """NeRF-style relu density with optional pre-activation noise
    (reference density.py:38-47). Pass ``noise`` (same shape as ``sdf``,
    already scaled by noise_std) during training."""
    if noise is not None:
        sdf = sdf + noise
    return jnp.maximum(sdf, 0.0)
