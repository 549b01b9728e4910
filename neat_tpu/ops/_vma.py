"""Varying-mesh-axes plumbing for pallas_call under shard_map.

jax >= 0.8 tracks which mesh axes a value varies over (`vma`) and, with
`check_vma=True` (the jax.shard_map default), requires pallas_call
out_shapes to declare theirs. Inside a shard_map'ed train step every
per-ray tensor varies over the data axis, so each kernel's outputs vary
over the union of its inputs' axes. Outside shard_map the union is empty
and this is a no-op.
"""

from __future__ import annotations

import jax


def joint_vma(*arrays) -> frozenset:
    """Union of the inputs' varying mesh axes (empty outside shard_map)."""
    vma: frozenset = frozenset()
    for a in arrays:
        t = jax.typeof(a)
        vma = vma | (getattr(t, "vma", None) or frozenset())
    return vma


def out_struct(shape, dtype, *vma_like) -> jax.ShapeDtypeStruct:
    """ShapeDtypeStruct whose vma is the union of vma_like's axes."""
    return jax.ShapeDtypeStruct(shape, dtype, vma=joint_vma(*vma_like))


def pvary_to(y, axes: frozenset):
    """Promote y to vary over the given mesh axes (no-op if it already
    does, or outside shard_map)."""
    missing = frozenset(axes) - joint_vma(y)
    if missing:
        y = jax.lax.pvary(y, tuple(sorted(missing)))
    return y


def align_cotangent(c, target_aval):
    """Give cotangent c the vma its jax.vjp call expects.

    Pallas-kernel traces nested inside a custom_vjp bwd rule are
    inconsistent about vma: ref reads keep the outer trace's axes while
    freshly computed values get the nested context's (often empty) set,
    and jax.vjp rejects cotangents whose aval differs from the primal
    output's. Launder c through a binary identity (mul by scalar one —
    binary-op vma is re-derived by the *current* context's rule), then
    pvary back up to the target aval's axes if that context keeps them.
    """
    import jax.numpy as jnp

    c = c * jnp.ones((), c.dtype)
    return pvary_to(c, getattr(target_aval, "vma", None) or frozenset())


def match_vma(y, x):
    """Re-add x's varying mesh axes that an op dropped from y.

    pltpu.roll loses its operand's vma when the kernel body is evaluated
    as jax ops (interpret mode under shard_map); no-op on hardware or
    outside shard_map where the axes already agree.
    """
    missing = joint_vma(x) - joint_vma(y)
    if missing:
        y = jax.lax.pvary(y, tuple(sorted(missing)))
    return y
