"""Jittable DBSCAN-equivalent clustering for junction proposals.

The reference clusters detached 3D line endpoints with sklearn DBSCAN
(eps=0.01, min_samples=2) on the CPU inside the training step (reference
neat_wfr_rend_a.py:333-342, enabled by conf ``dbscan_enabled`` on DTU/BMVS).

For min_samples=2, DBSCAN is exactly: drop points with no eps-neighbor,
then take connected components of the eps-ball graph. On <= a few thousand
points the dense pairwise-distance graph fits comfortably on-chip, and the
components are found by iterated min-label propagation — a few dozen
(N, N) x (N,) masked min-reductions, all VPU work.

Output is padded: cluster means live at the rows that are their component's
representative (lowest member index), with a validity mask.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_prop_iters",))
def dbscan_cluster_means(
    points: jnp.ndarray,
    point_mask: Optional[jnp.ndarray] = None,
    eps: float = 0.01,
    min_samples: int = 2,
    max_prop_iters: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster (N, 3) points; return (means (N, 3), valid (N,) bool).

    ``means[i]`` is the mean of the component whose lowest member index is
    ``i`` (valid only there). Only components of size >= min_samples (with
    min_samples=2 semantics: points that have at least one neighbor) count.
    """
    n = points.shape[0]
    if point_mask is None:
        point_mask = jnp.ones((n,), dtype=bool)

    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    live = point_mask[:, None] & point_mask[None, :]
    adj = (d2 <= eps * eps) & live
    # neighbor counts include self for the core test like sklearn
    n_neighbors = jnp.sum(adj, axis=1)
    is_core = point_mask & (n_neighbors >= min_samples)

    # connected components over core points by min-label propagation
    core_adj = adj & is_core[:, None] & is_core[None, :]
    labels = jnp.where(is_core, jnp.arange(n), n)

    def prop(state):
        it, labels, changed = state
        # one-hop neighbor minimum ...
        neigh_lab = jnp.where(core_adj, labels[None, :], n)
        new = jnp.minimum(labels, jnp.min(neigh_lab, axis=1))
        # ... plus pointer jumping (label <- label[label]) so convergence is
        # O(log diameter) instead of O(diameter): chains longer than the
        # iteration cap would otherwise silently split
        safe = jnp.minimum(new, n - 1)
        new = jnp.minimum(new, jnp.where(new < n, labels[safe], n))
        return it + 1, new, jnp.any(new != labels)

    def cond(state):
        it, _, changed = state
        return (it < max_prop_iters) & changed

    _, labels, _ = jax.lax.while_loop(
        cond, prop, (jnp.asarray(0), labels, jnp.asarray(True))
    )

    # segment means keyed by component representative
    safe_labels = jnp.where(is_core, labels, n)
    sums = jax.ops.segment_sum(
        jnp.where(is_core[:, None], points, 0.0), safe_labels, num_segments=n + 1
    )[:n]
    counts = jax.ops.segment_sum(
        is_core.astype(points.dtype), safe_labels, num_segments=n + 1
    )[:n]
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    valid = (counts >= 1.0) & (jnp.arange(n) == labels) & is_core
    return means, valid


def dbscan_callback_means(points, point_mask, eps=0.01, min_samples=2):
    """sklearn DBSCAN via host callback (parity mode). Same padded output
    convention as :func:`dbscan_cluster_means`: means at representative
    rows (here: first member index of each cluster)."""

    def host(points, mask):
        from sklearn.cluster import DBSCAN

        pts = np.asarray(points)
        mask = np.asarray(mask, dtype=bool)
        means = np.zeros_like(pts)
        valid = np.zeros(pts.shape[0], dtype=bool)
        idx = np.nonzero(mask)[0]
        if len(idx) >= min_samples:
            labels = DBSCAN(eps=eps, min_samples=min_samples).fit(pts[idx]).labels_
            for lab in range(labels.max() + 1):
                members = idx[labels == lab]
                rep = members.min()
                means[rep] = pts[members].mean(axis=0)
                valid[rep] = True
        return means, valid

    out_shapes = (
        jax.ShapeDtypeStruct(points.shape, points.dtype),
        jax.ShapeDtypeStruct((points.shape[0],), jnp.bool_),
    )
    return jax.pure_callback(host, out_shapes, points, point_mask, vmap_method="sequential")
