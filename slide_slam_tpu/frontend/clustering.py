"""Euclidean clustering (DBSCAN) as a dense device kernel.

The reference runs sklearn DBSCAN twice per class per scan
(process_cloud_node_outdoor.py:380-408). Here DBSCAN is expressed as dense
linear algebra: the [N, N] epsilon-neighborhood matrix, core-point test, and
connected components of the core graph via min-label propagation
(a lax.while_loop of masked matmul-like reductions). Exact DBSCAN semantics
for border points: assigned to (one of) their neighboring core clusters;
noise -> -1. For the scan sizes involved (hundreds to a few thousand points
per class) the dense form is far faster on TPU than any index structure.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_iters",))
def dbscan(points: jnp.ndarray, valid: jnp.ndarray, eps: float,
           min_samples: int, max_iters: int = 64) -> jnp.ndarray:
    """points [N, D], valid [N] -> labels [N] int32 (-1 noise/invalid).

    Labels are arbitrary cluster ids (the lowest point index in the
    cluster)."""
    n = points.shape[0]
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    ok = valid[:, None] & valid[None, :]
    nbr = ok & (d2 <= eps * eps)                    # includes self
    core = valid & (jnp.sum(nbr, axis=1) >= min_samples)

    # propagate min label over the core-core subgraph
    core_edge = nbr & core[:, None] & core[None, :]
    INF = jnp.int32(n + 1)
    labels = jnp.where(core, jnp.arange(n, dtype=jnp.int32), INF)

    def body(carry):
        lab, i, changed = carry
        # new label = min over core neighbors
        neigh_lab = jnp.where(core_edge, lab[None, :], INF)
        new = jnp.minimum(lab, jnp.min(neigh_lab, axis=1))
        return new, i + 1, jnp.any(new != lab)

    def cond(carry):
        _, i, changed = carry
        return (i < max_iters) & changed

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.int32(0), jnp.bool_(True)))

    # border points: take the min core-neighbor label
    border_lab = jnp.min(jnp.where(nbr & core[None, :], labels[None, :], INF),
                         axis=1)
    out = jnp.where(core, labels, jnp.where(border_lab < INF, border_lab, -1))
    return jnp.where(valid, out, -1).astype(jnp.int32)


def two_stage_cluster(points: jnp.ndarray, valid: jnp.ndarray,
                      eps_noise: float, min_samples_noise: int,
                      eps_cluster: float, min_samples_cluster: int):
    """The reference's two-layer DBSCAN (noise cull, then instance
    clustering — process_cloud_node_outdoor.py:380-408)."""
    lab1 = dbscan(points, valid, eps_noise, min_samples_noise)
    keep = lab1 >= 0
    lab2 = dbscan(points, valid & keep, eps_cluster, min_samples_cluster)
    return lab2
