"""Submap selection: exact top-K nearest landmarks.

Replaces the reference's PCL KD-tree KNN queries
(cylinderMapManager.cpp:213-243, K=50; cubeMapManager.cpp:61-62, K=30;
ellipsoidMapManager.cpp:65-67, K=1000) with a brute-force masked distance +
`lax.top_k`. For map capacities of a few thousand, a dense reduction is both
exact and faster on TPU than any tree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INF = 1.0e30


def topk_nearest(centroids: jnp.ndarray, valid: jnp.ndarray, query: jnp.ndarray,
                 k: int):
    """Return (indices [k] int32, mask [k] bool) of the k nearest valid rows.

    centroids: [N, 3]; valid: [N] bool; query: [3].
    Mirrors `getSubmap`: if fewer than k valid landmarks exist, the mask marks
    the tail invalid."""
    n = centroids.shape[0]
    k_eff = min(k, n)
    d2 = jnp.sum((centroids - query[None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, INF)
    neg, idx = jax.lax.top_k(-d2, k_eff)
    mask = neg > -INF * 0.5
    if k_eff < k:
        idx = jnp.concatenate([idx, jnp.zeros((k - k_eff,), idx.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((k - k_eff,), bool)])
    return idx.astype(jnp.int32), mask


def radius_mask(centroids: jnp.ndarray, valid: jnp.ndarray, query: jnp.ndarray,
                radius: float, z_gate: float | None = None) -> jnp.ndarray:
    """Boolean mask of landmarks within `radius` of query (3D distance), with
    the reference's hard-coded |z - query_z| < 1.5 gate when z_gate is given
    (getkeyPoseSubmap, cylinderMapManager.cpp:186-211)."""
    d = jnp.linalg.norm(centroids - query[None, :], axis=-1)
    m = valid & (d <= radius)
    if z_gate is not None:
        m = m & (jnp.abs(centroids[:, 2] - query[2]) < z_gate)
    return m
