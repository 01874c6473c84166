"""Semantic nearest-neighbor data association.

The reference's "greedy" matchers (sloam.cpp:73-203) have no mutual
exclusion: each scan object independently takes the argmin distance over the
submap and accepts it iff the distance beats a per-class threshold. That is
exactly an argmin over the pairwise-distance matrix, so association becomes a
single dense reduction on TPU with bit-exact semantics.

Thresholds (params/sloam.yaml:7-9):
  cylinder_match_thresh = 3.0, cuboid_match_thresh = 2.0,
  ellipsoid_match_thresh = 0.75.
"""
from __future__ import annotations

import jax.numpy as jnp


def match_nearest(dist: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """dist: [N_scan, M_submap] -> match indices [N_scan] int32, -1 = no match.

    Matches sloam.cpp:88-107 / :134-154 / :178-202: accept the nearest submap
    entry iff its distance < thresh (invalid / label-mismatched entries carry
    the BIG sentinel and can never win)."""
    best = jnp.argmin(dist, axis=1).astype(jnp.int32)
    best_d = jnp.min(dist, axis=1)
    return jnp.where(best_d < thresh, best, -1)


def to_global_indices(matches: jnp.ndarray, submap_indices: jnp.ndarray) -> jnp.ndarray:
    """Translate submap-local match indices into global map indices.

    Replaces the reference's `matchesMap_` dict
    (cylinderMapManager.cpp:232-237): `submap_indices[j]` is the global map
    row that submap row j was gathered from."""
    g = submap_indices[jnp.clip(matches, 0, submap_indices.shape[0] - 1)]
    return jnp.where(matches >= 0, g.astype(jnp.int32), -1)
