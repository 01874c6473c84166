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


def match_nearest(dist: jnp.ndarray, thresh: float,
                  margin: float = 0.0) -> jnp.ndarray:
    """dist: [N_scan, M_submap] -> match indices [N_scan] int32, -1 = no match.

    Matches sloam.cpp:88-107 / :134-154 / :178-202: accept the nearest submap
    entry iff its distance < thresh (invalid / label-mismatched entries carry
    the BIG sentinel and can never win).

    margin > 0 adds an AMBIGUITY gate the reference lacks: the winner must
    beat the runner-up by at least `margin` [m]. In stands where object
    spacing approaches the match threshold, a drifted pose estimate puts
    two candidates inside the gate and the greedy argmin captures the
    wrong one ~half the time — each wrong factor drags the pose further
    and the error feeds back (r5: seed-dependent 0.14-vs-15 m ATE
    collapses in the dense fixture stand). An ambiguous observation is
    skipped (no factor, no new landmark): losing one observation is
    cheap, a wrong association is not."""
    best = jnp.argmin(dist, axis=1).astype(jnp.int32)
    best_d = jnp.min(dist, axis=1)
    ok = best_d < thresh
    if margin > 0.0:
        second = jnp.min(
            jnp.where(jnp.arange(dist.shape[1])[None, :] == best[:, None],
                      jnp.inf, dist), axis=1)
        ok = ok & (second - best_d > margin)
    return jnp.where(ok, best, -1)


def to_global_indices(matches: jnp.ndarray, submap_indices: jnp.ndarray) -> jnp.ndarray:
    """Translate submap-local match indices into global map indices.

    Replaces the reference's `matchesMap_` dict
    (cylinderMapManager.cpp:232-237): `submap_indices[j]` is the global map
    row that submap row j was gathered from."""
    g = submap_indices[jnp.clip(matches, 0, submap_indices.shape[0] - 1)]
    return jnp.where(matches >= 0, g.astype(jnp.int32), -1)
