"""Pairwise object-distance kernels.

Dense [N, M] batched re-expressions of the reference's scalar distance
methods; these are the inner loops of data association
(/root/reference/backend/sloam/src/core/sloam.cpp:73-203):

* cylinders: min over sample heights {0,3,6} m of the 3D distance between the
  two axes evaluated at that height, label-gated to 1000 on mismatch
  (objects/cylinder.cpp:187-224).
* cuboids: centroid L2, NOT label gated (objects/cube.cpp:22-24 — the
  reference's matchCubeModels calls plain `distance`).
* ellipsoids: centroid L2, label-gated in the matcher (sloam.cpp:184-193).

`BIG` stands in for the reference's 1000 sentinel.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..objects import Cuboids, Cylinders, Ellipsoids

BIG = 1.0e3
SAMPLE_HEIGHTS = (0.0, 3.0, 6.0)


def _axis_point_at_height(root, ray, h):
    """Point on the (root, ray) line with z == h. root/ray: [..., 3]."""
    t = (h - root[..., 2]) / jnp.where(jnp.abs(ray[..., 2]) < 1e-6,
                                       jnp.sign(ray[..., 2]) * 1e-6 + 1e-12,
                                       ray[..., 2])
    return root + t[..., None] * ray


def cylinder_pairwise(a: Cylinders, b: Cylinders) -> jnp.ndarray:
    """[Na, Nb] distances; BIG where labels differ or entries invalid."""
    dists = []
    for h in SAMPLE_HEIGHTS:
        pa = _axis_point_at_height(a.root, a.ray, h)          # [Na, 3]
        pb = _axis_point_at_height(b.root, b.ray, h)          # [Nb, 3]
        d = jnp.linalg.norm(pa[:, None, :] - pb[None, :, :], axis=-1)
        dists.append(d)
    d = jnp.minimum(jnp.minimum(dists[0], dists[1]), dists[2])
    same_label = a.label[:, None] == b.label[None, :]
    ok = same_label & a.valid[:, None] & b.valid[None, :]
    return jnp.where(ok, d, BIG)


def centroid_pairwise(ca, cb, label_gate: bool) -> jnp.ndarray:
    """[Na, Nb] centroid distances for Cuboids/Ellipsoids."""
    pa = ca.centroid()
    pb = cb.centroid()
    d = jnp.linalg.norm(pa[:, None, :] - pb[None, :, :], axis=-1)
    ok = ca.valid[:, None] & cb.valid[None, :]
    if label_gate:
        ok = ok & (ca.label[:, None] == cb.label[None, :])
    return jnp.where(ok, d, BIG)


def cuboid_pairwise(a: Cuboids, b: Cuboids) -> jnp.ndarray:
    return centroid_pairwise(a, b, label_gate=False)


def cuboid_weighted_pairwise(a: Cuboids, b: Cuboids,
                             dim_weight: float = 0.5) -> jnp.ndarray:
    """[Na, Nb] weightedDistance (cube.cpp:46-58): label-gated blend of
    centroid L2 and scale-difference norm / 3."""
    pa, pb = a.centroid(), b.centroid()
    pos = jnp.linalg.norm(pa[:, None, :] - pb[None, :, :], axis=-1)
    sc = jnp.linalg.norm(a.scale[:, None, :] - b.scale[None, :, :],
                         axis=-1) / 3.0
    d = (1.0 - dim_weight) * pos + dim_weight * sc
    ok = (a.valid[:, None] & b.valid[None, :]
          & (a.label[:, None] == b.label[None, :]))
    return jnp.where(ok, d, BIG)


def cuboid_iou_pairwise(a: Cuboids, b: Cuboids) -> jnp.ndarray:
    """[Na, Nb] axis-aligned IoU (cube.cpp:60-82): boxes are centroid ±
    scale/2 (orientation ignored, exactly like the reference). 0 where
    either entry is invalid."""
    lo_a = a.centroid() - a.scale / 2.0
    hi_a = a.centroid() + a.scale / 2.0
    lo_b = b.centroid() - b.scale / 2.0
    hi_b = b.centroid() + b.scale / 2.0
    overlap = jnp.maximum(
        0.0, (jnp.minimum(hi_a[:, None, :], hi_b[None, :, :])
              - jnp.maximum(lo_a[:, None, :], lo_b[None, :, :])))
    inter = jnp.prod(overlap, axis=-1)
    vol_a = jnp.prod(a.scale, axis=-1)
    vol_b = jnp.prod(b.scale, axis=-1)
    union = vol_a[:, None] + vol_b[None, :] - inter
    iou = inter / jnp.where(union > 0, union, 1.0)
    ok = a.valid[:, None] & b.valid[None, :]
    return jnp.where(ok, iou, 0.0)


def ellipsoid_pairwise(a: Ellipsoids, b: Ellipsoids) -> jnp.ndarray:
    return centroid_pairwise(a, b, label_gate=True)
