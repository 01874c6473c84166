"""Batched cuboid fitting from clustered instance points.

Re-derivation of cuboid_detection / fit_cuboid
(frontend/scan2shape/script/cuboid_utils_outdoor.py:73-208) as batched jax
over padded instance tensors [I, P, 3]:

* axis-aligned bbox seeding (`fit_bbox_seeds` == fit_cuboid:175-208),
* PCA-oriented cuboid (`fit_cuboids`): principal 2D direction (closed-form
  2x2 eigenvector instead of sklearn PCA; the reference's convex-hull
  pre-filter before PCA is omitted — a documented deviation that changes the
  PCA weighting slightly), yaw constrained to [0, pi), 1/99-percentile
  extents, per-class dimension gates, optional car-facing-direction flip from
  the front/rear height profile (:131-215).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CuboidFit(NamedTuple):
    centroid: jnp.ndarray    # [I, 3] world
    dims: jnp.ndarray        # [I, 3] (length, width, height)
    yaw: jnp.ndarray         # [I]
    valid: jnp.ndarray       # [I] passed the class dimension gates


def _masked_percentile(x: jnp.ndarray, mask: jnp.ndarray, q: float):
    """Percentile over the masked entries of the last axis (NaN-based)."""
    xm = jnp.where(mask, x, jnp.nan)
    return jnp.nanpercentile(xm, q, axis=-1)


def fit_bbox_seeds(points: jnp.ndarray, mask: jnp.ndarray,
                   dim_thresh: float):
    """fit_cuboid (cuboid_utils_outdoor.py:175-208): axis-aligned bbox
    centroid/dims per instance; instances whose smaller XY dim is below
    dim_thresh are invalidated."""
    big = 1e9
    x = jnp.where(mask, points[..., 0], -big)
    xmax = jnp.max(x, axis=-1)
    x = jnp.where(mask, points[..., 0], big)
    xmin = jnp.min(x, axis=-1)
    y = jnp.where(mask, points[..., 1], -big)
    ymax = jnp.max(y, axis=-1)
    y = jnp.where(mask, points[..., 1], big)
    ymin = jnp.min(y, axis=-1)
    xc, yc = 0.5 * (xmax + xmin), 0.5 * (ymax + ymin)
    length, width = xmax - xmin, ymax - ymin
    ok = (jnp.minimum(length, width) > dim_thresh) & jnp.any(mask, axis=-1)
    return xc, yc, length, width, ok


@functools.partial(jax.jit, static_argnames=("estimate_facing_dir",))
def fit_cuboids(points: jnp.ndarray, mask: jnp.ndarray,
                dim_lo: jnp.ndarray, dim_hi: jnp.ndarray,
                estimate_facing_dir: bool = False) -> CuboidFit:
    """points [I, P, 3] (world frame), mask [I, P]; dim_lo/hi [I, 3] per-
    instance (length, width, height) gates from the class config."""
    cnt = jnp.maximum(jnp.sum(mask, axis=-1), 1)
    mean_xy = (jnp.sum(jnp.where(mask[..., None], points[..., :2], 0.0),
                       axis=1) / cnt[:, None])
    d = jnp.where(mask[..., None], points[..., :2] - mean_xy[:, None, :], 0.0)
    cxx = jnp.sum(d[..., 0] * d[..., 0], axis=1)
    cyy = jnp.sum(d[..., 1] * d[..., 1], axis=1)
    cxy = jnp.sum(d[..., 0] * d[..., 1], axis=1)
    # principal direction of the 2x2 covariance
    raw_yaw = 0.5 * jnp.arctan2(2 * cxy, cxx - cyy)
    x_axis = jnp.stack([jnp.cos(raw_yaw), jnp.sin(raw_yaw)], axis=-1)  # [I,2]
    y_axis = jnp.stack([-x_axis[:, 1], x_axis[:, 0]], axis=-1)

    xp = jnp.einsum("ipd,id->ip", points[..., :2], x_axis)
    yp = jnp.einsum("ipd,id->ip", points[..., :2], y_axis)
    zp = points[..., 2]

    x99, x01 = _masked_percentile(xp, mask, 99), _masked_percentile(xp, mask, 1)
    y99, y01 = _masked_percentile(yp, mask, 99), _masked_percentile(yp, mask, 1)
    z99, z01 = _masked_percentile(zp, mask, 99), _masked_percentile(zp, mask, 1)
    length, width, height = x99 - x01, y99 - y01, z99 - z01

    cen_pca = jnp.stack([0.5 * (x99 + x01), 0.5 * (y99 + y01),
                         0.5 * (z99 + z01)], axis=-1)
    # rotate PCA-frame centroid back to world (cuboid_detection:196-200)
    cw, sw = jnp.cos(raw_yaw), jnp.sin(raw_yaw)
    cen_world = jnp.stack([
        cw * cen_pca[:, 0] - sw * cen_pca[:, 1],
        sw * cen_pca[:, 0] + cw * cen_pca[:, 1],
        cen_pca[:, 2]], axis=-1)

    # constrain yaw to [0, pi) (cuboid_detection:151-156)
    yaw = jnp.where(raw_yaw < 0, raw_yaw + jnp.pi, raw_yaw)
    yaw = jnp.where(yaw >= jnp.pi, yaw - jnp.pi, yaw)

    if estimate_facing_dir:
        rear_cut = _masked_percentile(xp, mask, 5)
        front_cut = _masked_percentile(xp, mask, 95)
        front_h = _masked_percentile(
            jnp.where(xp >= front_cut[:, None], zp, jnp.nan), mask, 70)
        rear_h = _masked_percentile(
            jnp.where(xp <= rear_cut[:, None], zp, jnp.nan), mask, 70)
        yaw = jnp.where(rear_h < front_h, yaw + jnp.pi, yaw)

    dims = jnp.stack([length, width, height], axis=-1)
    ok = (jnp.all(dims > dim_lo, axis=-1) & jnp.all(dims < dim_hi, axis=-1)
          & (jnp.sum(mask, axis=-1) > 3))
    return CuboidFit(centroid=cen_world, dims=dims, yaw=yaw, valid=ok)
