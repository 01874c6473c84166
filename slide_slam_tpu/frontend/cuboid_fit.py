"""Batched cuboid fitting from clustered instance points.

Re-derivation of cuboid_detection / fit_cuboid
(frontend/scan2shape/script/cuboid_utils_outdoor.py:73-208) as batched jax
over padded instance tensors [I, P, 3]:

* axis-aligned bbox seeding (`fit_bbox_seeds` == fit_cuboid:175-208),
* PCA-oriented cuboid (`fit_cuboids`): principal 2D direction (closed-form
  2x2 eigenvector instead of sklearn PCA) over the instance's convex-hull
  outline (cuboid_detection:80-90; here a fixed-shape batched hull: the set
  of extreme points over N_HULL_DIRS support directions — exact hull
  vertices up to angular resolution, no data-dependent shapes), yaw
  constrained to [0, pi), 1/99-percentile extents, per-class dimension
  gates, optional car-facing-direction flip from the front/rear height
  profile (:131-215),
* `cluster_cuboid_orientation`: host-side 2-means yaw snapping of the final
  cuboid set (cuboid_utils_outdoor.py:211-330) for parking-lot-style scenes.
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


N_HULL_DIRS = 64


def _hull_vertex_mask(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[I, P] mask of convex-hull vertices of each instance's XY point set,
    approximated as the extreme points over N_HULL_DIRS support directions
    (every hull vertex is extreme in some direction; 64 directions resolve
    vertices to ~5.6 deg). Fixed-shape batched stand-in for the reference's
    open3d compute_convex_hull (cuboid_detection:80-87)."""
    ang = jnp.linspace(0.0, 2.0 * jnp.pi, N_HULL_DIRS, endpoint=False)
    dirs = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)       # [K,2]
    proj = jnp.einsum("ipd,kd->ikp", points[..., :2], dirs)       # [I,K,P]
    proj = jnp.where(mask[:, None, :], proj, -jnp.inf)
    arg = jnp.argmax(proj, axis=-1)                               # [I,K]
    out = jnp.zeros(mask.shape, bool)
    return out.at[jnp.arange(mask.shape[0])[:, None], arg].set(True) & mask


@functools.partial(jax.jit,
                   static_argnames=("estimate_facing_dir", "use_convex",
                                    "minmax_extents"))
def fit_cuboids(points: jnp.ndarray, mask: jnp.ndarray,
                dim_lo: jnp.ndarray, dim_hi: jnp.ndarray,
                estimate_facing_dir: bool = False,
                use_convex: bool = True,
                minmax_extents: bool = False) -> CuboidFit:
    """points [I, P, 3] (world frame), mask [I, P]; dim_lo/hi [I, 3] per-
    instance (length, width, height) gates from the class config.

    With use_convex (the reference's default, cuboid_detection use_convex
    arg) the PCA direction is fit on the hull outline so interior point
    density does not bias the orientation; extents/centroid still use all
    points (exactly like the reference)."""
    pca_mask = _hull_vertex_mask(points, mask) if use_convex else mask
    cnt = jnp.maximum(jnp.sum(pca_mask, axis=-1), 1)
    mean_xy = (jnp.sum(jnp.where(pca_mask[..., None], points[..., :2], 0.0),
                       axis=1) / cnt[:, None])
    d = jnp.where(pca_mask[..., None], points[..., :2] - mean_xy[:, None, :],
                  0.0)
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

    # outdoor uses robust 1/99-percentile extents (cuboid_detection:160-170);
    # the indoor variant uses exact min/max (cuboid_detection_indoor:133-146)
    q_hi, q_lo = (100.0, 0.0) if minmax_extents else (99.0, 1.0)
    x99, x01 = (_masked_percentile(xp, mask, q_hi),
                _masked_percentile(xp, mask, q_lo))
    y99, y01 = (_masked_percentile(yp, mask, q_hi),
                _masked_percentile(yp, mask, q_lo))
    z99, z01 = (_masked_percentile(zp, mask, q_hi),
                _masked_percentile(zp, mask, q_lo))
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


def cluster_cuboid_orientation(yaws) -> "jnp.ndarray":
    """Snap cuboid yaws to the scene's two dominant orthogonal directions
    (cluster_cuboid_orientation, cuboid_utils_outdoor.py:211-305): 2-means
    over yaws folded into [-pi/4, 3pi/4), centers merged if < 45 deg apart
    (size-weighted), the runner-up center forced orthogonal to the winner,
    then every yaw snapped to its nearest center under the 180-deg-
    ambiguous angle metric. Host-side finalization over the (small) final
    cuboid list, like the reference's pre-publish hook
    (publish_cuboid_markers:318-322).
    """
    import numpy as np

    yaws = np.asarray(yaws, np.float64)
    n = len(yaws)
    if n <= 2:                      # "Not enough cuboids" (ref :304-306)
        return yaws
    folded = yaws.copy()
    folded[folded < -np.pi / 4] += np.pi
    folded[folded > 3 * np.pi / 4] -= np.pi

    try:
        from sklearn.cluster import KMeans
        km = KMeans(n_clusters=2, random_state=0, n_init=10).fit(
            folded.reshape(-1, 1))
        centers = km.cluster_centers_.ravel()
        labels = km.labels_
    except ImportError:             # deterministic 2-means fallback
        centers = np.array([folded.min(), folded.max()])
        for _ in range(20):
            labels = np.argmin(np.abs(folded[:, None] - centers[None, :]),
                               axis=1)
            for k in range(2):
                if np.any(labels == k):
                    centers[k] = folded[labels == k].mean()
    sizes = np.array([(labels == 0).sum(), (labels == 1).sum()])

    if abs(centers[0] - centers[1]) < np.pi / 4:        # merge (ref :249-256)
        merged = (centers * sizes).sum() / sizes.sum()
        main = merged
    else:
        main = centers[int(np.argmax(sizes))]
    ortho = main + np.pi / 2
    if ortho > 3 * np.pi / 4:
        ortho -= np.pi
    cc = np.array([main, ortho])

    diff = np.abs(cc[None, :] - folded[:, None])        # [n, 2]
    diff = np.where(diff > np.pi / 2, np.pi - diff, diff)
    snapped = cc[np.argmin(diff, axis=1)]
    return snapped.astype(np.asarray(yaws).dtype)
