"""Batched cylinder (tree/pole) fitting.

Re-derivation of CylinderPlaneModeller.fit_cylinder
(frontend/object_modeller/script/cylinder_plane_modeller.py:370-480) as
batched jax over padded instance tensors:

* local ground-patch plane per instance: batched-hypothesis RANSAC
  (`fit_plane_ransac`, matching the reference's open3d/PCL RANSAC but with
  all hypotheses evaluated in one broadcasted kernel) with a masked
  least-squares consensus refit; `fit_plane_lsq` remains as the cheap
  robust-refit variant,
* axis from the principal 3D direction of the instance points, oriented
  along the ground normal,
* radius from the max pairwise diameter of points in the breast-height band
  (1.37 m +- 0.3 above ground, :437-460), clamped to the radius cutoff with
  default fallback,
* root = intersection of the axis through the band centroid with the ground
  plane (:470-476).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CylinderFit(NamedTuple):
    root: jnp.ndarray     # [I, 3]
    ray: jnp.ndarray      # [I, 3] unit, upward
    radius: jnp.ndarray   # [I]
    valid: jnp.ndarray    # [I]


def fit_plane_lsq(points: jnp.ndarray, mask: jnp.ndarray,
                  robust_thresh: float = 0.1):
    """Masked plane fit per batch row: points [I, G, 3], mask [I, G] ->
    (normal [I,3] unit, d [I]) with plane n.x + d = 0. One robust re-fit."""

    def fit(pts, m):
        cnt = jnp.maximum(jnp.sum(m), 1)
        mu = jnp.sum(jnp.where(m[:, None], pts, 0.0), axis=0) / cnt
        d = jnp.where(m[:, None], pts - mu, 0.0)
        cov = d.T @ d / cnt
        # smallest eigenvector of 3x3 covariance
        w, v = jnp.linalg.eigh(cov)
        n = v[:, 0]
        n = jnp.where(n[2] < 0, -n, n)    # upward normal
        return n, -jnp.dot(n, mu)

    def one(pts, m):
        n, dd = fit(pts, m)
        dist = jnp.abs(pts @ n + dd)
        m2 = m & (dist < robust_thresh)
        m2 = jnp.where(jnp.sum(m2) >= 3, m2, m)
        return fit(pts, m2)

    return jax.vmap(one)(points, mask)


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
def fit_plane_ransac(points: jnp.ndarray, mask: jnp.ndarray,
                     thresh: float = 0.1, n_hypotheses: int = 64,
                     seed: int = 0):
    """Batched RANSAC plane fit: points [I, G, 3], mask [I, G] ->
    (normal [I,3] unit upward, d [I], inlier_count [I]).

    The reference fits ground with RANSAC (open3d `segment_plane`,
    process_cloud_node_outdoor.py:283-303; PCL SACMODEL_PLANE in
    cylinder.cpp). Sequential hypothesis loops are the wrong shape for the
    TPU, so ALL hypotheses are materialized at once: [I, H] candidate
    planes from random point triples, [I, H, G] inlier tests by broadcast,
    argmax over H, then one masked least-squares refit on the winning
    consensus set — exact RANSAC semantics, one fused kernel.

    Hypothesis triples are drawn from the MASKED subset of each row (the
    per-row valid points are compacted to the front with a stable argsort
    and uniform draws are taken modulo the valid count), so sparse masks —
    e.g. 2 m ground patches out of 1024 scan-wide padded points in
    pipeline.py — still yield all-valid hypotheses."""
    I, G, _ = points.shape
    key = jax.random.PRNGKey(seed)
    # valid-point indices compacted to the front of each row
    order = jnp.argsort(jnp.where(mask, 0, 1), axis=-1, stable=True)  # [I,G]
    cnt = jnp.maximum(jnp.sum(mask, axis=-1), 1)                      # [I]
    r = jax.random.randint(key, (I, n_hypotheses, 3), 0, jnp.iinfo(jnp.int32).max)
    j = r % cnt[:, None, None]
    # re-draw collisions deterministically by offsetting WITHIN the valid
    # range (cheap, avoids degenerate triples when the valid count is small)
    j = j.at[..., 1].set((j[..., 1] + 1 + j[..., 0]) % cnt[:, None])
    j = j.at[..., 2].set((j[..., 2] + 7 + j[..., 1]) % cnt[:, None])
    idx = jax.vmap(lambda o, jj: o[jj])(order, j)                     # [I,H,3]

    tri = jnp.take_along_axis(points[:, None, :, :],
                              idx[..., None].repeat(3, -1), axis=2)  # [I,H,3,3]
    # all draws land on valid points whenever the row has >= 3 of them
    tri_ok = jnp.all(jnp.take_along_axis(mask[:, None, :], idx, axis=2),
                     axis=-1)                                        # [I,H]
    tri_ok = tri_ok & (jnp.sum(mask, axis=-1) >= 3)[:, None]
    p0, p1, p2 = tri[:, :, 0], tri[:, :, 1], tri[:, :, 2]
    n = jnp.cross(p1 - p0, p2 - p0)
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    degenerate = nn[..., 0] < 1e-9
    n = n / jnp.maximum(nn, 1e-9)
    n = n * jnp.where(n[..., 2:3] < 0, -1.0, 1.0)   # upward
    d = -jnp.einsum("ihd,ihd->ih", n, p0)           # [I,H]

    dist = jnp.abs(jnp.einsum("ihd,igd->ihg", n, points) + d[..., None])
    inl = (dist < thresh) & mask[:, None, :]        # [I,H,G]
    counts = jnp.where(tri_ok & ~degenerate, jnp.sum(inl, axis=-1), -1)
    best = jnp.argmax(counts, axis=-1)              # [I]

    best_inl = jnp.take_along_axis(inl, best[:, None, None], axis=1)[:, 0]
    best_cnt = jnp.take_along_axis(counts, best[:, None], axis=1)[:, 0]

    def lsq(pts, m):
        c = jnp.maximum(jnp.sum(m), 1)
        mu = jnp.sum(jnp.where(m[:, None], pts, 0.0), axis=0) / c
        dd = jnp.where(m[:, None], pts - mu, 0.0)
        w, v = jnp.linalg.eigh(dd.T @ dd / c)
        nrm = v[:, 0]
        nrm = jnp.where(nrm[2] < 0, -nrm, nrm)
        return nrm, -jnp.dot(nrm, mu)

    # if no hypothesis survived (degenerate geometry), fall back to a ROBUST
    # refit — plain fit on the mask, then re-fit on its thresh-inliers —
    # never to an unguarded LSQ over outlier-contaminated points
    n0, d0 = jax.vmap(lsq)(points, mask)
    fb_inl = mask & (jnp.abs(jnp.einsum("igd,id->ig", points, n0)
                             + d0[:, None]) < thresh)
    fb = jnp.where((jnp.sum(fb_inl, axis=-1) >= 3)[:, None], fb_inl, mask)
    refit_mask = jnp.where((best_cnt >= 3)[:, None], best_inl, fb)

    nf, df = jax.vmap(lsq)(points, refit_mask)
    return nf, df, jnp.maximum(best_cnt, 0)


@functools.partial(jax.jit, static_argnames=("min_points", "min_band_points"))
def fit_cylinders(points: jnp.ndarray, mask: jnp.ndarray,
                  ground_normal: jnp.ndarray, ground_d: jnp.ndarray,
                  *, breast_height: float = 1.37, band_half: float = 0.3,
                  radius_cutoff=(0.05, 1.0), default_radius: float = 0.2,
                  min_points: int = 10, min_band_points: int = 3) -> CylinderFit:
    """points [I, P, 3] instance clouds (world), mask [I, P], per-instance
    ground plane (normal [I,3], d [I])."""
    cnt = jnp.sum(mask, axis=-1)

    # principal axis (3D PCA) per instance
    def principal_axis(pts, m):
        c = jnp.maximum(jnp.sum(m), 1)
        mu = jnp.sum(jnp.where(m[:, None], pts, 0.0), axis=0) / c
        d = jnp.where(m[:, None], pts - mu, 0.0)
        cov = d.T @ d / c
        w, v = jnp.linalg.eigh(cov)
        return v[:, -1]

    axis = jax.vmap(principal_axis)(points, mask)              # [I,3]
    # orient along ground normal (upward)
    updot = jnp.einsum("id,id->i", axis, ground_normal)
    axis = axis * jnp.where(updot < 0, -1.0, 1.0)[:, None]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-9)

    # height above ground per point
    h = jnp.einsum("ipd,id->ip", points, ground_normal) + ground_d[:, None]
    band = mask & (jnp.abs(h - breast_height) < band_half)
    band_cnt = jnp.sum(band, axis=-1)

    # diameter = max pairwise distance inside the band (:449-460)
    def band_diameter(pts, bm):
        d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(bm[:, None] & bm[None, :], d2, 0.0)
        return jnp.sqrt(jnp.max(d2))

    diameter = jax.vmap(band_diameter)(points, band)
    lo, hi = 2 * radius_cutoff[0], 2 * radius_cutoff[1]
    radius = jnp.where((diameter < lo) | (diameter > hi),
                       default_radius, 0.5 * diameter)

    # representative point = mean of band points; root = axis ^ ground plane
    bc = jnp.maximum(band_cnt, 1)[:, None]
    rep = jnp.sum(jnp.where(band[..., None], points, 0.0), axis=1) / bc
    denom = jnp.einsum("id,id->i", ground_normal, axis)
    t = -(jnp.einsum("id,id->i", ground_normal, rep) + ground_d) \
        / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    root = rep + t[:, None] * axis

    ok = (cnt >= min_points) & (band_cnt >= min_band_points)
    return CylinderFit(root=root, ray=axis, radius=radius, valid=ok)


def select_ground_patches(ground_points: jnp.ndarray, ground_valid: jnp.ndarray,
                          centroids: jnp.ndarray, patch_size: float):
    """[I, G] masks of ground points within patch_size/2 (XY) of each
    instance centroid (fit_cylinder:374-380)."""
    dxy = jnp.linalg.norm(
        ground_points[None, :, :2] - centroids[:, None, :2], axis=-1)
    return ground_valid[None, :] & (dxy < patch_size / 2)
