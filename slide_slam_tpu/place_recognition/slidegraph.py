"""SlideGraph place recognition: Delaunay triangle descriptors + CLIPPER.

Re-implementation of run_semantic_clipper
(clipper_semantic_object/src/semantic_clipper.cpp:140-274):

1. 2D Delaunay triangulation of each object map (scipy.spatial.Delaunay on
   host replaces the vendored qhull C++ wrapper — same algorithm family).
2. Triangle descriptor: the sorted vertex-to-centroid distances
   (semantic_clipper.cpp:49-108). All triangle pairs whose descriptors differ
   by < threshold contribute their 3 sorted vertex pairs as candidate
   associations — vectorized here as a dense [Tm, Td] descriptor-distance
   matrix instead of the reference's double loop.
3. CLIPPER pairwise-consistency + dense-clique relaxation (clipper.py, on
   device) selects the geometrically consistent subset.
4. 2D SVD rigid fit (estimate_tf, semantic_clipper.cpp:122-138) -> yaw+xy 4x4.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..config import SlideGraphConfig
from .clipper import ClipperParams, dense_clique_inliers


def _triangles(points_2d: np.ndarray) -> np.ndarray:
    """[T, 3, 2] triangle vertices from Delaunay; empty if degenerate."""
    from scipy.spatial import Delaunay, QhullError

    pts = np.asarray(points_2d, np.float64)
    if len(pts) < 3:
        return np.zeros((0, 3, 2))
    try:
        tri = Delaunay(pts)
    except QhullError:
        return np.zeros((0, 3, 2))
    return pts[tri.simplices]


def _sorted_descriptors(tris: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(descriptors [T,3], vertices sorted by centroid distance [T,3,2])."""
    if len(tris) == 0:
        return np.zeros((0, 3)), tris
    cen = tris.mean(axis=1, keepdims=True)          # [T,1,2]
    d = np.linalg.norm(tris - cen, axis=2)          # [T,3]
    order = np.argsort(d, axis=1, kind="stable")
    desc = np.take_along_axis(d, order, axis=1)
    verts = np.take_along_axis(tris, order[:, :, None], axis=1)
    return desc, verts


def match_triangles(tri_model: np.ndarray, tri_data: np.ndarray,
                    threshold: float):
    """All triangle pairs with descriptor L2 diff < threshold ->
    (matched model points [3k, 2], matched data points [3k, 2])."""
    dm, vm = _sorted_descriptors(tri_model)
    dd, vd = _sorted_descriptors(tri_data)
    if len(dm) == 0 or len(dd) == 0:
        return np.zeros((0, 2)), np.zeros((0, 2))
    diff = np.linalg.norm(dm[:, None, :] - dd[None, :, :], axis=2)
    mi, di = np.nonzero(diff < threshold)
    pts_m = vm[mi].reshape(-1, 2)
    pts_d = vd[di].reshape(-1, 2)
    return pts_m, pts_d


def estimate_tf_2d(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """2D rigid fit b ~= R a + t (semantic_clipper.cpp:122-138) -> 3x3."""
    mu_a, mu_b = a.mean(0), b.mean(0)
    H = (a - mu_a).T @ (b - mu_b)
    U, _, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        R[:, 1] *= -1
    t = mu_b - R @ mu_a
    tf = np.eye(3)
    tf[:2, :2] = R
    tf[:2, 2] = t
    return tf


def run_semantic_clipper(reference_map: np.ndarray, query_map: np.ndarray,
                         sigma: float, epsilon: float, min_num_pairs: int,
                         matching_threshold: float,
                         max_associations: int = 2048,
                         seed: int = 0):
    """(found, tfFromQuery2Ref-as-the-reference-returns-it [4,4]).

    NOTE the reference quirk: run_semantic_clipper's output maps MODEL(ref)
    -> DATA(query); the caller inverts it (place_recognition.cpp:621-624).
    We return the same un-inverted convention here."""
    ref = np.asarray(reference_map, np.float64).reshape(-1, 7)
    qry = np.asarray(query_map, np.float64).reshape(-1, 7)
    # drop objects with zero XY (place_recognition.cpp:584-603)
    ref = ref[~((ref[:, 1] == 0) & (ref[:, 2] == 0))]
    qry = qry[~((qry[:, 1] == 0) & (qry[:, 2] == 0))]

    tri_m = _triangles(ref[:, 1:3])
    tri_d = _triangles(qry[:, 1:3])
    pts_m, pts_d = match_triangles(tri_m, tri_d, matching_threshold)
    if len(pts_m) == 0:
        return False, None
    if len(pts_m) > max_associations:
        # bounded like the reference's CLIPPER (affinity is O(A^2) memory);
        # never silent: the cap and the drop count are logged
        import logging
        logging.getLogger(__name__).warning(
            "slidegraph: %d putative associations exceed cap %d; "
            "randomly subsampling (dropping %d)",
            len(pts_m), max_associations, len(pts_m) - max_associations)
        keep = np.random.default_rng(seed).permutation(len(pts_m))[:max_associations]
        pts_m, pts_d = pts_m[keep], pts_d[keep]

    params = ClipperParams(sigma=sigma, epsilon=epsilon)
    inliers = dense_clique_inliers(pts_m, pts_d, params, seed=seed)
    if len(inliers) < min_num_pairs:
        return False, None

    tf2 = estimate_tf_2d(pts_m[inliers], pts_d[inliers])
    yaw = np.arctan2(tf2[1, 0], tf2[0, 0])
    tf = np.eye(4)
    tf[0, 0], tf[0, 1] = np.cos(yaw), -np.sin(yaw)
    tf[1, 0], tf[1, 1] = np.sin(yaw), np.cos(yaw)
    tf[0, 3], tf[1, 3] = tf2[0, 2], tf2[1, 2]
    return True, tf


class SlideGraph:
    """findInterLoopClosureWithClipper (place_recognition.cpp:541-629)."""

    def __init__(self, cfg: SlideGraphConfig):
        self.cfg = cfg

    def find_inter_loop_closure(self, reference_map: np.ndarray,
                                query_map: np.ndarray,
                                seed: int = 0):
        ref = np.asarray(reference_map, np.float32).reshape(-1, 7)
        qry = np.asarray(query_map, np.float32).reshape(-1, 7)
        ref = ref[~((ref[:, 1] == 0) & (ref[:, 2] == 0))]
        qry = qry[~((qry[:, 1] == 0) & (qry[:, 2] == 0))]
        if (len(ref) < self.cfg.min_num_map_objects_to_start
                or len(qry) < self.cfg.min_num_map_objects_to_start):
            return False, None
        found, tf = run_semantic_clipper(
            ref, qry, self.cfg.sigma, self.cfg.epsilon,
            self.cfg.num_inliers_threshold,
            self.cfg.descriptor_matching_threshold, seed=seed)
        if not found:
            return False, None
        # the caller-side inversion (place_recognition.cpp:624)
        return True, np.linalg.inv(tf)
