"""SlideMatch place recognition as a dense TPU kernel.

The reference runs an *anytime* CPU grid search over SE(2)xYaw
(place_recognition.cpp:98-387): rings expanding from the origin under a
10-second compute budget, each candidate scored by exact per-object matching.
On TPU the whole grid is evaluated at once:

1. **Label rasters** (exact disk splats): per semantic-label bin, a fine
   occupancy grid R[l, i, j] = "some map object with label l lies within
   match_threshold of this cell center". Built by scattering a DSxDS disk
   stencil around every map object with the exact distance test.
2. **Dense scoring**: for every yaw candidate, rotate the query objects
   once and rasterize them; the inlier counts for ALL translations at once
   are the per-label cross-correlation of the query raster with the
   reference raster — batched FFTs, which XLA lowers onto the MXU. No
   rings, no budget, full coverage at raster granularity, zero gathers.
3. **Exact rescore**: the top-K raster candidates are re-scored with the
   reference's exact criteria (label equality, exact XY distance, optional
   dimension check, first-map-match pairing, place_recognition.cpp:281-357),
   which removes the raster's nearest-cell rounding from the final answer.

The result protocol matches findTransformation (:736-944): min-inlier gate,
then Umeyama LSQ refinement (solveLSQ :632-695) or raw grid transform.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PlaceRecognitionConfig
from ..geometry import se3np
from ..geometry import se3

N_LABEL_BINS = 16


@dataclass(frozen=True)
class SlideMatchDims:
    """Static kernel shapes (independent of the data)."""
    fine_grid: int = 512       # label-raster resolution per axis
    disk_radius_cells: int = 8
    max_objects: int = 384     # padded map/query object count
    n_yaw: int = 24
    rescore_topk: int = 64


def _pad_objects(objs: np.ndarray, n: int):
    objs = np.asarray(objs, np.float32).reshape(-1, 7)
    if len(objs) > n:
        raise ValueError(
            f"map has {len(objs)} objects but kernel capacity is {n}; "
            "use _bucket_capacity to auto-size (silent truncation forbidden)")
    k = len(objs)
    out = np.zeros((n, 7), np.float32)
    out[:k] = objs[:k]
    mask = np.zeros((n,), bool)
    mask[:k] = True
    return jnp.asarray(out), jnp.asarray(mask)


def _bucket_capacity(n: int, base: int) -> int:
    """Smallest multiple of 128 >= max(n, base).

    The reference searches the FULL map under a time budget
    (place_recognition.cpp:148-196); truncating a map would silently
    change the answer, so instead the kernel capacity is bucketed —
    each new bucket costs one extra XLA compile, after which every map
    up to that size reuses it."""
    need = max(n, base)
    return ((need + 127) // 128) * 128


_label_bin_wraps = 0   # diagnostic counter (see _compact_label_bins)


def _compact_label_bins(ref_labels: np.ndarray, qry_labels: np.ndarray):
    """Map raw label values to compact raster bins.

    The raster has N_LABEL_BINS planes; raw label VALUES may exceed that
    (open-vocab detectors emit arbitrary class ids). A shared compact remap
    over the labels actually present keeps distinct labels in distinct
    planes whenever <= N_LABEL_BINS distinct labels occur (always true for
    the reference's class sets); beyond that, bins wrap modulo — which only
    blurs the *candidate ranking*, since the exact top-K rescore always
    compares raw label values."""
    uniq = np.unique(np.concatenate([ref_labels, qry_labels]))
    if len(uniq) > N_LABEL_BINS:
        # diagnosable recall loss on label-rich maps (ADVICE r3): count it
        global _label_bin_wraps
        _label_bin_wraps += 1
        import logging
        logging.getLogger(__name__).debug(
            "slidematch: %d distinct labels > %d raster bins; candidate "
            "ranking blurred (wrap #%d)", len(uniq), N_LABEL_BINS,
            _label_bin_wraps)
    lut = {v: i % N_LABEL_BINS for i, v in enumerate(uniq.tolist())}
    rb = np.asarray([lut[v] for v in ref_labels.tolist()], np.int32)
    qb = np.asarray([lut[v] for v in qry_labels.tolist()], np.int32)
    return rb, qb


@functools.partial(jax.jit, static_argnames=("dims", "ignore_dimension"))
def _slidematch_kernel(
    dims: SlideMatchDims,
    ref: jnp.ndarray, ref_mask: jnp.ndarray,       # [M,7], [M]
    qry: jnp.ndarray, qry_mask: jnp.ndarray,       # [Q,7], [Q]
    ref_bin: jnp.ndarray, qry_bin: jnp.ndarray,    # [M], [Q] compact bins
    yaws: jnp.ndarray,                             # [Y]
    half_x: jnp.ndarray, half_y: jnp.ndarray,      # traced scalars
    xy_step: jnp.ndarray,
    thresh: jnp.ndarray,
    dim_thresh: jnp.ndarray,
    ignore_dimension: bool,
):
    F = dims.fine_grid
    DR = dims.disk_radius_cells
    M = ref.shape[0]
    Q = qry.shape[0]

    ref_xy = ref[:, 1:3]
    qry_xy = qry[:, 1:3]
    ref_ext = jnp.max(jnp.where(ref_mask[:, None], jnp.abs(ref_xy), 0.0))
    qry_ext = jnp.max(jnp.where(qry_mask[:, None], jnp.abs(qry_xy), 0.0))
    half = jnp.maximum(half_x, half_y)
    ext = qry_ext + half + thresh + 1.0
    ext = jnp.maximum(ext, ref_ext + thresh + 1.0)
    # fine_step: raster must (a) cover +-ext, (b) fit the match disk inside
    # the DSxDS stencil
    fine_step = jnp.maximum(2.0 * ext / F, thresh / (DR - 0.5))

    # ---- 1. build label rasters by exact disk splatting -------------------
    label_bin = jnp.clip(ref_bin, 0, N_LABEL_BINS - 1)
    base = jnp.floor((ref_xy + ext) / fine_step).astype(jnp.int32)   # [M,2]
    offs = jnp.arange(-DR, DR + 1)
    ox, oy = jnp.meshgrid(offs, offs, indexing="ij")                 # [D,D]
    cell_x = base[:, 0, None, None] + ox[None]                       # [M,D,D]
    cell_y = base[:, 1, None, None] + oy[None]
    cx = (cell_x.astype(jnp.float32) + 0.5) * fine_step - ext
    cy = (cell_y.astype(jnp.float32) + 0.5) * fine_step - ext
    inside = ((cx - ref_xy[:, 0, None, None]) ** 2
              + (cy - ref_xy[:, 1, None, None]) ** 2) < thresh ** 2
    inside = inside & ref_mask[:, None, None]
    ok = ((cell_x >= 0) & (cell_x < F) & (cell_y >= 0) & (cell_y < F)
          & inside)
    flat = (label_bin[:, None, None] * F * F + cell_x * F + cell_y)
    flat = jnp.where(ok, flat, N_LABEL_BINS * F * F)  # OOB -> dropped
    raster = jnp.zeros((N_LABEL_BINS * F * F,), jnp.int8)
    raster = raster.at[flat.reshape(-1)].max(
        jnp.ones_like(flat, jnp.int8).reshape(-1), mode="drop")

    # ---- 2. dense scoring over the (yaw, tx, ty) grid via FFT -------------
    # counts(t) at yaw = sum_q R_{l(q)}[cell(q_rot) + t] — a per-label cross-
    # correlation of the reference raster with the rotated-query count
    # raster, evaluated for EVERY translation cell at once:
    #   counts = sum_l  ifft( conj(fft(Qcnt_l)) * fft(R_l) ).
    # Gather-free: XLA lowers the batched FFTs onto the MXU, replacing the
    # Y*G^2*Q random gathers of a direct evaluation. No circular aliasing:
    # ext is padded so cell(q)+t stays in-raster for every |t| <= half and
    # the wrapped band of R is provably empty (ext >= ref_ext + thresh + 1).
    # Translations come out at fine_step granularity — finer than the
    # reference's search_xy_step_size; the exact top-K rescore below removes
    # any residual raster rounding either way.
    R_fft = jnp.fft.rfft2(
        raster.reshape(N_LABEL_BINS, F, F).astype(jnp.float32))

    q_bin = jnp.clip(qry_bin, 0, N_LABEL_BINS - 1)
    qv = jnp.where(qry_mask, 1.0, 0.0)

    def score_one_yaw(yaw):
        c, s_ = jnp.cos(yaw), jnp.sin(yaw)
        qr_x = c * qry_xy[:, 0] - s_ * qry_xy[:, 1]                   # [Q]
        qr_y = s_ * qry_xy[:, 0] + c * qry_xy[:, 1]
        cxq = jnp.floor((qr_x + ext) / fine_step).astype(jnp.int32)
        cyq = jnp.floor((qr_y + ext) / fine_step).astype(jnp.int32)
        inb = ((cxq >= 0) & (cxq < F) & (cyq >= 0) & (cyq < F)
               & qry_mask)
        flat_q = q_bin * F * F + cxq * F + cyq
        flat_q = jnp.where(inb, flat_q, N_LABEL_BINS * F * F)
        qcnt = jnp.zeros((N_LABEL_BINS * F * F,), jnp.float32)
        qcnt = qcnt.at[flat_q].add(qv, mode="drop")
        Q_fft = jnp.fft.rfft2(qcnt.reshape(N_LABEL_BINS, F, F))
        corr = jnp.fft.irfft2(jnp.conj(Q_fft) * R_fft, s=(F, F))      # [L,F,F]
        return jnp.sum(corr, axis=0)                                  # [F,F]

    counts = jax.lax.map(score_one_yaw, yaws)                         # [Y,F,F]
    counts = jnp.round(counts).astype(jnp.int32)

    # shift index k -> signed translation t = k_signed * fine_step
    k = jnp.arange(F)
    k_signed = jnp.where(k > F // 2, k - F, k).astype(jnp.float32)
    tvals = k_signed * fine_step                                      # [F]
    t_mask = ((jnp.abs(tvals)[:, None] <= half_x + 1e-6)
              & (jnp.abs(tvals)[None, :] <= half_y + 1e-6))           # [F,F]
    counts = jnp.where(t_mask[None], counts, -1)

    # ---- 3. exact rescore of the top-K raster candidates ------------------
    K = dims.rescore_topk
    flat_counts = counts.reshape(-1)
    _, top_idx = jax.lax.top_k(flat_counts, K)
    yaw_i = top_idx // (F * F)
    tx_i = (top_idx // F) % F
    ty_i = top_idx % F
    cand = jnp.stack([tvals[tx_i], tvals[ty_i], yaws[yaw_i]], axis=1)  # [K,3]

    ref_dims = ref[:, 4:7]
    qry_dims = qry[:, 4:7]
    # avg dim diff with the cylinder special case (only dim1 nonzero,
    # place_recognition.cpp:315-330)
    cyl_like = (ref_dims[:, 1] == 0) & (ref_dims[:, 2] == 0)          # [M]
    dd = jnp.abs(ref_dims[None, :, :] - qry_dims[:, None, :])         # [Q,M,3]
    avg_dd = jnp.where(cyl_like[None, :], dd[:, :, 0], jnp.mean(dd, axis=-1))
    label_eq = (ref[None, :, 0] == qry[:, None, 0])                   # [Q,M]
    dim_ok = (jnp.ones_like(label_eq) if ignore_dimension
              else (avg_dd < dim_thresh))
    pair_ok_static = (label_eq & dim_ok
                      & ref_mask[None, :] & qry_mask[:, None])        # [Q,M]

    def exact_match(c3):
        cth, sth = jnp.cos(c3[2]), jnp.sin(c3[2])
        qx = cth * qry_xy[:, 0] - sth * qry_xy[:, 1] + c3[0]
        qy = sth * qry_xy[:, 0] + cth * qry_xy[:, 1] + c3[1]
        d2 = ((qx[:, None] - ref_xy[None, :, 0]) ** 2
              + (qy[:, None] - ref_xy[None, :, 1]) ** 2)              # [Q,M]
        return pair_ok_static & (jnp.sqrt(d2) < thresh)

    def exact_count(c3):
        # counts only: keeps lax.map's stacked output at [K] instead of
        # materializing all K [Q,M] match matrices
        match = exact_match(c3)
        return jnp.sum(jnp.any(match, axis=1).astype(jnp.int32))

    exact_counts = jax.lax.map(exact_count, cand)
    best = jnp.argmax(exact_counts)
    best_c = cand[best]
    best_match = exact_match(best_c)                                   # [Q,M]

    has_match = jnp.any(best_match, axis=1)                            # [Q]
    first_m = jnp.argmax(best_match, axis=1)                           # [Q]
    ref_rows = ref[first_m]                                            # [Q,7]
    ref_pairs = jnp.concatenate([ref_rows[:, 0:1], ref_rows[:, 1:4]], axis=1)
    det_pairs = jnp.concatenate([qry[:, 0:1], qry[:, 1:4]], axis=1)

    # ONE packed [1+Q, 9] result: a device->host fetch costs a full tunnel
    # round trip (~38 ms measured) regardless of size, so the scalar winner
    # and the pair lists ship as a single transfer instead of four
    head = jnp.zeros((1, 9), jnp.float32).at[0, :4].set(
        jnp.stack([best_c[0], best_c[1], best_c[2],
                   exact_counts[best].astype(jnp.float32)]))
    body = jnp.concatenate([
        has_match[:, None].astype(jnp.float32), ref_pairs, det_pairs], axis=1)
    return jnp.concatenate([head, body], axis=0)


# ---------------------------------------------------------------------------
# Host-level protocol (findTransformation / findIntra / findInter)
# ---------------------------------------------------------------------------


def _yaw_candidates(half_deg: float, step_deg: float, disable: bool,
                    n_max: int) -> np.ndarray:
    if disable:
        return np.zeros((1,), np.float32)
    ys = np.arange(-half_deg, half_deg - 1e-9, step_deg, dtype=np.float32)
    if 0.0 not in ys:
        # always test the identity yaw: arange(-10, 10, 15) = [-10, 5]
        # misses 0, and an intra query is usually NEAR identity — without
        # it the raster winner sits a whole yaw step off
        ys = np.sort(np.concatenate([ys, np.zeros((1,), np.float32)]))
    if len(ys) == 0:
        ys = np.zeros((1,), np.float32)
    if len(ys) > n_max:
        # coarsen uniformly to the static budget
        ys = np.linspace(-half_deg, half_deg, n_max, endpoint=False,
                         dtype=np.float32)
    out = np.zeros((n_max,), np.float32)
    out[:len(ys)] = np.deg2rad(ys)
    out[len(ys):] = np.deg2rad(ys[-1])  # repeat last (harmless duplicates)
    return out


def solve_lsq(ref_pts: np.ndarray, det_pts: np.ndarray):
    """Umeyama rigid fit det -> ref (place_recognition.cpp:632-695)."""
    src = np.asarray(det_pts, np.float64)
    tgt = np.asarray(ref_pts, np.float64)
    mu_s, mu_t = src.mean(0), tgt.mean(0)
    H = (src - mu_s).T @ (tgt - mu_t)
    U, _, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        V2 = Vt.T.copy()
        V2[:, 2] *= -1
        R = V2 @ U.T
    t = mu_t - R @ mu_s
    tf = np.eye(4)
    tf[:3, :3] = R
    tf[:3, 3] = t
    return tf


def _icp_refine(tf: np.ndarray, ref: np.ndarray, qry: np.ndarray, cfg,
                iters: int = 3):
    """Re-match object pairs at the current TF and re-fit, a few rounds.

    ref/qry: [*, 7] rows [label, x, y, z, d1, d2, d3] in the ORIGINAL
    (unshifted) frame; tf maps query positions onto reference positions.
    Matching mirrors the kernel's exact-rescore gates: same label, xy
    distance < match_threshold_position, dimension gate unless ignored.
    Returns (tf, n_pairs, rms)."""
    if len(ref) == 0 or len(qry) == 0:
        return tf, 0, np.inf
    label_eq = ref[None, :, 0] == qry[:, None, 0]
    if not cfg.ignore_dimension:
        cyl_like = (ref[:, 5] == 0) & (ref[:, 6] == 0)
        dd = np.abs(ref[None, :, 4:7] - qry[:, None, 4:7])
        avg_dd = np.where(cyl_like[None, :], dd[:, :, 0], dd.mean(-1))
        label_eq = label_eq & (avg_dd < cfg.match_threshold_dimension)
    best = (0, np.inf, tf)        # (n_pairs, rms, tf) — keep the BEST
    for _ in range(iters):
        q = qry[:, 1:4] @ tf[:3, :3].T + tf[:3, 3]
        d = np.linalg.norm(q[:, None, :2] - ref[None, :, 1:3], axis=-1)
        d = np.where(label_eq, d, np.inf)
        j = np.argmin(d, axis=1)
        ok = d[np.arange(len(qry)), j] < cfg.match_threshold_position
        if int(ok.sum()) < 3:
            break
        n_ok = int(ok.sum())
        tf = solve_lsq(ref[j[ok], 1:4], qry[ok, 1:4])
        q2 = qry[ok, 1:4] @ tf[:3, :3].T + tf[:3, 3]
        rms = float(np.sqrt(np.mean(
            np.sum((q2 - ref[j[ok], 1:4]) ** 2, axis=1))))
        # guarded: keep the iterate with most pairs, then lowest rms —
        # re-matching on a coherently drifted submap can otherwise wander
        if n_ok > best[0] or (n_ok == best[0] and rms < best[1]):
            best = (n_ok, rms, tf)
    return best[2], best[0], best[1]


def _tf_from_xyyaw(x, y, yaw, z=0.0):
    tf = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    tf[0, 0], tf[0, 1], tf[1, 0], tf[1, 1] = c, -s, s, c
    tf[0, 3], tf[1, 3], tf[2, 3] = x, y, z
    return tf


class PlaceRecognition:
    """SlideMatch searcher (one per node, like PlaceRecognition instances in
    sloamNode.h)."""

    def __init__(self, cfg: PlaceRecognitionConfig,
                 dims: Optional[SlideMatchDims] = None):
        self.cfg = cfg
        self.dims = dims or SlideMatchDims()

    # -- core --------------------------------------------------------------
    def find_transformation(self, reference_objects: np.ndarray,
                            query_objects: np.ndarray, intra: bool):
        """Returns (found, xyzyaw [4], tf [4,4], n_inliers, fit).

        fit = (n_pairs, rms) of the accepted LSQ/ICP fit — the closure
        measurement-noise proxy consumed by the factor sigma. Returned,
        not stashed on the instance: one PlaceRecognition serves the
        concurrent intra- and inter-LC worker jobs of a node, and shared
        mutable fit state raced between them (ADVICE r4 #2). On the
        raster-only path (use_nonlinear_least_squares=False) the rms is
        proxied by match_threshold_position — the raster score counts
        pairs within that radius, so it bounds the per-pair residual.

        reference/query rows: [label, x, y, z, dim1, dim2, dim3]."""
        cfg = self.cfg
        reference_objects = np.asarray(reference_objects, np.float32).reshape(-1, 7)
        query_objects = np.asarray(query_objects, np.float32).reshape(-1, 7)
        if len(reference_objects) == 0 or len(query_objects) == 0:
            return False, None, None, 0, (0, np.inf)
        orig_ref = reference_objects
        orig_qry = query_objects

        cen_ref = np.zeros(2)
        cen_qry = np.zeros(2)
        if not intra:
            # centroid shift + auto search range (place_recognition.cpp:745-798)
            cen_ref = reference_objects[:, 1:3].mean(0)
            cen_qry = query_objects[:, 1:3].mean(0)
            reference_objects = reference_objects.copy()
            query_objects = query_objects.copy()
            reference_objects[:, 1:3] -= cen_ref
            query_objects[:, 1:3] -= cen_qry
            b_ref = np.abs(reference_objects[:, 1:3]).max(0)
            b_qry = np.abs(query_objects[:, 1:3]).max(0)
            half_x = max(b_ref[0], b_qry[0])
            half_y = max(b_ref[1], b_qry[1])
            if not cfg.disable_yaw_search:
                half_x = half_y = max(half_x, half_y)
            half_x *= cfg.dilation_factor
            half_y *= cfg.dilation_factor
            yaw_half, yaw_step = cfg.match_yaw_half_range, cfg.search_yaw_step_size_degrees
        else:
            half_x = cfg.match_x_half_range_intra
            half_y = cfg.match_y_half_range_intra
            yaw_half, yaw_step = cfg.match_yaw_half_range_intra, cfg.search_yaw_step_size_degrees

        yaws = _yaw_candidates(yaw_half, yaw_step, cfg.disable_yaw_search,
                               self.dims.n_yaw)
        import dataclasses as _dc
        cap = _bucket_capacity(max(len(reference_objects), len(query_objects)),
                               self.dims.max_objects)
        dims = (self.dims if cap == self.dims.max_objects
                else _dc.replace(self.dims, max_objects=cap))
        ref_p, ref_m = _pad_objects(reference_objects, dims.max_objects)
        qry_p, qry_m = _pad_objects(query_objects, dims.max_objects)
        rb, qb = _compact_label_bins(reference_objects[:, 0], query_objects[:, 0])
        rb_p = np.zeros((dims.max_objects,), np.int32)
        rb_p[:len(rb)] = rb
        qb_p = np.zeros((dims.max_objects,), np.int32)
        qb_p[:len(qb)] = qb
        packed = np.asarray(_slidematch_kernel(
            dims, ref_p, ref_m, qry_p, qry_m,
            jnp.asarray(rb_p), jnp.asarray(qb_p), jnp.asarray(yaws),
            jnp.float32(half_x), jnp.float32(half_y),
            jnp.float32(cfg.search_xy_step_size),
            jnp.float32(cfg.match_threshold_position),
            jnp.float32(cfg.match_threshold_dimension),
            cfg.ignore_dimension,
        ))                                   # ONE device->host transfer
        res_x, res_y, res_yaw, n_inliers = packed[0, :4]
        n_inliers = int(n_inliers)
        gate = (cfg.min_num_inliers_intra
                if (intra and cfg.min_num_inliers_intra)
                else cfg.min_num_inliers)
        if n_inliers < gate:
            return False, None, None, n_inliers, (0, np.inf)

        pair_mask = packed[1:, 0] > 0.5
        ref_pts = packed[1:, 1:5][pair_mask][:, 1:4]
        det_pts = packed[1:, 5:9][pair_mask][:, 1:4]
        if not intra:
            ref_pts = ref_pts.copy()
            det_pts = det_pts.copy()
            ref_pts[:, :2] += cen_ref
            det_pts[:, :2] += cen_qry

        if cfg.use_nonlinear_least_squares and len(ref_pts) >= 3:
            tf = solve_lsq(ref_pts, det_pts)
            # Iterative re-match + re-fit on EXACT object positions
            # (DEVIATION, documented in PARITY.md: the reference fits once
            # on the raster-TF pair set, place_recognition.cpp:632-695).
            # The raster TF can sit a yaw step off the true rotation — the
            # pair set then keeps only small-lever-arm (near-center)
            # matches and the single fit inherits a systematic rotation
            # error (measured 3-6 deg, 0.3-0.7 m at submap edges, enough to
            # make a 1e-3-sigma closure factor DEGRADE the trajectory).
            # 2-3 ICP rounds pull the far objects back into the pair set
            # and converge to the full-lever-arm alignment (~0.1 m / <1 deg
            # on the mission bench).
            tf, n_ref, fit_rms = _icp_refine(tf, orig_ref, orig_qry, cfg)
            n_inliers = max(n_inliers, n_ref)
            fit = (n_ref, fit_rms)
        else:
            fit = (n_inliers, float(cfg.match_threshold_position))
            tf_raw = _tf_from_xyyaw(float(res_x), float(res_y), float(res_yaw))
            if not intra:
                # revertCentroidShift (place_recognition.cpp:947-967)
                h1 = np.eye(4); h1[0, 3], h1[1, 3] = cen_ref
                h2 = np.eye(4); h2[0, 3], h2[1, 3] = -cen_qry
                tf = h1 @ tf_raw @ h2
            else:
                tf = tf_raw
        yaw = float(np.arctan2(tf[1, 0], tf[0, 0]))
        xyzyaw = [float(tf[0, 3]), float(tf[1, 3]), float(tf[2, 3]), yaw]
        return True, xyzyaw, tf, n_inliers, fit

    # -- entry points ------------------------------------------------------
    def find_intra_loop_closure(self, measurements: np.ndarray,
                                submap: np.ndarray, query_pose: np.ndarray,
                                candidate_pose: np.ndarray):
        """place_recognition.cpp:389-496. measurements are body-frame rows;
        returns (found, tfFromQuery2Candidate [4,4], fit=(n_pairs, rms))."""
        measurements = np.asarray(measurements, np.float32).reshape(-1, 7)
        if len(measurements) < 4 or len(submap) == 0:
            return False, None, (0, np.inf)
        # project measurements into map frame by the (drifted) query pose
        qmat = se3np.matrix(np.asarray(query_pose, np.float32))
        meas_map = measurements.copy()
        pos_h = np.concatenate(
            [measurements[:, 1:4], np.ones((len(measurements), 1), np.float32)],
            axis=1)
        meas_map[:, 1:4] = (qmat @ pos_h.T).T[:, :3].astype(np.float32)

        found, xyzyaw, _, _, fit = self.find_transformation(submap, meas_map,
                                                            intra=True)
        if not found:
            return False, None, (0, np.inf)
        if fit[0] == 0:
            # the exact re-fit found no supporting pairs: a closure factor
            # from it would carry zero information — reject instead of
            # adding a zero-weight factor that still counts as a success
            # (ADVICE r4 #2)
            return False, None, fit
        x, y, _, yaw = xyzyaw
        # drift correction compose; z forced 0 (place_recognition.cpp:470)
        lc_tf = _tf_from_xyyaw(x, y, yaw, z=0.0)
        q = se3np.matrix(np.asarray(query_pose, np.float32))
        c = se3np.matrix(np.asarray(candidate_pose, np.float32))
        # DELIBERATE DEVIATION from place_recognition.cpp:480-495, which
        # composes (c^-1 q) * lc_tf. findTransformation's output is a LEFT
        # map-frame correction (MatchMaps scores p_submap ~= lc_tf @
        # p_query-projected, :281-357), so the corrected query pose is
        # q* = lc_tf ∘ q and the closure relative is c^-1 ∘ lc_tf ∘ q.
        # The reference's right-composition only agrees when lc_tf commutes
        # with q; on a yaw-drifted loop it diverges (measured: closure
        # translation error grows 0.5 m -> 12 m over 8 closures with the
        # reference order vs 0.2-0.9 m with this one — see
        # tests/test_intra_loop_closure.py::test_closure_tf_accuracy).
        tf_q2c = np.linalg.inv(c) @ lc_tf @ q
        return True, tf_q2c, fit

    def find_inter_loop_closure(self, reference_map: np.ndarray,
                                query_map: np.ndarray):
        """place_recognition.cpp:498-538: (found, tfFromQueryToRef [4,4])."""
        if (len(reference_map) < self.cfg.min_num_map_objects_to_start
                or len(query_map) < self.cfg.min_num_map_objects_to_start):
            return False, None
        found, xyzyaw, _, _, _ = self.find_transformation(reference_map,
                                                          query_map,
                                                          intra=False)
        if not found:
            return False, None
        x, y, z, yaw = xyzyaw
        return True, _tf_from_xyyaw(x, y, yaw, z)
