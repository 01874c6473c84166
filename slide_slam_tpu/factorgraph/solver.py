"""Batched Gauss-Newton solver with matrix-free PCG.

Replaces GTSAM iSAM2 (graph.cpp:14-22, CHOLESKY / relinearizeSkip=1 /
threshold 0.1) with the TPU-native equivalent: every solve re-linearizes the
whole graph as a batch (vmapped forward-mode Jacobians over typed factor
arrays), then solves the normal equations with block-Jacobi-preconditioned
conjugate gradients where H*v is evaluated factor-wise with batched einsums
(gather -> small matmul -> scatter-add). Incremental behavior comes from
warm-starting each per-keyframe solve at the previous estimate.

Anchoring: the reference puts a sigma=1e-6 prior on each robot's first pose
(graphWrapper.cpp:51). A 1e12 information weight is hostile to f32 PCG, so
the anchor pose of each robot chain is frozen instead (its tangent rows are
projected out) — numerically equivalent, exactly gauge-fixing.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import jacobians, se3
from . import residuals as res
from .graph import GraphState

_Z6 = jnp.zeros(6)
_Z7 = jnp.zeros(7)
_Z9 = jnp.zeros(9)
_Z3 = jnp.zeros(3)


class Tangent(NamedTuple):
    pose: jnp.ndarray  # [RP, 6]
    cyl: jnp.ndarray   # [NC, 7]
    cub: jnp.ndarray   # [NK, 9]
    pt: jnp.ndarray    # [NU, 3]


def tangent_zeros(s: GraphState) -> Tangent:
    f = s.poses.dtype
    return Tangent(
        pose=jnp.zeros((s.poses.shape[0], 6), f),
        cyl=jnp.zeros((s.cyl_ray.shape[0], 7), f),
        cub=jnp.zeros((s.cub_pose.shape[0], 9), f),
        pt=jnp.zeros((s.pt_pos.shape[0], 3), f),
    )


def tree_dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(jax.tree_util.tree_leaves(a),
                                              jax.tree_util.tree_leaves(b)))


def tree_axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda u, v: alpha * u + v, x, y)


def tree_scale(alpha, x):
    return jax.tree_util.tree_map(lambda u: alpha * u, x)


# ---------------------------------------------------------------------------
# Per-family linearization — ANALYTIC Jacobians (tangent at zero).
#
# The autodiff (_ad) variants below are kept as the ground truth for
# tests/test_analytic_lin.py; the analytic forms compile ~100x faster on the
# TPU backend and run faster too.
# ---------------------------------------------------------------------------


def _between_lin(pose_i, pose_j, rel, sigma):
    """r = Log(rel^-1 (pi^-1 pj));  Jj = Jr^-1(r), Ji = -Jr^-1(r) Ad(pj^-1 pi)."""
    r_raw = se3.local(rel, se3.between(pose_i, pose_j))
    Jr_inv = jacobians.se3_right_jacobian_inv(r_raw)
    Jj = Jr_inv
    Ji = -Jr_inv @ jacobians.se3_adjoint(se3.between(pose_j, pose_i))
    w = 1.0 / sigma
    return r_raw * w, Ji * w[:, None], Jj * w[:, None]


def _cyl_lin(pose, lm7, meas, sigma):
    """Cylinder residual [lm_ray - R m_ray, lm_root - (R m_root + t),
    m_rad - lm_rad]; pose perturbation p <- p Exp([w, v])."""
    R = se3.quat_to_matrix(se3.quat(pose))
    t = se3.trans(pose)
    m_ray, m_root, m_rad = meas[0:3], meas[3:6], meas[6]
    r = jnp.concatenate([
        lm7[0:3] - R @ m_ray,
        lm7[3:6] - (R @ m_root + t),
        (m_rad - lm7[6])[None],
    ])
    Jp = jnp.zeros((7, 6), pose.dtype)
    Jp = Jp.at[0:3, 0:3].set(R @ se3.skew(m_ray))
    Jp = Jp.at[3:6, 0:3].set(R @ se3.skew(m_root))
    Jp = Jp.at[3:6, 3:6].set(-R)
    Jl = jnp.diag(jnp.array([1., 1., 1., 1., 1., 1., -1.], pose.dtype))
    w = 1.0 / sigma
    return r * w, Jp * w, Jl * w


def _cub_lin(pose, lm_pose, lm_scale, m_pose, m_scale, sigma):
    """e = Log(lm^-1 p m): Jp = Jr^-1(e) Ad(m^-1), Jlm = -Jl^-1(e)."""
    T = se3.compose(se3.inverse(lm_pose), se3.compose(pose, m_pose))
    e = se3.log(T)
    r = jnp.concatenate([e, m_scale - lm_scale])
    Jr_inv = jacobians.se3_right_jacobian_inv(e)
    Jp6 = Jr_inv @ jacobians.se3_adjoint(se3.inverse(m_pose))
    Jl6 = -jacobians.se3_left_jacobian_inv(e)
    Jp = jnp.zeros((9, 6), pose.dtype).at[0:6, :].set(Jp6)
    Jl = jnp.zeros((9, 9), pose.dtype)
    Jl = Jl.at[0:6, 0:6].set(Jl6)
    Jl = Jl.at[6:9, 6:9].set(-jnp.eye(3, dtype=pose.dtype))
    w = 1.0 / sigma
    return r * w, Jp * w[:, None], Jl * w[:, None]


def _pt_lin(pose, pt, bearing, rng, sigma):
    """p_b = R^T (pt - t); r = [p_b/|p_b| - bearing, |p_b| - rng]."""
    R = se3.quat_to_matrix(se3.quat(pose))
    RT = R.T
    p_b = RT @ (pt - se3.trans(pose))
    n = jnp.maximum(jnp.linalg.norm(p_b), 1e-9)
    d = p_b / n
    r = jnp.concatenate([d - bearing, (n - rng)[None]])
    ddir = (jnp.eye(3, dtype=pose.dtype) - jnp.outer(d, d)) / n
    dpb = jnp.concatenate([se3.skew(p_b), -jnp.eye(3, dtype=pose.dtype)],
                          axis=1)                       # [3, 6]
    Jp = jnp.concatenate([ddir @ dpb, (d @ dpb)[None, :]], axis=0)
    Jl = jnp.concatenate([ddir @ RT, (d @ RT)[None, :]], axis=0)
    w = 1.0 / sigma
    return r * w, Jp * w, Jl * w


# ---- autodiff ground truth (tests only) -----------------------------------


def _between_lin_ad(pose_i, pose_j, rel, sigma):
    def f(xi, xj):
        return res.between_residual(
            se3.retract(pose_i, xi), se3.retract(pose_j, xj), rel) / sigma
    r = f(_Z6, _Z6)
    Ji, Jj = jax.jacfwd(f, argnums=(0, 1))(_Z6, _Z6)
    return r, Ji, Jj


def _cyl_lin_ad(pose, lm7, meas, sigma):
    def f(xi, dl):
        return res.cylinder_residual(
            se3.retract(pose, xi), res.cylinder_retract(lm7, dl), meas) / sigma
    r = f(_Z6, _Z7)
    Jp, Jl = jax.jacfwd(f, argnums=(0, 1))(_Z6, _Z7)
    return r, Jp, Jl


def _cub_lin_ad(pose, lm_pose, lm_scale, m_pose, m_scale, sigma):
    def f(xi, dl):
        lp, ls = res.cuboid_retract(lm_pose, lm_scale, dl)
        return res.cuboid_residual(se3.retract(pose, xi), lp, ls, m_pose, m_scale) / sigma
    r = f(_Z6, _Z9)
    Jp, Jl = jax.jacfwd(f, argnums=(0, 1))(_Z6, _Z9)
    return r, Jp, Jl


def _pt_lin_ad(pose, pt, bearing, rng, sigma):
    def f(xi, dl):
        return res.bearing_range_residual(se3.retract(pose, xi), pt + dl, bearing, rng) / sigma
    r = f(_Z6, _Z3)
    Jp, Jl = jax.jacfwd(f, argnums=(0, 1))(_Z6, _Z3)
    return r, Jp, Jl


class Linearization(NamedTuple):
    # odometry chain (per pose slot, slot-1 -> slot)
    od_r: jnp.ndarray; od_Ji: jnp.ndarray; od_Jj: jnp.ndarray; od_prev: jnp.ndarray
    # generic between factors
    bf_r: jnp.ndarray; bf_Ji: jnp.ndarray; bf_Jj: jnp.ndarray
    # cylinder factors
    cf_r: jnp.ndarray; cf_Jp: jnp.ndarray; cf_Jl: jnp.ndarray
    # cuboid factors
    kf_r: jnp.ndarray; kf_Jp: jnp.ndarray; kf_Jl: jnp.ndarray
    # bearing-range factors
    uf_r: jnp.ndarray; uf_Jp: jnp.ndarray; uf_Jl: jnp.ndarray


def _masked(mask, *arrs):
    out = []
    for a in arrs:
        m = mask.reshape(mask.shape + (1,) * (a.ndim - 1))
        out.append(jnp.where(m, a, 0.0))
    return out


def linearize(s: GraphState, cyl_sigma, bearing_sigma) -> Linearization:
    RP = s.poses.shape[0]
    prev_slot = jnp.maximum(jnp.arange(RP) - 1, 0)

    od_r, od_Ji, od_Jj = jax.vmap(_between_lin)(
        s.poses[prev_slot], s.poses, s.odom_rel, s.odom_sigma)
    od_r, od_Ji, od_Jj = _masked(s.odom_valid(), od_r, od_Ji, od_Jj)

    bf_r, bf_Ji, bf_Jj = jax.vmap(_between_lin)(
        s.poses[s.bf_i], s.poses[s.bf_j], s.bf_rel, s.bf_sigma)
    bf_r, bf_Ji, bf_Jj = _masked(s.bf_valid(), bf_r, bf_Ji, bf_Jj)

    lm7 = s.cyl_lm7()
    cf_r, cf_Jp, cf_Jl = jax.vmap(_cyl_lin, in_axes=(0, 0, 0, None))(
        s.poses[s.cf_pose], lm7[s.cf_lm], s.cf_meas, cyl_sigma)
    cf_r, cf_Jp, cf_Jl = _masked(s.cf_valid(), cf_r, cf_Jp, cf_Jl)

    kf_r, kf_Jp, kf_Jl = jax.vmap(_cub_lin)(
        s.poses[s.kf_pose], s.cub_pose[s.kf_lm], s.cub_scale[s.kf_lm],
        s.kf_meas_pose, s.kf_meas_scale, s.kf_sigma)
    kf_r, kf_Jp, kf_Jl = _masked(s.kf_valid(), kf_r, kf_Jp, kf_Jl)

    uf_r, uf_Jp, uf_Jl = jax.vmap(_pt_lin, in_axes=(0, 0, 0, 0, None))(
        s.poses[s.uf_pose], s.pt_pos[s.uf_lm], s.uf_bearing, s.uf_range,
        bearing_sigma)
    uf_r, uf_Jp, uf_Jl = _masked(s.uf_valid(), uf_r, uf_Jp, uf_Jl)

    return Linearization(od_r, od_Ji, od_Jj, prev_slot,
                         bf_r, bf_Ji, bf_Jj,
                         cf_r, cf_Jp, cf_Jl,
                         kf_r, kf_Jp, kf_Jl,
                         uf_r, uf_Jp, uf_Jl)


def _frozen_pose_mask(s: GraphState) -> jnp.ndarray:
    """[RP] True where the pose tangent must stay zero (chain anchors)."""
    P = s.poses_per_robot
    idx = jnp.arange(s.poses.shape[0]) % P
    rid = jnp.arange(s.poses.shape[0]) // P
    return (idx == 0) & s.prior_valid[rid]


def _project(s: GraphState, v: Tangent) -> Tangent:
    frozen = _frozen_pose_mask(s)
    return v._replace(pose=jnp.where(frozen[:, None], 0.0, v.pose))


def _maybe_psum(x, axis_name):
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def gradient(s: GraphState, lin: Linearization, axis_name=None) -> Tangent:
    """g = J^T r (whitened). With `axis_name`, factor arrays are sharded
    across devices and the result is psum-reduced (distributed BA)."""
    g = tangent_zeros(s)
    gp = g.pose
    gp = gp.at[lin.od_prev].add(jnp.einsum("fij,fi->fj", lin.od_Ji, lin.od_r))
    gp = gp.at[jnp.arange(gp.shape[0])].add(
        jnp.einsum("fij,fi->fj", lin.od_Jj, lin.od_r))
    gp = gp.at[s.bf_i].add(jnp.einsum("fij,fi->fj", lin.bf_Ji, lin.bf_r))
    gp = gp.at[s.bf_j].add(jnp.einsum("fij,fi->fj", lin.bf_Jj, lin.bf_r))
    gp = gp.at[s.cf_pose].add(jnp.einsum("fij,fi->fj", lin.cf_Jp, lin.cf_r))
    gp = gp.at[s.kf_pose].add(jnp.einsum("fij,fi->fj", lin.kf_Jp, lin.kf_r))
    gp = gp.at[s.uf_pose].add(jnp.einsum("fij,fi->fj", lin.uf_Jp, lin.uf_r))
    gc = g.cyl.at[s.cf_lm].add(jnp.einsum("fij,fi->fj", lin.cf_Jl, lin.cf_r))
    gk = g.cub.at[s.kf_lm].add(jnp.einsum("fij,fi->fj", lin.kf_Jl, lin.kf_r))
    gu = g.pt.at[s.uf_lm].add(jnp.einsum("fij,fi->fj", lin.uf_Jl, lin.uf_r))
    return _project(s, _maybe_psum(Tangent(gp, gc, gk, gu), axis_name))


def hessian_vec(s: GraphState, lin: Linearization, v: Tangent,
                lam: jnp.ndarray, diag: Tangent, axis_name=None) -> Tangent:
    """(J^T J + lam * diag) v, factor-wise."""
    v = _project(s, v)
    idx = jnp.arange(s.poses.shape[0])
    # J v per family
    od_Jv = (jnp.einsum("fij,fj->fi", lin.od_Ji, v.pose[lin.od_prev])
             + jnp.einsum("fij,fj->fi", lin.od_Jj, v.pose[idx]))
    bf_Jv = (jnp.einsum("fij,fj->fi", lin.bf_Ji, v.pose[s.bf_i])
             + jnp.einsum("fij,fj->fi", lin.bf_Jj, v.pose[s.bf_j]))
    cf_Jv = (jnp.einsum("fij,fj->fi", lin.cf_Jp, v.pose[s.cf_pose])
             + jnp.einsum("fij,fj->fi", lin.cf_Jl, v.cyl[s.cf_lm]))
    kf_Jv = (jnp.einsum("fij,fj->fi", lin.kf_Jp, v.pose[s.kf_pose])
             + jnp.einsum("fij,fj->fi", lin.kf_Jl, v.cub[s.kf_lm]))
    uf_Jv = (jnp.einsum("fij,fj->fi", lin.uf_Jp, v.pose[s.uf_pose])
             + jnp.einsum("fij,fj->fi", lin.uf_Jl, v.pt[s.uf_lm]))
    # J^T (J v)
    out = tangent_zeros(s)
    op = out.pose
    op = op.at[lin.od_prev].add(jnp.einsum("fij,fi->fj", lin.od_Ji, od_Jv))
    op = op.at[idx].add(jnp.einsum("fij,fi->fj", lin.od_Jj, od_Jv))
    op = op.at[s.bf_i].add(jnp.einsum("fij,fi->fj", lin.bf_Ji, bf_Jv))
    op = op.at[s.bf_j].add(jnp.einsum("fij,fi->fj", lin.bf_Jj, bf_Jv))
    op = op.at[s.cf_pose].add(jnp.einsum("fij,fi->fj", lin.cf_Jp, cf_Jv))
    op = op.at[s.kf_pose].add(jnp.einsum("fij,fi->fj", lin.kf_Jp, kf_Jv))
    op = op.at[s.uf_pose].add(jnp.einsum("fij,fi->fj", lin.uf_Jp, uf_Jv))
    oc = out.cyl.at[s.cf_lm].add(jnp.einsum("fij,fi->fj", lin.cf_Jl, cf_Jv))
    ok = out.cub.at[s.kf_lm].add(jnp.einsum("fij,fi->fj", lin.kf_Jl, kf_Jv))
    ou = out.pt.at[s.uf_lm].add(jnp.einsum("fij,fi->fj", lin.uf_Jl, uf_Jv))
    hv = _maybe_psum(Tangent(op, oc, ok, ou), axis_name)
    # damping uses the ALREADY-psum'd diag, applied identically on every
    # device so the replicated PCG state stays in lockstep
    hv = jax.tree_util.tree_map(lambda h, vv, d: h + lam * d * vv, hv, v, diag)
    return _project(s, hv)


def diagonal(s: GraphState, lin: Linearization, axis_name=None) -> Tangent:
    """diag(J^T J) as a Tangent (used for LM damping + Jacobi precond)."""
    d = tangent_zeros(s)
    idx = jnp.arange(s.poses.shape[0])
    dp = d.pose
    dp = dp.at[lin.od_prev].add(jnp.einsum("fij,fij->fj", lin.od_Ji, lin.od_Ji))
    dp = dp.at[idx].add(jnp.einsum("fij,fij->fj", lin.od_Jj, lin.od_Jj))
    dp = dp.at[s.bf_i].add(jnp.einsum("fij,fij->fj", lin.bf_Ji, lin.bf_Ji))
    dp = dp.at[s.bf_j].add(jnp.einsum("fij,fij->fj", lin.bf_Jj, lin.bf_Jj))
    dp = dp.at[s.cf_pose].add(jnp.einsum("fij,fij->fj", lin.cf_Jp, lin.cf_Jp))
    dp = dp.at[s.kf_pose].add(jnp.einsum("fij,fij->fj", lin.kf_Jp, lin.kf_Jp))
    dp = dp.at[s.uf_pose].add(jnp.einsum("fij,fij->fj", lin.uf_Jp, lin.uf_Jp))
    dc = d.cyl.at[s.cf_lm].add(jnp.einsum("fij,fij->fj", lin.cf_Jl, lin.cf_Jl))
    dk = d.cub.at[s.kf_lm].add(jnp.einsum("fij,fij->fj", lin.kf_Jl, lin.kf_Jl))
    du = d.pt.at[s.uf_lm].add(jnp.einsum("fij,fij->fj", lin.uf_Jl, lin.uf_Jl))
    return _maybe_psum(Tangent(dp, dc, dk, du), axis_name)


def block_diagonal(s: GraphState, lin: Linearization, axis_name=None):
    """Per-variable dense blocks of J^T J (block-Jacobi preconditioner).

    Returns a Tangent-shaped tuple of [N, d, d] blocks. Much stronger than
    the scalar diagonal for the rotation-translation coupling of pose chains
    (iSAM2's elimination handles this implicitly; block-Jacobi recovers most
    of it for PCG)."""
    RP = s.poses.shape[0]
    idx = jnp.arange(RP)
    f = s.poses.dtype
    bp = jnp.zeros((RP, 6, 6), f)
    bp = bp.at[lin.od_prev].add(jnp.einsum("fki,fkj->fij", lin.od_Ji, lin.od_Ji))
    bp = bp.at[idx].add(jnp.einsum("fki,fkj->fij", lin.od_Jj, lin.od_Jj))
    bp = bp.at[s.bf_i].add(jnp.einsum("fki,fkj->fij", lin.bf_Ji, lin.bf_Ji))
    bp = bp.at[s.bf_j].add(jnp.einsum("fki,fkj->fij", lin.bf_Jj, lin.bf_Jj))
    bp = bp.at[s.cf_pose].add(jnp.einsum("fki,fkj->fij", lin.cf_Jp, lin.cf_Jp))
    bp = bp.at[s.kf_pose].add(jnp.einsum("fki,fkj->fij", lin.kf_Jp, lin.kf_Jp))
    bp = bp.at[s.uf_pose].add(jnp.einsum("fki,fkj->fij", lin.uf_Jp, lin.uf_Jp))
    bc = jnp.zeros((s.cyl_ray.shape[0], 7, 7), f)
    bc = bc.at[s.cf_lm].add(jnp.einsum("fki,fkj->fij", lin.cf_Jl, lin.cf_Jl))
    bk = jnp.zeros((s.cub_pose.shape[0], 9, 9), f)
    bk = bk.at[s.kf_lm].add(jnp.einsum("fki,fkj->fij", lin.kf_Jl, lin.kf_Jl))
    bu = jnp.zeros((s.pt_pos.shape[0], 3, 3), f)
    bu = bu.at[s.uf_lm].add(jnp.einsum("fki,fkj->fij", lin.uf_Jl, lin.uf_Jl))
    blocks = (bp, bc, bk, bu)
    if axis_name is not None:
        blocks = jax.lax.psum(blocks, axis_name)
    return blocks


def _block_precond_inverses(blocks, lam):
    """Invert (B + lam*diag(B) + eps I) per block."""
    def inv(b):
        d = b.shape[-1]
        eye = jnp.eye(d, dtype=b.dtype)
        diag = jnp.einsum("nii->ni", b)
        damped = b + lam * diag[..., None] * eye + 1e-6 * eye
        return jnp.linalg.inv(damped)
    return tuple(inv(b) for b in blocks)


def _block_apply(inv_blocks, r: Tangent) -> Tangent:
    bp, bc, bk, bu = inv_blocks
    return Tangent(
        pose=jnp.einsum("nij,nj->ni", bp, r.pose),
        cyl=jnp.einsum("nij,nj->ni", bc, r.cyl),
        cub=jnp.einsum("nij,nj->ni", bk, r.cub),
        pt=jnp.einsum("nij,nj->ni", bu, r.pt),
    )


def cost(s: GraphState, cyl_sigma, bearing_sigma, axis_name=None) -> jnp.ndarray:
    """Residual-only cost — no Jacobians (cheap; used by line search)."""
    RP = s.poses.shape[0]
    prev_slot = jnp.maximum(jnp.arange(RP) - 1, 0)
    od_r = jax.vmap(lambda pi, pj, rel, sig:
                    res.between_residual(pi, pj, rel) / sig)(
        s.poses[prev_slot], s.poses, s.odom_rel, s.odom_sigma)
    od_r = jnp.where(s.odom_valid()[:, None], od_r, 0.0)
    bf_r = jax.vmap(lambda pi, pj, rel, sig:
                    res.between_residual(pi, pj, rel) / sig)(
        s.poses[s.bf_i], s.poses[s.bf_j], s.bf_rel, s.bf_sigma)
    bf_r = jnp.where(s.bf_valid()[:, None], bf_r, 0.0)
    lm7 = s.cyl_lm7()
    cf_r = jax.vmap(lambda p, l, m: res.cylinder_residual(p, l, m) / cyl_sigma)(
        s.poses[s.cf_pose], lm7[s.cf_lm], s.cf_meas)
    cf_r = jnp.where(s.cf_valid()[:, None], cf_r, 0.0)
    kf_r = jax.vmap(lambda p, lp, ls, mp, ms, sig:
                    res.cuboid_residual(p, lp, ls, mp, ms) / sig)(
        s.poses[s.kf_pose], s.cub_pose[s.kf_lm], s.cub_scale[s.kf_lm],
        s.kf_meas_pose, s.kf_meas_scale, s.kf_sigma)
    kf_r = jnp.where(s.kf_valid()[:, None], kf_r, 0.0)
    uf_r = jax.vmap(lambda p, pt, b, rg:
                    res.bearing_range_residual(p, pt, b, rg) / bearing_sigma)(
        s.poses[s.uf_pose], s.pt_pos[s.uf_lm], s.uf_bearing, s.uf_range)
    uf_r = jnp.where(s.uf_valid()[:, None], uf_r, 0.0)
    return _maybe_psum(
        0.5 * (jnp.sum(od_r ** 2) + jnp.sum(bf_r ** 2)
               + jnp.sum(cf_r ** 2) + jnp.sum(kf_r ** 2)
               + jnp.sum(uf_r ** 2)), axis_name)


def retract_state(s: GraphState, dx: Tangent) -> GraphState:
    dx = _project(s, dx)
    new_poses = se3.retract(s.poses, dx.pose)
    pv = s.pose_valid()[:, None]
    poses = jnp.where(pv, new_poses, s.poses)
    cyl7 = s.cyl_lm7() + jnp.where(s.cyl_valid()[:, None], dx.cyl, 0.0)
    cub_pose = jnp.where(s.cub_valid()[:, None],
                         se3.retract(s.cub_pose, dx.cub[:, :6]), s.cub_pose)
    cub_scale = s.cub_scale + jnp.where(s.cub_valid()[:, None], dx.cub[:, 6:9], 0.0)
    pt = s.pt_pos + jnp.where(s.pt_valid()[:, None], dx.pt, 0.0)
    return s._replace(
        poses=poses,
        cyl_ray=cyl7[:, 0:3], cyl_root=cyl7[:, 3:6], cyl_radius=cyl7[:, 6],
        cub_pose=cub_pose, cub_scale=cub_scale,
        pt_pos=pt,
        keypose_xyz=jnp.where(pv, se3.trans(poses), s.keypose_xyz),
    )


# ---------------------------------------------------------------------------
# PCG + damped Gauss-Newton
# ---------------------------------------------------------------------------


def pcg(hv_fn, b: Tangent, precond_apply, max_iters, tol) -> Tangent:
    """Solve H x = b; `precond_apply(r) -> z` applies M^-1.

    max_iters/tol may be traced scalars — the same compiled solver then
    serves different iteration budgets (cheap warm-started incremental
    solves vs thorough post-closure solves)."""
    x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
    r0 = b
    z0 = precond_apply(r0)
    p0 = z0
    rz0 = tree_dot(r0, z0)

    def body(carry):
        k, x, r, z, p, rz = carry
        hp = hv_fn(p)
        php = tree_dot(p, hp)
        alpha = rz / jnp.maximum(php, 1e-30)
        x = tree_axpy(alpha, p, x)
        r = tree_axpy(-alpha, hp, r)
        z = precond_apply(r)
        rz_new = tree_dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = tree_axpy(beta, p, z)
        return k + 1, x, r, z, p, rz_new

    def cond(carry):
        k, x, r, z, p, rz = carry
        return (k < max_iters) & (rz > tol * tol * jnp.maximum(rz0, 1e-30))

    _, x, *_ = jax.lax.while_loop(cond, body, (0, x0, r0, z0, p0, rz0))
    return x


def solve(s: GraphState, *, cyl_sigma: float, bearing_sigma: float,
          outer_iters, pcg_iters, pcg_tol=1e-6,
          lam: float = 1e-6, rel_tol: float = 1e-6,
          axis_name=None, block_precond: bool = False) -> GraphState:
    """Damped Gauss-Newton with backtracking step scaling.

    The outer loop is a `while_loop` with a relative-improvement stop, so ONE
    compiled body serves both warm-started incremental solves (converge in
    1-2 iterations) and full post-closure solves; `outer_iters` caps it."""

    def one_iter(carry):
        s, it, _ = carry
        lin = linearize(s, cyl_sigma, bearing_sigma)
        g = gradient(s, lin, axis_name)
        diag = diagonal(s, lin, axis_name)
        if block_precond:
            # stronger preconditioner; batched jnp.linalg.inv compiles
            # slowly on some TPU toolchains, so this is opt-in
            blocks = block_diagonal(s, lin, axis_name)
            inv_blocks = _block_precond_inverses(blocks, lam)
            precond_apply = lambda r: _block_apply(inv_blocks, r)
        else:
            scalar = jax.tree_util.tree_map(
                lambda d: 1.0 / (d * (1.0 + lam) + 1e-8), diag)
            precond_apply = lambda r: jax.tree_util.tree_map(
                lambda rr, m: rr * m, r, scalar)
        hv = functools.partial(hessian_vec, s, lin, lam=lam, diag=diag,
                               axis_name=axis_name)
        dx = pcg(lambda v: hv(v), tree_scale(-1.0, g), precond_apply,
                 pcg_iters, pcg_tol)
        c0 = _maybe_psum(
            0.5 * (jnp.sum(lin.od_r ** 2) + jnp.sum(lin.bf_r ** 2)
                   + jnp.sum(lin.cf_r ** 2) + jnp.sum(lin.kf_r ** 2)
                   + jnp.sum(lin.uf_r ** 2)), axis_name)

        def try_scale(alpha):
            trial = retract_state(s, tree_scale(alpha, dx))
            return cost(trial, cyl_sigma, bearing_sigma, axis_name)

        scales = jnp.array([1.0, 0.5, 0.25], dtype=s.poses.dtype)
        costs = jnp.stack([try_scale(a) for a in (1.0, 0.5, 0.25)])
        best = jnp.argmin(costs)
        accept = costs[best] < c0
        alpha = jnp.where(accept, scales[best], 0.0)
        improved = (c0 - costs[best]) > rel_tol * (c0 + 1e-9)
        done = ~(accept & improved)
        return retract_state(s, tree_scale(alpha, dx)), it + 1, done

    def cond(carry):
        _, it, done = carry
        return (it < outer_iters) & ~done

    s, _, _ = jax.lax.while_loop(cond, one_iter,
                                 (s, jnp.int32(0), jnp.bool_(False)))
    return s
