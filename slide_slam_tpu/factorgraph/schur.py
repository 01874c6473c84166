"""Schur-complement landmark elimination for the semantic factor graph.

The blueprint's stage-4 design slot (SURVEY §7; the reference's iSAM2
performs variable elimination, graph.cpp:260-272): landmarks (cylinders 7,
cuboids 9, points 3 — padded to 9) appear only in single-landmark factors,
so Hll is block-diagonal and the Gauss-Newton normal equations

    [Hpp Hpl] [dp]   [-gp]
    [Hlp Hll] [dl] = [-gl]

reduce to (Hpp - Hpl Hll^-1 Hlp) dp = -gp + Hpl Hll^-1 gl followed by the
closed-form back-substitution dl = Hll^-1 (-gl - Hlp dp). PCG then runs on
the ~10x smaller, better-conditioned pose-only system; every reduction in
the loop is a one-hot MXU matmul (see solver.ReducePlan — no scatter, no
sort), the odometry chain reduces by a shift (no indexing at all), and the
handful of between factors ride a small one-hot.

TPU cost at mission shape (26624 landmark factors, 768 pose slots,
768 landmark slots): the in-loop streams are the [F, 6, 9] coupling blocks
plus two [F, RP]/[F, NL] bf16 incidence matrices (~50 MB/iteration at the
HBM roofline) — ~3x less than the unified-variable PCG, with ~2x fewer
iterations needed.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from . import solver
from .graph import GraphState


def _bf16x2_matmul(onehot_t, y):
    """onehot_t [N, F] bf16 @ y [F, D] f32 with a bf16x3 payload split:
    f32-grade accuracy, MXU-grade speed (see solver._bf16x3). Used ONLY
    inside the PCG matvec loop (s_matvec) where the reduction runs every
    Krylov iteration."""
    packed = jnp.concatenate(solver._bf16x3(y), axis=1)
    out = jnp.einsum("nf,fd->nd", onehot_t, packed,
                     preferred_element_type=jnp.float32)
    D = y.shape[1]
    return out[:, :D] + out[:, D:2 * D] + out[:, 2 * D:]


def _scatter_rows(idx, y, n):
    """EXACT f32 segment reduction: rows of y [F, D...] summed into
    [n, D...] by scatter-add. Once-per-outer-iteration reductions (the
    gradient, Hll, Dp, the Schur RHS, the back-substitution) use this, NOT
    the bf16x3 one-hot matmul: the ~1e-5 relative matvec noise is harmless
    inside PCG (it perturbs the Krylov path, not the fixed point) but a
    biased gradient/Hessian MOVES the fixed point — r4 built everything on
    the fast path and the two budgeted solvers disagreed by 0.29 m ATE on
    a 128-pose graph (ADVICE r4 #1). This mirrors solver.solve, which
    keeps its once-per-iteration gradient on the exact plan=None path."""
    return jnp.zeros((n,) + y.shape[1:], y.dtype).at[idx].add(y)


class SchurOperands(NamedTuple):
    """Everything the reduced-system PCG loop needs, built once per outer
    GN iteration."""
    # landmark-factor blocks
    A: jnp.ndarray            # [F, 6, 9]  Jp^T Jl coupling per factor
    Jp: jnp.ndarray           # [F, 9, 6]
    Jl: jnp.ndarray           # [F, 9, 9]
    pidx: jnp.ndarray         # [F] pose slot per factor
    lidx: jnp.ndarray         # [F] unified landmark index per factor
    P_t: jnp.ndarray          # [RP, F] bf16 one-hot by pose
    L_t: jnp.ndarray          # [NL, F] bf16 one-hot by landmark
    Hll_inv: jnp.ndarray      # [NL, 9, 9] damped block inverses (0 if inactive)
    # odometry chain
    od_Ji: jnp.ndarray        # [RP, 6, 6]
    od_Jj: jnp.ndarray        # [RP, 6, 6]
    # between factors
    bf_Ji: jnp.ndarray        # [BF, 6, 6]
    bf_Jj: jnp.ndarray        # [BF, 6, 6]
    bf_i: jnp.ndarray         # [BF]
    bf_j: jnp.ndarray         # [BF]
    B_t: jnp.ndarray          # [RP, 2*BF] bf16 one-hot for between reduction
    # pose-space pieces
    Dp: jnp.ndarray           # [RP, 6, 6] Sum Jp^T Jp per pose (landmark factors)
    diag_p: jnp.ndarray       # [RP, 6] diag(Hpp) for damping
    prec_inv: jnp.ndarray     # [RP, 6, 6] block-Jacobi inverse of S diag
    g_p: jnp.ndarray          # [RP, 6]
    g_l: jnp.ndarray          # [NL, 9]
    frozen: jnp.ndarray       # [RP] anchor mask
    lm_active: jnp.ndarray    # [NL] landmark-slot validity


def _lm_factor_pack(s: GraphState, lin: solver.Linearization):
    """Concatenate cylinder/cuboid/bearing-range factors into the unified
    landmark-factor arrays (residual dim padded to 9; landmark tangent dims
    cyl 7 / cub 9 / pt 3 padded with zero columns)."""
    NC = s.cyl_ray.shape[0]
    NK = s.cub_pose.shape[0]

    def pad(r, Jp, Jl, rdim, ldim):
        r9 = jnp.pad(r, ((0, 0), (0, 9 - rdim)))
        Jp9 = jnp.pad(Jp, ((0, 0), (0, 9 - rdim), (0, 0)))
        Jl9 = jnp.pad(Jl, ((0, 0), (0, 9 - rdim), (0, 9 - ldim)))
        return r9, Jp9, Jl9

    cr, cp, cl = pad(lin.cf_r, lin.cf_Jp, lin.cf_Jl, 7, 7)
    kr, kp, kl = lin.kf_r, lin.kf_Jp, lin.kf_Jl
    ur, up, ul = pad(lin.uf_r, lin.uf_Jp, lin.uf_Jl, 4, 3)
    r = jnp.concatenate([cr, kr, ur], axis=0)
    Jp = jnp.concatenate([cp, kp, up], axis=0)
    Jl = jnp.concatenate([cl, kl, ul], axis=0)
    pidx = jnp.concatenate([s.cf_pose, s.kf_pose, s.uf_pose]).astype(jnp.int32)
    lidx = jnp.concatenate([s.cf_lm, NC + s.kf_lm,
                            NC + NK + s.uf_lm]).astype(jnp.int32)
    return r, Jp, Jl, pidx, lidx


def _maybe_psum(x, axis_name):
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def build_operands(s: GraphState, cyl_sigma, bearing_sigma,
                   lam, block_precond: bool = True,
                   axis_name=None, exact_curvature: bool = False
                   ) -> SchurOperands:
    """axis_name: when set, the state is LANDMARK-SHARDED over that mesh
    axis (parallel/landmark_sharded.py): poses/odometry replicated (odom
    sigmas pre-inflated by sqrt(D) so psum counts the chain once), between
    factors resident on shard 0 only, landmark arrays + their factors
    local. Pose-side quantities whose value must be GLOBAL on every shard
    (the damping diagonal, the block preconditioner) are psummed here;
    per-factor operands stay local and are psummed at the aggregation
    points (s_matvec / solve_reduced)."""
    RP = s.poses.shape[0]
    NC = s.cyl_ray.shape[0]
    NK = s.cub_pose.shape[0]
    NU = s.pt_pos.shape[0]
    NL = NC + NK + NU

    lin = solver.linearize(s, cyl_sigma, bearing_sigma)
    r, Jp, Jl, pidx, lidx = _lm_factor_pack(s, lin)

    P_t = (pidx[None, :] == jnp.arange(RP, dtype=jnp.int32)[:, None]
           ).astype(jnp.bfloat16)
    L_t = (lidx[None, :] == jnp.arange(NL, dtype=jnp.int32)[:, None]
           ).astype(jnp.bfloat16)

    # Precision split (r5): GRADIENT-side reductions (g_p, g_l, the Schur
    # RHS, back-substitution) are EXACT f32 scatters — they define the
    # fixed point (Gauss-Newton converges to gradient == 0 regardless of
    # curvature error). CURVATURE-side block reductions (Dp, Hll, the
    # preconditioner) keep the one-hot bf16x3 matmul on the per-keyframe
    # incremental path — their ~1e-7 relative error only perturbs the
    # convergence PATH, and their [F, 36]/[F, 81] payloads are the
    # expensive reductions (scatter-add of the full block set measured
    # +70% on solve_ms_mission: 6.95 -> 11.8 ms). THOROUGH solves
    # (solve_full / the periodic re-converge) pass exact_curvature=True:
    # a single budgeted GN step with approximate curvature tracks the
    # optimum a few cm looser (bench r5: incremental_vs_converged 0.06 ->
    # 0.18 with fast curvature everywhere), and the periodic exact solve
    # pulls that drift back at negligible amortized cost.
    A = jnp.einsum("fri,frj->fij", Jp, Jl)               # [F, 6, 9]
    if exact_curvature:
        Dp = _scatter_rows(pidx, jnp.einsum("fri,frj->fij", Jp, Jp), RP)
        Hll_blocks = _scatter_rows(lidx,
                                   jnp.einsum("fri,frj->fij", Jl, Jl), NL)
    else:
        Dp = _bf16x2_matmul(P_t, jnp.einsum("fri,frj->fij", Jp, Jp)
                            .reshape(-1, 36)).reshape(RP, 6, 6)
        Hll_blocks = _bf16x2_matmul(L_t, jnp.einsum("fri,frj->fij", Jl, Jl)
                                    .reshape(-1, 81)).reshape(NL, 9, 9)
    lm_active = jnp.concatenate([s.cyl_valid(), s.cub_valid(), s.pt_valid()])
    eye9 = jnp.eye(9, dtype=r.dtype)
    hll_diag = jnp.einsum("nii->ni", Hll_blocks)
    # absolute ridge 1e-4: a weakly-observed cuboid/point block whose
    # eigenvalues sit at the bf16x2-reduction noise level (~1e-5) would
    # otherwise invert to a huge, wrong inverse and poison the (unguarded)
    # incremental step; the ridge only damps the STEP, not the fixed point
    damped = (Hll_blocks + lam * hll_diag[..., None] * eye9 + 1e-4 * eye9)
    # inactive landmark slots get the identity (their z is reduction noise;
    # the inverse is masked to zero below so they can't contaminate poses)
    damped = jnp.where(lm_active[:, None, None], damped, eye9)
    # family-structured inversion: a cylinder factor's Jl is diagonal
    # (solver._cyl_lin: diag(1..1,-1)/sigma), so cylinder Hll blocks are
    # EXACTLY diagonal — reciprocal, not matrix inverse. Only the NK + NU
    # cuboid/point blocks (dense 9x9) go through batched linalg.inv; at
    # mission shape that cuts the inverted-block count 3x and sidesteps
    # most of the batched-inv cost/compile on TPU.
    cyl_recip = 1.0 / jnp.maximum(
        jnp.einsum("nii->ni", damped[:NC]), 1e-8)
    cyl_inv = cyl_recip[:, :, None] * eye9
    rest_inv = jnp.linalg.inv(damped[NC:])
    Hll_inv = jnp.where(lm_active[:, None, None],
                        jnp.concatenate([cyl_inv, rest_inv], axis=0), 0.0)

    g_p_lf = _scatter_rows(pidx, jnp.einsum("fri,fr->fi", Jp, r), RP)
    g_l = _scatter_rows(lidx, jnp.einsum("fri,fr->fi", Jl, r), NL)

    # odometry chain contributions to g_p: factor f couples (f-1, f)
    od_gi = jnp.einsum("fri,fr->fi", lin.od_Ji, lin.od_r)
    od_gj = jnp.einsum("fri,fr->fi", lin.od_Jj, lin.od_r)
    g_p = g_p_lf + od_gj + _shift_to_prev(od_gi)

    # between factors: tiny one-hot over both sides
    BF = s.bf_i.shape[0]
    bidx = jnp.concatenate([s.bf_i, s.bf_j]).astype(jnp.int32)
    B_t = (bidx[None, :] == jnp.arange(RP, dtype=jnp.int32)[:, None]
           ).astype(jnp.bfloat16)
    bf_g = jnp.concatenate([
        jnp.einsum("fri,fr->fi", lin.bf_Ji, lin.bf_r),
        jnp.einsum("fri,fr->fi", lin.bf_Jj, lin.bf_r)], axis=0)
    g_p = g_p + _scatter_rows(bidx, bf_g, RP)

    # damping diagonal of Hpp (od_Ji's diagonal belongs to slot f-1)
    diag_bf = jnp.concatenate([
        jnp.einsum("fri,fri->fi", lin.bf_Ji, lin.bf_Ji),
        jnp.einsum("fri,fri->fi", lin.bf_Jj, lin.bf_Jj)], axis=0)
    diag_p = _maybe_psum(
        jnp.einsum("nii->ni", Dp)
        + jnp.einsum("fri,fri->fi", lin.od_Jj, lin.od_Jj)
        + _shift_to_prev(jnp.einsum("fri,fri->fi", lin.od_Ji, lin.od_Ji))
        + _scatter_rows(bidx, diag_bf, RP), axis_name)

    if block_precond:
        # block-Jacobi preconditioner on S's diagonal blocks:
        # Dp + odom blocks + lam*diag - A Hll^-1 A^T aggregated per pose
        od_bi = jnp.einsum("fri,frj->fij", lin.od_Ji, lin.od_Ji)
        od_bj = jnp.einsum("fri,frj->fij", lin.od_Jj, lin.od_Jj)
        corr_f = jnp.einsum("fij,fjk,flk->fil", A, Hll_inv[lidx], A)
        corr_p = _bf16x2_matmul(P_t, corr_f.reshape(-1, 36)).reshape(RP, 6, 6)
        bf_blocks = jnp.concatenate([
            jnp.einsum("fri,frj->fij", lin.bf_Ji, lin.bf_Ji),
            jnp.einsum("fri,frj->fij", lin.bf_Jj, lin.bf_Jj)], axis=0)
        bf_p = _bf16x2_matmul(B_t, bf_blocks.reshape(-1, 36)).reshape(RP, 6, 6)
        eye6 = jnp.eye(6, dtype=r.dtype)
        S_parts = _maybe_psum(
            Dp + od_bj + _shift_to_prev_blocks(od_bi) + bf_p - corr_p,
            axis_name)
        S_diag = (S_parts + lam * diag_p[:, :, None] * eye6 + 1e-6 * eye6)
        prec_inv = jnp.linalg.inv(S_diag)
    else:
        # scalar Jacobi on diag(Hpp): skips the whole S_diag assembly
        # (corr triple-einsum + batched 6x6 inverse, ~3 ms of the
        # mission-shape build) at the price of a few extra PCG iterations
        prec_inv = jnp.zeros((0, 6, 6), r.dtype)

    frozen = solver._frozen_pose_mask(s)
    return SchurOperands(A, Jp, Jl, pidx, lidx, P_t, L_t, Hll_inv,
                         lin.od_Ji, lin.od_Jj,
                         lin.bf_Ji, lin.bf_Jj, s.bf_i.astype(jnp.int32),
                         s.bf_j.astype(jnp.int32), B_t,
                         Dp, diag_p, prec_inv, g_p, g_l, frozen, lm_active)


def _shift_to_prev(y):
    """Route per-factor rows to slot f-1 (odom factor f couples f-1 -> f);
    row 0's contribution (the masked self-factor) falls off the end."""
    return jnp.concatenate([y[1:], jnp.zeros_like(y[:1])], axis=0)


def _shift_to_prev_blocks(y):
    return jnp.concatenate([y[1:], jnp.zeros_like(y[:1])], axis=0)


def _project(frozen, x):
    return jnp.where(frozen[:, None], 0.0, x)


def s_matvec(op: SchurOperands, x, lam, axis_name=None):
    """S x on the reduced pose system — no scatter anywhere. Under a
    landmark-sharded axis the local contributions are psummed (x and the
    result stay replicated; op.diag_p is already global)."""
    x = _project(op.frozen, x)
    # landmark-factor block-diagonal part
    hx = jnp.einsum("nij,nj->ni", op.Dp, x)
    # odometry chain: v = Ji x_{f-1} + Jj x_f per factor f
    xprev = jnp.concatenate([x[:1], x[:-1]], axis=0)
    v = jnp.einsum("fij,fj->fi", op.od_Ji, xprev) + \
        jnp.einsum("fij,fj->fi", op.od_Jj, x)
    hx = hx + jnp.einsum("fij,fi->fj", op.od_Jj, v) \
        + _shift_to_prev(jnp.einsum("fij,fi->fj", op.od_Ji, v))
    # between factors
    vb = jnp.einsum("fij,fj->fi", op.bf_Ji, x[op.bf_i]) + \
        jnp.einsum("fij,fj->fi", op.bf_Jj, x[op.bf_j])
    yb = jnp.concatenate([jnp.einsum("fij,fi->fj", op.bf_Ji, vb),
                          jnp.einsum("fij,fi->fj", op.bf_Jj, vb)], axis=0)
    hx = hx + _bf16x2_matmul(op.B_t, yb)
    # Schur correction: - A Hll^-1 A^T x aggregated through the factors
    t = jnp.einsum("fij,fi->fj", op.A, x[op.pidx])         # [F, 9]
    z = _bf16x2_matmul(op.L_t, t)                          # [NL, 9]
    w = jnp.einsum("nij,nj->ni", op.Hll_inv, z)
    u = jnp.einsum("fij,fj->fi", op.A, w[op.lidx])         # [F, 6]
    hx = hx - _bf16x2_matmul(op.P_t, u)
    hx = _maybe_psum(hx, axis_name) + lam * op.diag_p * x
    return _project(op.frozen, hx)


def solve_reduced(op: SchurOperands, lam, pcg_iters, pcg_tol, step_tol=0.0,
                  axis_name=None):
    """PCG on the reduced pose system (block-Jacobi or scalar-Jacobi
    preconditioner, depending on how the operands were built); returns
    (dp [RP,6], dl [NL,9]). dp is replicated across a landmark-sharded
    axis; dl is each shard's local landmark block."""
    RP = op.g_p.shape[0]
    NL = op.g_l.shape[0]
    w0 = jnp.einsum("nij,nj->ni", op.Hll_inv, op.g_l)
    b = _maybe_psum(
        -op.g_p + _scatter_rows(
            op.pidx, jnp.einsum("fij,fj->fi", op.A, w0[op.lidx]), RP),
        axis_name)
    b = _project(op.frozen, b)

    if op.prec_inv.shape[0]:
        precond = lambda r: jnp.einsum("nij,nj->ni", op.prec_inv, r)
    else:
        scalar = 1.0 / (op.diag_p * (1.0 + lam) + 1e-8)
        precond = lambda r: r * scalar
    hv = lambda x: s_matvec(op, x, lam, axis_name)
    dp = solver.pcg(hv, b, precond, pcg_iters, pcg_tol, step_tol)
    # back-substitute landmarks: dl = Hll^-1 (-g_l - Hlp dp)
    hlp_dp = _scatter_rows(
        op.lidx, jnp.einsum("fij,fi->fj", op.A, dp[op.pidx]), NL)
    dl = jnp.einsum("nij,nj->ni", op.Hll_inv, -op.g_l - hlp_dp)
    dl = jnp.where(op.lm_active[:, None], dl, 0.0)
    return dp, dl


def solve(s: GraphState, *, cyl_sigma: float, bearing_sigma: float,
          outer_iters, pcg_iters, pcg_tol=1e-6,
          lam: float = 1e-6, rel_tol: float = 1e-6,
          line_search: bool = True, block_precond: bool = True,
          step_tol=0.0, axis_name=None,
          exact_curvature: bool = False) -> GraphState:
    """Schur-eliminated damped Gauss-Newton (drop-in for solver.solve on a
    single device). axis_name: landmark-sharded SPMD solve — poses
    replicated + psum-reduced, landmarks/factors local per shard
    (parallel/landmark_sharded.py); the factor-sharded SPMD path keeps the
    unified solver."""
    NC = s.cyl_ray.shape[0]
    NK = s.cub_pose.shape[0]

    def one_iter(carry):
        s, it, _ = carry
        op = build_operands(s, cyl_sigma, bearing_sigma, lam, block_precond,
                            axis_name, exact_curvature)
        dp, dl = solve_reduced(op, lam, pcg_iters, pcg_tol, step_tol,
                               axis_name)
        # sanitize: a non-finite step (degenerate block, overflow) must
        # never poison the state — iSAM2's equivalent is its indeterminant-
        # linear-system exception path
        dp = solver.clamp_rows(jnp.where(jnp.isfinite(dp), dp, 0.0))
        dl = solver.clamp_rows(jnp.where(jnp.isfinite(dl), dl, 0.0))
        dx = solver.Tangent(pose=dp, cyl=dl[:NC, :7],
                            cub=dl[NC:NC + NK], pt=dl[NC + NK:, :3])
        if not line_search:
            return solver.retract_state(s, dx), it + 1, jnp.bool_(False)
        c0 = solver.cost(s, cyl_sigma, bearing_sigma, axis_name)
        scales = jnp.array([1.0, 0.5, 0.25], dtype=s.poses.dtype)
        costs = jax.vmap(
            lambda a: solver.cost(
                solver.retract_state(s, solver.tree_scale(a, dx)),
                cyl_sigma, bearing_sigma, axis_name))(scales)
        best = jnp.argmin(costs)
        accept = costs[best] < c0
        alpha = jnp.where(accept, scales[best], 0.0)
        improved = (c0 - costs[best]) > rel_tol * (c0 + 1e-9)
        done = ~(accept & improved)
        return (solver.retract_state(s, solver.tree_scale(alpha, dx)),
                it + 1, done)

    def cond(carry):
        _, it, done = carry
        return (it < outer_iters) & ~done

    s, _, _ = jax.lax.while_loop(cond, one_iter,
                                 (s, jnp.int32(0), jnp.bool_(False)))
    return s
