"""CLIPPER-style robust data association as dense JAX linear algebra.

Re-derivation of the vendored CLIPPER library's core
(clipper_semantic_object/src/clipper.cpp):

* `affinity_matrix` == scorePairwiseConsistency (clipper.cpp:21-65) with the
  EuclideanDistance pairwise invariant (invariants/euclidean_distance.cpp:13-31).
* `find_dense_clique` == projected-gradient ascent with homotopy on the
  affinity relaxation (findDenseClique, clipper.cpp:172-310), DSD_HEU rounding
  (top-round(F) entries of u — clipper.h:59 default).

The CPU original walks the upper triangle with OpenMP; here affinity is one
broadcasted distance computation and every ascent step is a dense
matrix-vector product — MXU food.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ClipperParams(NamedTuple):
    sigma: float = 0.01
    epsilon: float = 0.06
    mindist: float = 0.0
    affinity_eps: float = 1e-4
    tol_u: float = 1e-8
    tol_F: float = 1e-9
    eps: float = 1e-9
    beta: float = 0.25
    maxiniters: int = 200
    maxoliters: int = 1000
    maxlsiters: int = 99


def affinity_matrix(d1: jnp.ndarray, d2: jnp.ndarray, mask: jnp.ndarray,
                    params: ClipperParams) -> jnp.ndarray:
    """Affinity M for the identity association set (a_i = (d1[i], d2[i])).

    d1, d2: [m, D] matched point pairs; mask: [m] valid flags.
    M[i,j] = exp(-c^2 / (2 sigma^2)) if |l1-l2| < epsilon else 0, zero
    diagonal, zeroed where the distinctness constraint is violated
    (identical points — the identity association can't repeat indices, but
    coincident coordinates mimic the reference's mindist guard)."""
    l1 = jnp.linalg.norm(d1[:, None, :] - d1[None, :, :], axis=-1)
    l2 = jnp.linalg.norm(d2[:, None, :] - d2[None, :, :], axis=-1)
    c = jnp.abs(l1 - l2)
    m = jnp.exp(-0.5 * c * c / (params.sigma ** 2))
    m = jnp.where(c < params.epsilon, m, 0.0)
    if params.mindist > 0:
        m = jnp.where((l1 < params.mindist) | (l2 < params.mindist), 0.0, m)
    m = jnp.where(m > params.affinity_eps, m, 0.0)
    ok = mask[:, None] & mask[None, :]
    m = jnp.where(ok, m, 0.0)
    return m * (1.0 - jnp.eye(m.shape[0], dtype=m.dtype))


@functools.partial(jax.jit, static_argnames=("params",))
def find_dense_clique(M: jnp.ndarray, u0: jnp.ndarray,
                      params: ClipperParams):
    """Projected gradient ascent with homotopy (clipper.cpp:172-310).

    The constraint matrix C here equals the affinity's support (C_ij = 1 where
    M_ij > 0) exactly as scorePairwiseConsistency builds it (clipper.cpp:63-64).
    Returns ONE packed [n+2] array: [u (characteristic vector, n), F
    (objective), omega (estimated clique size, round(F), DSD_HEU)] — packed
    so the host fetches one transfer instead of three."""
    n = M.shape[0]
    C = (M > 0).astype(M.dtype)
    ones = jnp.ones((n,), M.dtype)

    def Mu_(u):
        return M @ u + u          # identity restored on the diagonal

    def Cbu_(u):
        return ones * jnp.sum(u) - C @ u - u

    # one power-iteration rescale (rescale_u0, clipper.cpp:193-198)
    u = Mu_(u0)
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-30)

    def init_d(u):
        Cbu = Cbu_(u)
        idx = (Cbu > params.eps) & (u > params.eps)
        num = jnp.where(idx, Mu_(u), 0.0)
        den = jnp.where(idx, Cbu, 1.0)
        cnt = jnp.sum(idx)
        return jnp.where(cnt > 0, jnp.sum(jnp.where(idx, num / den, 0.0))
                         / jnp.maximum(cnt, 1), 0.0)

    d0 = init_d(u)

    def gradF(u, d):
        return (1 + d) * u - d * ones * jnp.sum(u) + M @ u + d * (C @ u)

    def outer_body(carry):
        i, u, d, F, done = carry
        g = gradF(u, d)
        F = jnp.dot(u, g)

        def inner_body(carry_in):
            j, u, g, F, stop = carry_in

            def ls_body(carry_ls):
                k, alpha, unew, gnew, Fnew, ls_done = carry_ls
                cand = jnp.maximum(u + alpha * g, 0.0)
                cand = cand / jnp.maximum(jnp.linalg.norm(cand), 1e-30)
                gc = gradF(cand, d)
                Fc = jnp.dot(cand, gc)
                dec = (Fc - F) < -params.eps
                alpha_next = jnp.where(dec, alpha * params.beta, alpha)
                return (k + 1, alpha_next,
                        jnp.where(dec, unew, cand),
                        jnp.where(dec, gnew, gc),
                        jnp.where(dec, Fnew, Fc),
                        ls_done | ~dec)

            def ls_cond(carry_ls):
                k, _, _, _, _, ls_done = carry_ls
                return (k < params.maxlsiters) & ~ls_done

            _, _, unew, gnew, Fnew, _ = jax.lax.while_loop(
                ls_cond, ls_body, (0, jnp.asarray(1.0, M.dtype), u, g, F, False))
            deltau = jnp.linalg.norm(unew - u)
            deltaF = Fnew - F
            stop = (deltau < params.tol_u) | (jnp.abs(deltaF) < params.tol_F)
            return j + 1, unew, gnew, Fnew, stop

        def inner_cond(carry_in):
            j, _, _, _, stop = carry_in
            return (j < params.maxiniters) & ~stop

        _, u, g, F, _ = jax.lax.while_loop(inner_cond, inner_body,
                                           (0, u, g, F, False))

        Cbu = Cbu_(u)
        idx = (Cbu > params.eps) & (u > params.eps)
        cnt = jnp.sum(idx)
        num = jnp.where(idx, Mu_(u), 0.0)
        den = jnp.where(idx, Cbu, 1.0)
        deltad = jnp.sum(jnp.where(idx, jnp.abs(num / den), 0.0)) / jnp.maximum(cnt, 1)
        done = cnt == 0
        d = jnp.where(done, d, d + deltad)
        return i + 1, u, d, F, done

    def outer_cond(carry):
        i, _, _, _, done = carry
        return (i < params.maxoliters) & ~done

    _, u, d, F, _ = jax.lax.while_loop(
        outer_cond, outer_body,
        (0, u, d0, jnp.asarray(0.0, M.dtype), False))
    omega = jnp.round(F).astype(jnp.int32)
    # one packed [cap+2] result: u, F, omega — a host fetch costs a full
    # tunnel round trip regardless of size, so ship one array, not three
    return jnp.concatenate([u, F[None], omega.astype(M.dtype)[None]])


def select_inliers(u: np.ndarray, omega: int) -> np.ndarray:
    """DSD_HEU rounding: indices of the omega largest entries of u with u>0
    (utils::findIndicesOfkLargest)."""
    u = np.asarray(u)
    omega = int(max(0, min(omega, (u > 0).sum())))
    if omega == 0:
        return np.zeros((0,), np.int64)
    idx = np.argpartition(-u, omega - 1)[:omega]
    return idx[u[idx] > 0]


def dense_clique_inliers(d1: np.ndarray, d2: np.ndarray,
                         params: ClipperParams, seed: int = 0,
                         rounding: str = "dsd_heu") -> np.ndarray:
    """Full pipeline on matched point pairs: affinity -> ascent -> rounding.
    Returns indices of the selected (inlier) associations.

    rounding: 'dsd_heu' (top-round(F) entries of u — the reference default,
    clipper.h:59), 'nonzero' (all u > 0, Rounding::NONZERO), or 'dsd'
    (exact densest subgraph of the affinity restricted to u's support,
    Rounding::DSD, clipper.cpp:287-300)."""
    m = len(d1)
    if m == 0:
        return np.zeros((0,), np.int64)
    # pad the association count to a power-of-2 bucket (>=64): the ascent is
    # jit-compiled per shape and every place-recognition attempt arrives
    # with a different m — without bucketing each attempt recompiles
    # (~seconds on the TPU tunnel). Padding rows are masked out of the
    # affinity; their ascent gradient is <= 0 at u=0 so they stay exactly 0.
    cap = 1 << max(6, int(np.ceil(np.log2(m))))
    d1p = np.zeros((cap, np.shape(d1)[1]), np.float32)
    d2p = np.zeros((cap, np.shape(d2)[1]), np.float32)
    d1p[:m], d2p[:m] = d1, d2
    mask = jnp.asarray(np.arange(cap) < m)
    M = affinity_matrix(jnp.asarray(d1p), jnp.asarray(d2p), mask, params)
    rng = np.random.default_rng(seed)
    u0 = np.zeros((cap,), np.float32)
    u0[:m] = rng.uniform(size=m).astype(np.float32)
    packed = np.asarray(find_dense_clique(M, jnp.asarray(u0), params))
    u, omega = packed[:m], int(packed[-1])
    if rounding == "nonzero":
        return np.flatnonzero(u > 0.0)
    if rounding == "dsd":
        from .clipper_alternates import dsd_round
        return dsd_round(np.asarray(M)[:m, :m], u)
    return select_inliers(u, omega)
