"""CLIPPER solver alternates: exact max clique, exact densest subgraph, SDR.

The reference's vendored CLIPPER offers three alternates to the
projected-gradient dense-clique relaxation (clipper.py here):

* ``solve_as_maximum_clique`` — treat the consistency graph's *constraint*
  matrix as an unweighted graph and find its maximum clique
  (clipper_semantic_object/src/clipper.cpp:82-97 + maxclique.cpp, which
  wraps the PMC parallel B&B solver). Here: native C++ branch & bound with
  greedy-colouring bounds (native/graph_algos.cpp), with a pure-python
  fallback for toolchain-free environments.
* ``densest_subgraph`` — exact densest subgraph via Goldberg's flow
  algorithm (dsd.cpp:166-311), used standalone and as CLIPPER's
  ``Rounding::DSD`` mode (clipper.cpp:293-300). Native Dinic max-flow +
  binary search on the density.
* ``solve_as_msrc_sdr`` — the MSRC semidefinite relaxation
  (sdp.cpp:87-160):  max <M, X>  s.t. tr(X) = 1, X >= 0 (PSD),
  X_ij = 0 where C_ij = 0, X_ij >= 0 elsewhere; inliers = entries of the
  top eigenvector above half its max magnitude (sdp.cpp:130-141). The
  reference hands this to the SCS conic solver; here it is an ADMM
  splitting between the spectraplex (eigh + simplex projection — dense
  batched linear algebra, MXU food) and the entrywise cone, jitted with a
  fixed iteration budget.

These are *combinatorial* fallbacks — sequential search is the wrong shape
for the TPU, so (like the reference, which keeps them in C++) the clique
and flow solvers run native on the host while the SDR runs on device.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from .clipper import ClipperParams, affinity_matrix


# ---------------------------------------------------------------------------
# Pure-python fallbacks (also the cross-check oracle in tests)
# ---------------------------------------------------------------------------

def _py_max_clique(adjacency: np.ndarray) -> np.ndarray:
    """Exact max clique by branch & bound on neighbour sets (fallback)."""
    A = np.asarray(adjacency) != 0
    n = A.shape[0]
    nbrs = [frozenset(np.flatnonzero(A[i] | A[:, i])) - {i} for i in range(n)]
    best: list = []

    def expand(clique, cand):
        nonlocal best
        if len(clique) + len(cand) <= len(best):
            return
        if not cand:
            if len(clique) > len(best):
                best = list(clique)
            return
        # pivot on the candidate with most candidate-neighbours
        order = sorted(cand, key=lambda v: -len(nbrs[v] & cand))
        cand = set(cand)
        for v in order:
            if len(clique) + len(cand) <= len(best):
                return
            if v not in cand:
                continue
            expand(clique + [v], cand & nbrs[v])
            cand.discard(v)

    expand([], frozenset(range(n)))
    return np.sort(np.asarray(best, np.int32))


def _py_densest_subgraph(affinity: np.ndarray) -> Tuple[np.ndarray, float]:
    """Exact densest subgraph by brute force (fallback; exponential — only
    usable for small n, which is what tests exercise)."""
    A = np.maximum(affinity, affinity.T)
    n = A.shape[0]
    if n == 0:
        return np.zeros((0,), np.int32), 0.0
    if n > 20:
        raise RuntimeError("python densest-subgraph fallback limited to n<=20")
    best_nodes, best_d = np.asarray([0], np.int32), 0.0
    for mask in range(1, 1 << n):
        idx = np.asarray([i for i in range(n) if (mask >> i) & 1])
        w = np.triu(A[np.ix_(idx, idx)], k=1).sum()
        d = w / len(idx)
        if d > best_d + 1e-15:
            best_d, best_nodes = d, idx.astype(np.int32)
    return best_nodes, float(best_d)


def max_clique(adjacency: np.ndarray, method: str = "exact",
               time_limit_s: float = 3600.0) -> np.ndarray:
    """Max clique (sorted vertex indices); native solver when available."""
    if native.available():
        return native.max_clique(adjacency, method=method,
                                 time_limit_s=time_limit_s)
    if method != "exact":
        raise RuntimeError("python fallback supports method='exact' only")
    return _py_max_clique(adjacency)


def densest_subgraph(affinity: np.ndarray,
                     subset: Optional[np.ndarray] = None):
    """Exact densest subgraph (nodes, density); native when available."""
    if native.available():
        return native.densest_subgraph(affinity, subset)
    A = np.asarray(affinity, np.float64)
    if subset is not None:
        keep = np.zeros(A.shape[0], bool)
        keep[np.asarray(subset, np.int64)] = True
        A = np.where(np.outer(keep, keep), A, 0.0)
    return _py_densest_subgraph(A)


# ---------------------------------------------------------------------------
# MSRC-SDR on device
# ---------------------------------------------------------------------------

def _project_spectraplex(Y: jnp.ndarray) -> jnp.ndarray:
    """Euclidean projection onto {X PSD, tr(X) = 1}: eigendecompose and
    project the eigenvalues onto the probability simplex."""
    Y = 0.5 * (Y + Y.T)
    evals, evecs = jnp.linalg.eigh(Y)
    # simplex projection (sort-based)
    n = evals.shape[0]
    u = jnp.sort(evals)[::-1]
    css = jnp.cumsum(u) - 1.0
    ks = jnp.arange(1, n + 1, dtype=Y.dtype)
    cond = u - css / ks > 0
    rho = jnp.max(jnp.where(cond, jnp.arange(1, n + 1), 0))
    theta = css[rho - 1] / rho.astype(Y.dtype)
    lam = jnp.maximum(evals - theta, 0.0)
    return (evecs * lam[None, :]) @ evecs.T


@functools.partial(jax.jit, static_argnames=("iters",))
def _sdr_admm(M: jnp.ndarray, support: jnp.ndarray, iters: int = 300):
    """ADMM for  max <M,X>  s.t. X in spectraplex, X*(1-support) = 0,
    X*support >= 0. Returns (X, top eigenvector)."""
    n = M.shape[0]
    rho = jnp.asarray(1.0, M.dtype)
    X = jnp.eye(n, dtype=M.dtype) / n
    Z = X
    U = jnp.zeros_like(X)

    def body(_, carry):
        X, Z, U = carry
        X = _project_spectraplex(Z - U + M / rho)
        Z = jnp.where(support, jnp.maximum(X + U, 0.0), 0.0)
        U = U + X - Z
        return X, Z, U

    X, Z, U = jax.lax.fori_loop(0, iters, body, (X, Z, U))
    evals, evecs = jnp.linalg.eigh(0.5 * (Z + Z.T))
    v = evecs[:, -1] * jnp.sqrt(jnp.maximum(evals[-1], 0.0))
    return Z, v


def sdr_nodes(M: np.ndarray, support: Optional[np.ndarray] = None,
              iters: int = 300) -> np.ndarray:
    """Solve the MSRC SDR and extract inlier nodes: |v_i| > max|v|/2 of the
    dominant eigenvector (sdp.cpp:134-141)."""
    M = np.asarray(M, np.float32)
    n = M.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)
    if support is None:
        # constraint matrix = support of M plus the diagonal, exactly as
        # CLIPPER::getConstraintMatrix builds C from M (clipper.cpp:63-64)
        support = (M > 0) | np.eye(n, dtype=bool)
    _, v = _sdr_admm(jnp.asarray(M), jnp.asarray(support), iters=iters)
    v = np.asarray(v)
    thr = np.abs(v).max() / 2.0
    return np.flatnonzero(np.abs(v) > thr)


# ---------------------------------------------------------------------------
# CLIPPER-level dispatch on matched point pairs (same surface as
# clipper.dense_clique_inliers)
# ---------------------------------------------------------------------------

def _pair_affinity(d1: np.ndarray, d2: np.ndarray,
                   params: ClipperParams) -> np.ndarray:
    m = len(d1)
    mask = jnp.ones((m,), bool)
    M = affinity_matrix(jnp.asarray(d1, jnp.float32),
                        jnp.asarray(d2, jnp.float32), mask, params)
    return np.asarray(M)


def solve_as_maximum_clique(d1: np.ndarray, d2: np.ndarray,
                            params: ClipperParams,
                            method: str = "exact",
                            time_limit_s: float = 3600.0) -> np.ndarray:
    """Inlier associations by max clique of the consistency graph
    (CLIPPER::solveAsMaximumClique, clipper.cpp:82-97)."""
    if len(d1) == 0:
        return np.zeros((0,), np.int64)
    M = _pair_affinity(d1, d2, params)
    return max_clique(M > 0, method=method,
                      time_limit_s=time_limit_s).astype(np.int64)


def solve_as_msrc_sdr(d1: np.ndarray, d2: np.ndarray,
                      params: ClipperParams, iters: int = 300) -> np.ndarray:
    """Inlier associations by the MSRC semidefinite relaxation
    (CLIPPER::solveAsMSRCSDR, clipper.cpp:101-113)."""
    if len(d1) == 0:
        return np.zeros((0,), np.int64)
    M = _pair_affinity(d1, d2, params)
    return sdr_nodes(M, iters=iters).astype(np.int64)


def dsd_round(M: np.ndarray, u: np.ndarray) -> np.ndarray:
    """CLIPPER ``Rounding::DSD``: densest subgraph of the affinity graph
    restricted to the support of the ascent vector u (clipper.cpp:293-300)."""
    S = np.flatnonzero(np.asarray(u) > 0.0)
    if len(S) == 0:
        return np.zeros((0,), np.int64)
    nodes, _ = densest_subgraph(np.asarray(M, np.float64), S)
    return nodes.astype(np.int64)
