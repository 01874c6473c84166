"""CLIPPER alternate-solver tests: exact max clique, densest subgraph, SDR.

Parity targets: clipper_semantic_object/src/maxclique.cpp (Method EXACT/
HEU/KCORE), dsd.cpp (Goldberg densest subgraph, also Rounding::DSD of
findDenseClique, clipper.cpp:287-300), sdp.cpp (MSRC-SDR + eigenvector
thresholding). Exactness is checked against brute-force oracles on small
graphs and against planted-inlier recovery on CLIPPER-style problems."""
import itertools

import numpy as np
import pytest

from slide_slam_tpu import native
from slide_slam_tpu.place_recognition import clipper as cl
from slide_slam_tpu.place_recognition import clipper_alternates as alt


def _random_graph(rng, n, p):
    A = (rng.uniform(size=(n, n)) < p)
    A = np.triu(A, 1)
    return (A | A.T).astype(np.uint8)


def _brute_max_clique_size(A):
    n = A.shape[0]
    best = 0
    for k in range(n, 0, -1):
        if k <= best:
            break
        for comb in itertools.combinations(range(n), k):
            sub = A[np.ix_(comb, comb)]
            if np.all(sub + np.eye(k) > 0):
                return k
    return best


def test_max_clique_exact_matches_bruteforce():
    rng = np.random.default_rng(0)
    for n, p in [(8, 0.4), (10, 0.5), (12, 0.6), (14, 0.3)]:
        A = _random_graph(rng, n, p)
        clique = alt.max_clique(A, method="exact")
        # returned set is a clique
        sub = A[np.ix_(clique, clique)]
        assert np.all(sub + np.eye(len(clique)) > 0)
        # and it is maximum
        assert len(clique) == _brute_max_clique_size(A)


def test_max_clique_planted():
    rng = np.random.default_rng(1)
    n, k = 40, 9
    A = _random_graph(rng, n, 0.15)
    planted = rng.choice(n, size=k, replace=False)
    for i, j in itertools.combinations(planted, 2):
        A[i, j] = A[j, i] = 1
    clique = alt.max_clique(A, method="exact")
    assert set(planted) <= set(clique.tolist()) or len(clique) >= k


@pytest.mark.skipif(not native.available(), reason="needs native lib")
def test_max_clique_heu_and_kcore():
    rng = np.random.default_rng(2)
    n, k = 30, 8
    A = _random_graph(rng, n, 0.1)
    planted = rng.choice(n, size=k, replace=False)
    for i, j in itertools.combinations(planted, 2):
        A[i, j] = A[j, i] = 1
    heu = native.max_clique(A, method="heu")
    sub = A[np.ix_(heu, heu)]
    assert np.all(sub + np.eye(len(heu)) > 0)   # heu result is a clique
    assert len(heu) >= k - 1                     # finds (almost) the planted one
    kcore = native.max_clique(A, method="kcore")
    # max-core vertices must include the planted clique (its core >= k-1)
    assert set(planted.tolist()) <= set(kcore.tolist())


def test_densest_subgraph_matches_bruteforce():
    rng = np.random.default_rng(3)
    for n in [6, 8, 10]:
        W = rng.uniform(size=(n, n)) * (rng.uniform(size=(n, n)) < 0.5)
        W = np.triu(W, 1)
        W = W + W.T
        nodes, density = alt.densest_subgraph(W)
        ref_nodes, ref_density = alt._py_densest_subgraph(W)
        assert density == pytest.approx(ref_density, abs=1e-6)
        # check returned set achieves the reported density
        got = np.triu(W[np.ix_(nodes, nodes)], 1).sum() / max(len(nodes), 1)
        assert got == pytest.approx(density, abs=1e-9)


def test_densest_subgraph_planted_clique():
    rng = np.random.default_rng(4)
    n, k = 60, 12
    W = np.zeros((n, n))
    # sparse weak background
    bg = _random_graph(rng, n, 0.05) * 0.3
    W = np.maximum(W, bg)
    planted = np.arange(10, 10 + k)
    for i, j in itertools.combinations(planted, 2):
        W[i, j] = W[j, i] = 1.0
    nodes, density = alt.densest_subgraph(W)
    assert set(planted.tolist()) <= set(nodes.tolist())
    assert density >= (k - 1) / 2 - 1e-6


def test_densest_subgraph_subset_restriction():
    n = 10
    W = np.zeros((n, n))
    for i, j in itertools.combinations(range(4), 2):
        W[i, j] = W[j, i] = 1.0
    for i, j in itertools.combinations(range(5, 9), 2):
        W[i, j] = W[j, i] = 1.0
    nodes, _ = alt.densest_subgraph(W, subset=np.arange(5, 10))
    assert set(nodes.tolist()) == {5, 6, 7, 8}


def _planted_problem(rng, n_in=15, n_out=10):
    pts = rng.uniform(-10, 10, (n_in, 2))
    yaw = 0.7
    R = np.array([[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]])
    pts2 = (R @ pts.T).T + np.array([2.0, -1.0])
    d1 = np.concatenate([pts, rng.uniform(-10, 10, (n_out, 2))])
    d2 = np.concatenate([pts2, rng.uniform(-10, 10, (n_out, 2))])
    return d1, d2, n_in


def test_solve_as_maximum_clique_recovers_inliers():
    rng = np.random.default_rng(5)
    d1, d2, n_in = _planted_problem(rng)
    params = cl.ClipperParams(sigma=0.1, epsilon=0.3)
    inliers = alt.solve_as_maximum_clique(d1, d2, params)
    assert len(inliers) >= n_in * 0.8
    assert np.mean(inliers < n_in) > 0.95


def test_solve_as_msrc_sdr_recovers_inliers():
    rng = np.random.default_rng(6)
    d1, d2, n_in = _planted_problem(rng)
    params = cl.ClipperParams(sigma=0.1, epsilon=0.3)
    inliers = alt.solve_as_msrc_sdr(d1, d2, params)
    assert len(inliers) >= n_in * 0.7
    assert np.mean(inliers < n_in) > 0.9


def test_dsd_rounding_mode():
    rng = np.random.default_rng(7)
    d1, d2, n_in = _planted_problem(rng)
    params = cl.ClipperParams(sigma=0.1, epsilon=0.3)
    inliers = cl.dense_clique_inliers(d1, d2, params, rounding="dsd")
    assert len(inliers) >= n_in * 0.8
    assert np.mean(inliers < n_in) > 0.95
    nz = cl.dense_clique_inliers(d1, d2, params, rounding="nonzero")
    # dsd rounding selects a subset of the nonzero support
    assert set(inliers.tolist()) <= set(nz.tolist())


def test_sdr_spectraplex_projection():
    import jax.numpy as jnp
    from slide_slam_tpu.place_recognition.clipper_alternates import (
        _project_spectraplex)
    rng = np.random.default_rng(8)
    Y = rng.normal(size=(12, 12))
    X = np.asarray(_project_spectraplex(jnp.asarray(Y, jnp.float32)))
    evals = np.linalg.eigvalsh(X)
    assert evals.min() >= -1e-5
    assert np.trace(X) == pytest.approx(1.0, abs=1e-4)
    # projection of something already in the set is (near) identity
    X2 = np.asarray(_project_spectraplex(jnp.asarray(X, jnp.float32)))
    assert np.allclose(X, X2, atol=1e-4)
