"""SlideGraph / CLIPPER tests.

Parity targets: clipper_semantic_object/test/{affinity,clipper}_test.cpp and
test_semantic_clipper.cpp — affinity structure, dense-clique inlier recovery,
end-to-end transform recovery on synthetic and reference fixture maps."""
import os

import numpy as np
import pytest

from slide_slam_tpu.config import SlideGraphConfig
from slide_slam_tpu.place_recognition import clipper as cl
from slide_slam_tpu.place_recognition.slidegraph import (
    SlideGraph, estimate_tf_2d, match_triangles, _triangles,
    run_semantic_clipper)

REF_DATA = "/root/reference/backend/sloam/clipper_semantic_object/examples/data"


def test_affinity_structure():
    import jax.numpy as jnp
    # two consistent pairs (same inter-point distance), one inconsistent
    d1 = np.array([[0.0, 0], [1.0, 0], [5.0, 5]], np.float32)
    d2 = np.array([[10.0, 0], [11.0, 0], [30.0, 2]], np.float32)
    params = cl.ClipperParams(sigma=0.1, epsilon=0.3)
    M = np.asarray(cl.affinity_matrix(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(3, bool), params))
    assert M[0, 1] > 0.9          # consistent: |l1 - l2| = 0
    assert M[0, 2] == 0.0         # inconsistent distances
    assert np.all(np.diag(M) == 0)
    assert np.allclose(M, M.T)


def test_dense_clique_recovers_inliers():
    rng = np.random.default_rng(0)
    n_in, n_out = 20, 15
    pts = rng.uniform(-10, 10, (n_in, 2))
    yaw = 0.8
    R = np.array([[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]])
    t = np.array([3.0, -2.0])
    pts2 = (R @ pts.T).T + t
    # outlier associations: random unrelated pairs
    out1 = rng.uniform(-10, 10, (n_out, 2))
    out2 = rng.uniform(-10, 10, (n_out, 2))
    d1 = np.concatenate([pts, out1])
    d2 = np.concatenate([pts2, out2])
    params = cl.ClipperParams(sigma=0.1, epsilon=0.3)
    inliers = cl.dense_clique_inliers(d1, d2, params)
    assert len(inliers) >= n_in * 0.8
    assert np.mean(inliers < n_in) > 0.95   # selected mostly true inliers


def test_triangles_and_descriptor_matching():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-10, 10, (15, 2))
    tris = _triangles(pts)
    assert len(tris) > 0
    # identical maps: every triangle matches itself (descriptor diff 0)
    pm, pd = match_triangles(tris, tris, threshold=1e-6)
    assert len(pm) >= len(tris) * 3
    np.testing.assert_allclose(pm, pd)


def test_estimate_tf_2d():
    rng = np.random.default_rng(2)
    a = rng.uniform(-5, 5, (30, 2))
    yaw = -0.5
    R = np.array([[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]])
    t = np.array([1.0, 2.0])
    b = (R @ a.T).T + t
    tf = estimate_tf_2d(a, b)
    np.testing.assert_allclose(tf[:2, :2], R, atol=1e-9)
    np.testing.assert_allclose(tf[:2, 2], t, atol=1e-9)


def _random_map(rng, n=50, extent=20.0):
    m = np.zeros((n, 7), np.float32)
    m[:, 0] = rng.integers(0, 3, n)
    m[:, 1:3] = rng.uniform(-extent, extent, (n, 2))
    return m


def _apply_tf(objs, tf4):
    out = objs.copy()
    ph = np.concatenate([objs[:, 1:3], np.ones((len(objs), 1))], axis=1)
    out[:, 1:3] = (tf4[np.ix_([0, 1], [0, 1, 3])] @ ph.T).T
    return out


def test_slidegraph_end_to_end():
    rng = np.random.default_rng(3)
    ref = _random_map(rng, 60)
    yaw, x, y = np.deg2rad(30.0), 5.0, -3.0
    tf_fwd = np.eye(4)
    tf_fwd[:2, :2] = [[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]]
    tf_fwd[0, 3], tf_fwd[1, 3] = x, y
    qry = _apply_tf(ref, np.linalg.inv(tf_fwd))
    qry[:, 1:3] += rng.normal(0, 0.02, (len(qry), 2))

    sg = SlideGraph(SlideGraphConfig(min_num_map_objects_to_start=10))
    found, tf = sg.find_inter_loop_closure(ref, qry)
    assert found
    got_yaw = np.arctan2(tf[1, 0], tf[0, 0])
    assert abs(tf[0, 3] - x) < 0.3
    assert abs(tf[1, 3] - y) < 0.3
    assert abs(np.arctan2(np.sin(got_yaw - yaw), np.cos(got_yaw - yaw))) < 0.05


def test_slidegraph_rejects_unrelated():
    ref = _random_map(np.random.default_rng(4), 50)
    qry = _random_map(np.random.default_rng(5), 50)
    sg = SlideGraph(SlideGraphConfig(min_num_map_objects_to_start=10,
                                     num_inliers_threshold=10))
    found, _ = sg.find_inter_loop_closure(ref, qry)
    assert not found


@pytest.mark.skipif(not os.path.isdir(REF_DATA),
                    reason="reference fixture maps not available")
def test_slidegraph_reference_fixture():
    raw = np.loadtxt(os.path.join(REF_DATA, "robot1Map_forest.txt"))
    objs = np.zeros((len(raw), 7), np.float32)
    objs[:, :4] = raw[:, :4]
    yaw, x, y = np.deg2rad(-25.0), -6.0, 9.0
    tf_fwd = np.eye(4)
    tf_fwd[:2, :2] = [[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]]
    tf_fwd[0, 3], tf_fwd[1, 3] = x, y
    qry = _apply_tf(objs, np.linalg.inv(tf_fwd))
    sg = SlideGraph(SlideGraphConfig(min_num_map_objects_to_start=10))
    found, tf = sg.find_inter_loop_closure(objs, qry)
    assert found
    got_yaw = np.arctan2(tf[1, 0], tf[0, 0])
    assert abs(tf[0, 3] - x) < 0.5 and abs(tf[1, 3] - y) < 0.5
    assert abs(np.arctan2(np.sin(got_yaw - yaw), np.cos(got_yaw - yaw))) < 0.05
