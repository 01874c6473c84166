"""SE(3) substrate tests (parity target: utils_test.cpp conversion checks +
exp/log/compose identities)."""
import jax.numpy as jnp
import numpy as np
import pytest

from slide_slam_tpu.geometry import se3


def rand_pose(rng, n=()):
    xi = rng.normal(size=tuple(n) + (6,)).astype(np.float32)
    return se3.exp(jnp.asarray(xi))


def test_identity_compose():
    p = se3.identity()
    q = se3.from_quat_trans(jnp.array([1.0, 0, 0, 0]), jnp.array([1.0, 2, 3]))
    np.testing.assert_allclose(se3.compose(p, q), q, atol=1e-6)
    np.testing.assert_allclose(se3.compose(q, p), q, atol=1e-6)


def test_inverse():
    rng = np.random.default_rng(0)
    p = rand_pose(rng, (8,))
    ident = se3.compose(p, se3.inverse(p))
    np.testing.assert_allclose(np.asarray(se3.trans(ident)), 0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(se3.quat(ident))[:, 0]), 1, atol=1e-5)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    xi = rng.normal(size=(16, 6)).astype(np.float32)
    # keep |omega| < pi: beyond that, log returns the equivalent wrapped rotation
    xi[:, :3] *= 0.8 / np.maximum(1.0, np.linalg.norm(xi[:, :3], axis=1, keepdims=True))
    xi = jnp.asarray(xi)
    back = se3.log(se3.exp(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=2e-4)


def test_exp_log_small_angle():
    xi = jnp.array([[1e-9, 0, 0, 1.0, 2.0, 3.0], [0.0] * 6])
    p = se3.exp(xi)
    np.testing.assert_allclose(np.asarray(se3.trans(p))[0], [1, 2, 3], atol=1e-5)
    back = se3.log(p)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-5)


def test_matrix_roundtrip():
    rng = np.random.default_rng(2)
    p = rand_pose(rng, (8,))
    m = se3.matrix(p)
    p2 = se3.from_matrix(m)
    # quaternions may differ in sign; compare matrices
    np.testing.assert_allclose(np.asarray(se3.matrix(p2)), np.asarray(m), atol=1e-5)


def test_apply_matches_matrix():
    rng = np.random.default_rng(3)
    p = rand_pose(rng)
    pts = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    via_fn = se3.apply(p, pts)
    m = np.asarray(se3.matrix(p))
    via_mat = (m[:3, :3] @ np.asarray(pts).T).T + m[:3, 3]
    np.testing.assert_allclose(np.asarray(via_fn), via_mat, atol=1e-5)


def test_between_local():
    rng = np.random.default_rng(4)
    a, b = rand_pose(rng), rand_pose(rng)
    rel = se3.between(a, b)
    np.testing.assert_allclose(
        np.asarray(se3.compose(a, rel)), np.asarray(b), atol=1e-5)
    # local(a, b) == log(between)
    np.testing.assert_allclose(
        np.asarray(se3.local(a, b)), np.asarray(se3.log(rel)), atol=1e-5)


def test_yaw():
    p = se3.from_xyz_yaw(1.0, 2.0, 3.0, 0.7)
    assert abs(float(se3.yaw_of(p)) - 0.7) < 1e-5
    np.testing.assert_allclose(np.asarray(se3.trans(p)), [1, 2, 3], atol=1e-6)


def test_quat_from_matrix_edge_cases():
    # 180-degree rotations stress the trace-based construction
    for axis in range(3):
        aa = np.zeros(3, np.float32)
        aa[axis] = np.pi
        q = se3.so3_exp_quat(jnp.asarray(aa))
        m = se3.quat_to_matrix(q)
        q2 = se3.quat_from_matrix(m)
        m2 = se3.quat_to_matrix(q2)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)


def test_quat_from_matrix_roundtrip_all_branches():
    """Every Shepperd branch of the host-side converter (regression: the
    m22-dominant branch used to return a wrong z component)."""
    from slide_slam_tpu.geometry import se3np

    # a matrix with trace 0 and m22 as the (tied) max hits the last branch
    R_cam = np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
    cases = [R_cam, R_cam.T]
    rng = np.random.default_rng(11)
    for _ in range(50):
        A = rng.normal(size=(3, 3))
        u, _, vt = np.linalg.svd(A)
        R = u @ vt
        if np.linalg.det(R) < 0:
            R = u @ np.diag([1, 1, -1.0]) @ vt
        cases.append(R)
    for R in cases:
        q = se3np.quat_from_matrix(R)
        np.testing.assert_allclose(se3np.quat_to_matrix(q), R, atol=1e-9)
        # agreement with the device-side branch-free converter
        qj = np.asarray(se3.quat_from_matrix(jnp.asarray(R)))
        np.testing.assert_allclose(se3.quat_to_matrix(jnp.asarray(qj)), R,
                                   atol=1e-5)
