"""Analytic factor linearizations vs autodiff ground truth."""
import jax
import jax.numpy as jnp
import numpy as np

from slide_slam_tpu.factorgraph import solver
from slide_slam_tpu.geometry import se3


def rand_pose(rng, scale=1.0):
    return se3.exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * scale))


def test_between_lin():
    rng = np.random.default_rng(0)
    for _ in range(5):
        pi, pj = rand_pose(rng), rand_pose(rng)
        rel = se3.retract(se3.between(pi, pj),
                          jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.1))
        sigma = jnp.asarray(np.abs(rng.normal(size=6)).astype(np.float32) + 0.05)
        r_a, Ji_a, Jj_a = solver._between_lin(pi, pj, rel, sigma)
        r_b, Ji_b, Jj_b = solver._between_lin_ad(pi, pj, rel, sigma)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_b), atol=1e-4)
        np.testing.assert_allclose(np.asarray(Ji_a), np.asarray(Ji_b), atol=5e-3)
        np.testing.assert_allclose(np.asarray(Jj_a), np.asarray(Jj_b), atol=5e-3)


def test_cylinder_lin():
    rng = np.random.default_rng(1)
    for _ in range(5):
        pose = rand_pose(rng)
        lm = jnp.asarray(rng.normal(size=7).astype(np.float32))
        meas = jnp.asarray(rng.normal(size=7).astype(np.float32))
        r_a, Jp_a, Jl_a = solver._cyl_lin(pose, lm, meas, 400.0)
        r_b, Jp_b, Jl_b = solver._cyl_lin_ad(pose, lm, meas, 400.0)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_b), atol=1e-6)
        np.testing.assert_allclose(np.asarray(Jp_a), np.asarray(Jp_b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(Jl_a), np.asarray(Jl_b), atol=1e-6)


def test_cuboid_lin():
    rng = np.random.default_rng(2)
    for _ in range(5):
        pose, lm_pose = rand_pose(rng), rand_pose(rng)
        m_pose = rand_pose(rng, 0.5)
        lm_scale = jnp.abs(jnp.asarray(rng.normal(size=3).astype(np.float32))) + 0.5
        m_scale = lm_scale + 0.1
        sigma = jnp.asarray(np.abs(rng.normal(size=9)).astype(np.float32) + 0.05)
        r_a, Jp_a, Jl_a = solver._cub_lin(pose, lm_pose, lm_scale, m_pose,
                                          m_scale, sigma)
        r_b, Jp_b, Jl_b = solver._cub_lin_ad(pose, lm_pose, lm_scale, m_pose,
                                             m_scale, sigma)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_b), atol=1e-4)
        np.testing.assert_allclose(np.asarray(Jp_a), np.asarray(Jp_b), atol=2e-2)
        np.testing.assert_allclose(np.asarray(Jl_a), np.asarray(Jl_b), atol=2e-2)


def test_bearing_range_lin():
    rng = np.random.default_rng(3)
    for _ in range(5):
        pose = rand_pose(rng)
        pt = jnp.asarray(rng.normal(size=3).astype(np.float32) * 5)
        p_b = se3.apply(se3.inverse(pose), pt)
        n = jnp.linalg.norm(p_b)
        bearing = p_b / n
        r_a, Jp_a, Jl_a = solver._pt_lin(pose, pt, bearing, n * 0.9, 1.0)
        r_b, Jp_b, Jl_b = solver._pt_lin_ad(pose, pt, bearing, n * 0.9, 1.0)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(Jp_a), np.asarray(Jp_b), atol=1e-3)
        np.testing.assert_allclose(np.asarray(Jl_a), np.asarray(Jl_b), atol=1e-3)
