"""Factor residual + solver tests.

Parity targets: the reference's deprecated factor test suite
(src/test/deprecated/{cube_factor_test,cylinder_factor_test}.cpp) — factor
error at ground truth is zero, optimization recovers perturbed states — and
BetweenFactor chain behavior."""
import jax
import jax.numpy as jnp
import numpy as np

from slide_slam_tpu.config import SlamConfig, CapacityConfig
from slide_slam_tpu.factorgraph import residuals as res
from slide_slam_tpu.factorgraph import solver
from slide_slam_tpu.factorgraph.graph import GraphState, empty_state
from slide_slam_tpu.geometry import se3


def small_cfg(**kw):
    return SlamConfig(
        number_of_robots=2,
        capacity=CapacityConfig(
            max_poses_per_robot=32, max_cylinders=32, max_cuboids=32,
            max_points=32, max_cylinder_factors=128, max_cuboid_factors=128,
            max_point_factors=128, max_between_factors=16,
        ),
        **kw,
    )


def test_between_residual_zero_at_truth():
    rng = np.random.default_rng(0)
    a = se3.exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.5))
    b = se3.exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.5))
    rel = se3.between(a, b)
    r = res.between_residual(a, b, rel)
    np.testing.assert_allclose(np.asarray(r), 0, atol=1e-5)


def test_cylinder_residual_zero_at_truth():
    pose = se3.from_xyz_yaw(1.0, 2.0, 0.0, 0.3)
    lm = jnp.array([0.0, 0.1, 1.0, 5.0, 6.0, 0.0, 0.4])  # [ray, root, radius]
    meas = res.cylinder_to_local(lm, pose)
    r = res.cylinder_residual(pose, lm, meas)
    np.testing.assert_allclose(np.asarray(r), 0, atol=1e-5)


def test_cuboid_residual_zero_at_truth():
    pose = se3.from_xyz_yaw(1.0, -2.0, 0.5, -0.4)
    lm_pose = se3.from_xyz_yaw(4.0, 4.0, 1.0, 1.0)
    lm_scale = jnp.array([2.0, 1.0, 1.5])
    meas_pose = se3.compose(se3.inverse(pose), lm_pose)  # graph.cpp:211
    r = res.cuboid_residual(pose, lm_pose, lm_scale, meas_pose, lm_scale)
    np.testing.assert_allclose(np.asarray(r), 0, atol=1e-5)


def test_bearing_range_zero_at_truth():
    pose = se3.from_xyz_yaw(0.0, 0.0, 0.0, 0.5)
    pt = jnp.array([3.0, 4.0, 1.0])
    p_body = se3.apply(se3.inverse(pose), pt)
    rng_meas = jnp.linalg.norm(p_body)
    bearing = p_body / rng_meas
    r = res.bearing_range_residual(pose, pt, bearing, rng_meas)
    np.testing.assert_allclose(np.asarray(r), 0, atol=1e-5)


def _build_odometry_chain(s: GraphState, poses_true, noise_rng=None, sigma=0.0):
    """Insert robot-0 chain with given true poses and (optionally noisy) odom."""
    n = len(poses_true)
    P = s.poses_per_robot
    poses = np.asarray(poses_true, np.float32)
    s = s._replace(
        poses=s.poses.at[0:n].set(jnp.asarray(poses)),
        pose_count=s.pose_count.at[0].set(n),
        prior_pose=s.prior_pose.at[0].set(jnp.asarray(poses[0])),
        prior_valid=s.prior_valid.at[0].set(True),
        keypose_xyz=s.keypose_xyz.at[0:n].set(jnp.asarray(poses[:, 4:7])),
    )
    rels = []
    for i in range(1, n):
        rel = se3.between(jnp.asarray(poses[i - 1]), jnp.asarray(poses[i]))
        if noise_rng is not None and sigma > 0:
            rel = se3.retract(rel, jnp.asarray(
                noise_rng.normal(size=6).astype(np.float32) * sigma))
        rels.append(rel)
    if rels:
        s = s._replace(
            odom_rel=s.odom_rel.at[1:n].set(jnp.stack(rels)),
            odom_sigma=s.odom_sigma.at[1:n].set(0.1),
        )
    return s


def test_solver_noiseless_chain_stays_put():
    cfg = small_cfg()
    s = empty_state(cfg)
    rng = np.random.default_rng(5)
    truth = [np.asarray(se3.from_xyz_yaw(float(i), 0.0, 0.0, 0.1 * i))
             for i in range(8)]
    s = _build_odometry_chain(s, truth)
    out = solver.solve(s, cyl_sigma=400.0, bearing_sigma=1.0,
                       outer_iters=2, pcg_iters=64)
    np.testing.assert_allclose(np.asarray(out.poses[:8]), np.stack(truth),
                               atol=1e-4)


def test_solver_loop_closure_corrects_drift():
    """Square loop with drifting odometry + exact closure factor: the final
    pose must be pulled (almost) back onto the first pose."""
    cfg = small_cfg()
    s = empty_state(cfg)
    n = 17
    # ground truth: walk a square of side 4 (1 m steps), return to start
    truth = []
    pos = np.array([0.0, 0.0, 0.0])
    yaw = 0.0
    truth.append(np.asarray(se3.from_xyz_yaw(*pos, yaw)))
    for k in range(n - 1):
        if k in (3, 7, 11):
            yaw += np.pi / 2
        pos = pos + np.array([np.cos(yaw), np.sin(yaw), 0.0])
        truth.append(np.asarray(se3.from_xyz_yaw(*pos, yaw)))
    rng = np.random.default_rng(7)
    s = _build_odometry_chain(s, truth, noise_rng=rng, sigma=0.03)
    # loop closure: measured relative pose between slot 0 and slot n-1 (truth)
    rel = se3.between(jnp.asarray(truth[0]), jnp.asarray(truth[-1]))
    s = s._replace(
        bf_i=s.bf_i.at[0].set(0),
        bf_j=s.bf_j.at[0].set(n - 1),
        bf_rel=s.bf_rel.at[0].set(rel),
        bf_sigma=s.bf_sigma.at[0].set(0.001),
        bf_count=jnp.int32(1),
    )
    # initialize poses by integrating the noisy odometry (realistic drift)
    drifted = [jnp.asarray(truth[0])]
    for i in range(1, n):
        drifted.append(se3.compose(drifted[-1], s.odom_rel[i]))
    s = s._replace(poses=s.poses.at[0:n].set(jnp.stack(drifted)))
    drift_before = float(jnp.linalg.norm(
        se3.trans(s.poses[n - 1]) - jnp.asarray(truth[-1][4:7])))
    out = solver.solve(s, cyl_sigma=400.0, bearing_sigma=1.0,
                       outer_iters=6, pcg_iters=128)
    drift_after = float(jnp.linalg.norm(
        se3.trans(out.poses[n - 1]) - jnp.asarray(truth[-1][4:7])))
    assert drift_after < 0.05, (drift_before, drift_after)
    assert drift_after < drift_before * 0.5


def test_solver_cylinder_landmark_refinement():
    """A perturbed cylinder landmark observed from several poses converges to
    the measurement consensus."""
    cfg = small_cfg()
    s = empty_state(cfg)
    truth = [np.asarray(se3.from_xyz_yaw(float(i), 0.0, 0.0, 0.0))
             for i in range(5)]
    s = _build_odometry_chain(s, truth)
    lm_true = jnp.array([0.0, 0.0, 1.0, 2.0, 3.0, 0.0, 0.3])
    # factors: exact body-frame measurements from each pose
    n = 5
    meas = jnp.stack([res.cylinder_to_local(lm_true, jnp.asarray(truth[i]))
                      for i in range(n)])
    s = s._replace(
        cf_pose=s.cf_pose.at[:n].set(jnp.arange(n, dtype=jnp.int32)),
        cf_lm=s.cf_lm.at[:n].set(0),
        cf_meas=s.cf_meas.at[:n].set(meas),
        cf_count=jnp.int32(n),
        # landmark initialized off-truth
        cyl_ray=s.cyl_ray.at[0].set(lm_true[0:3] + jnp.array([0.05, 0.0, 0.0])),
        cyl_root=s.cyl_root.at[0].set(lm_true[3:6] + jnp.array([0.4, -0.3, 0.2])),
        cyl_radius=s.cyl_radius.at[0].set(lm_true[6] + 0.1),
        cyl_count=jnp.int32(1),
    )
    out = solver.solve(s, cyl_sigma=400.0, bearing_sigma=1.0,
                       outer_iters=6, pcg_iters=64)
    np.testing.assert_allclose(np.asarray(out.cyl_root[0]),
                               np.asarray(lm_true[3:6]), atol=1e-2)
    np.testing.assert_allclose(float(out.cyl_radius[0]), 0.3, atol=1e-2)


def test_solver_jit_compiles():
    cfg = small_cfg()
    s = empty_state(cfg)
    truth = [np.asarray(se3.from_xyz_yaw(float(i), 0.0, 0.0, 0.0))
             for i in range(4)]
    s = _build_odometry_chain(s, truth)
    f = jax.jit(lambda st: solver.solve(
        st, cyl_sigma=400.0, bearing_sigma=1.0, outer_iters=1, pcg_iters=8))
    out = f(s)
    assert out.poses.shape == s.poses.shape
