"""End-to-end single-robot engine tests on synthetic worlds.

This is the automated E2E accuracy test the reference lacks (SURVEY §4):
replay a measurement log, assert data-association / map quality and ATE."""
import jax.numpy as jnp
import numpy as np
import pytest

from slide_slam_tpu.config import CapacityConfig, SlamConfig
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.runtime.node import SlamNode


def small_cfg():
    return SlamConfig(
        number_of_robots=2,
        capacity=CapacityConfig(
            max_poses_per_robot=128, max_cylinders=256, max_cuboids=128,
            max_points=64, max_scan_objects=48, max_cylinder_factors=2048,
            max_cuboid_factors=1024, max_point_factors=512,
            max_between_factors=32,
        ),
    )


@pytest.fixture(scope="module")
def forest():
    rng = np.random.default_rng(42)
    return synthetic.make_forest_world(rng, n_trees=60, n_poles=10, n_cars=8,
                                       extent=30.0)


def test_perfect_odometry_replay(forest):
    """With exact odometry the estimated trajectory must match ground truth
    and the map must converge to (roughly) the true number of objects."""
    cfg = small_cfg()
    traj = synthetic.lawnmower_trajectory(60, extent=25.0, rows=3, step=2.0)
    log = synthetic.make_log(forest, traj, odom_drift_sigma=0.0,
                             pos_noise=0.02, dropout=0.05)
    node = SlamNode(cfg, robot_id=0)
    for kf in log.keyframes:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    est = node.optimized_trajectory()
    # measurement noise (pos_noise=0.02 on objects) pulls the optimum a few
    # cm off ground truth — that is the correct MAP estimate, not an error
    ate = synthetic.ate_rmse(est, traj, align=False)
    assert ate < 0.15, ate
    counts = node.landmark_counts()
    # every observed object should appear exactly once (no duplicates from DA)
    assert counts["cylinders"] <= 70 + 8   # <= world count + small slack
    assert counts["cylinders"] >= 30       # most of the visited area mapped
    assert counts["cuboids"] <= 8 + 3


def test_noisy_odometry_object_slam_beats_dead_reckoning(forest):
    """With drifting odometry, object landmarks must reduce ATE vs raw odom."""
    cfg = small_cfg()
    traj = synthetic.lawnmower_trajectory(60, extent=25.0, rows=3, step=2.0)
    log = synthetic.make_log(forest, traj, odom_drift_sigma=0.02,
                             yaw_drift_bias=0.002, pos_noise=0.02,
                             dropout=0.05, seed=3)
    node = SlamNode(cfg, robot_id=0)
    for kf in log.keyframes:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    est = node.optimized_trajectory()
    odom = np.stack([kf.odom_pose for kf in log.keyframes])
    ate_est = synthetic.ate_rmse(est, traj, align=False)
    ate_odom = synthetic.ate_rmse(odom, traj, align=False)
    assert ate_est < ate_odom, (ate_est, ate_odom)


def test_match_counts_are_reported(forest):
    cfg = small_cfg()
    traj = synthetic.lawnmower_trajectory(10, extent=25.0, rows=2, step=2.0)
    log = synthetic.make_log(forest, traj, pos_noise=0.01, dropout=0.0)
    node = SlamNode(cfg, robot_id=0)
    for kf in log.keyframes:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    # revisited objects should be matched, not duplicated: landmark count
    # far below total observation count
    n_obs = sum(len(kf.cyl_radius) for kf in log.keyframes)
    assert node.landmark_counts()["cylinders"] < n_obs * 0.6


def test_compact_map_format(forest):
    cfg = small_cfg()
    traj = synthetic.lawnmower_trajectory(6, extent=25.0, rows=1, step=2.0)
    log = synthetic.make_log(forest, traj)
    node = SlamNode(cfg, robot_id=0)
    for kf in log.keyframes:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    m = node.compact_map(min_hits=1)
    assert m.shape[1] == 7
    assert len(m) == sum(node.landmark_counts().values())
    # cylinder rows have dims [radius, 0, 0]
    cyl_rows = m[np.isin(m[:, 0].astype(int), [synthetic.TREE, synthetic.LIGHTPOLE])]
    assert np.all(cyl_rows[:, 5:7] == 0)
