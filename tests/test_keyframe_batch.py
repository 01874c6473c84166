"""Batched keyframe integration (engine.keyframe_batch_fused /
SlamNode.process_keyframe_batch) must match the sequential per-keyframe
path: the batch is a lax.scan whose body IS the fused step (DA + insert +
per-keyframe incremental solve), so device state after a batch of B must
equal B one-at-a-time dispatches."""
import jax.tree_util as jtu
import numpy as np

from slide_slam_tpu.config import CapacityConfig, SlamConfig
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.runtime.node import SlamNode


def _cfg():
    return SlamConfig(
        number_of_robots=1,
        capacity=CapacityConfig(
            max_poses_per_robot=64, max_cylinders=128, max_cuboids=64,
            max_points=64, max_scan_objects=16, max_cylinder_factors=1024,
            max_cuboid_factors=256, max_point_factors=256,
            max_between_factors=8),
    )


def test_batch_matches_sequential():
    cfg = _cfg()
    rng = np.random.default_rng(5)
    world = synthetic.make_forest_world(rng, n_trees=30, n_poles=5, n_cars=5,
                                        extent=18.0)
    traj = synthetic.lawnmower_trajectory(30, extent=14.0, rows=2, step=1.5)
    log = synthetic.make_log(world, traj, odom_drift_sigma=0.01,
                             pos_noise=0.03, seed=2)

    seq = SlamNode(cfg, robot_id=0)
    for kf in log.keyframes:
        seq.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))

    bat = SlamNode(cfg, robot_id=0)
    B = bat.KEYFRAME_BATCH
    kfs = log.keyframes
    for lo in range(0, len(kfs), B):
        bat.process_keyframe_batch(
            [(kf.stamp, kf.odom_pose, vars(kf)) for kf in kfs[lo:lo + B]])

    a = jtu.tree_map(np.asarray, seq.state)
    b = jtu.tree_map(np.asarray, bat.state)
    assert int(a.pose_count[0]) == int(b.pose_count[0]) == len(kfs)
    assert int(a.cyl_count) == int(b.cyl_count)
    assert int(a.cf_count) == int(b.cf_count)
    # identical math, identical order -> near-bitwise pose agreement
    np.testing.assert_allclose(a.poses, b.poses, atol=1e-5)
    np.testing.assert_allclose(a.cyl_root, b.cyl_root, atol=1e-5)
    # host mirrors track the same stamps
    assert seq.key_stamps == bat.key_stamps


def test_partial_batch():
    """A trailing partial batch (padded, masked) adds exactly k keyframes."""
    cfg = _cfg()
    rng = np.random.default_rng(6)
    world = synthetic.make_forest_world(rng, n_trees=20, n_poles=4, n_cars=3,
                                        extent=15.0)
    traj = synthetic.lawnmower_trajectory(11, extent=10.0, rows=1, step=1.5)
    log = synthetic.make_log(world, traj, seed=3)
    node = SlamNode(cfg, robot_id=0)
    node.process_keyframe_batch(
        [(kf.stamp, kf.odom_pose, vars(kf)) for kf in log.keyframes[:8]])
    node.process_keyframe_batch(
        [(kf.stamp, kf.odom_pose, vars(kf)) for kf in log.keyframes[8:]])
    assert int(np.asarray(node.state.pose_count)[0]) == 11
    assert len(node.key_poses) == 11
