"""Checkpoint / resume round-trip."""
import numpy as np

from slide_slam_tpu.config import CapacityConfig, SlamConfig
from slide_slam_tpu.io import checkpoint, synthetic
from slide_slam_tpu.runtime.node import SlamNode


def test_node_checkpoint_roundtrip(tmp_path):
    cfg = SlamConfig(
        number_of_robots=2,
        capacity=CapacityConfig(
            max_poses_per_robot=64, max_cylinders=128, max_cuboids=64,
            max_points=64, max_scan_objects=32, max_cylinder_factors=512,
            max_cuboid_factors=256, max_point_factors=256,
            max_between_factors=16,
        ),
    )
    rng = np.random.default_rng(0)
    world = synthetic.make_forest_world(rng, n_trees=25, n_poles=5, n_cars=5,
                                        extent=20.0)
    traj = synthetic.lawnmower_trajectory(16, extent=16.0, rows=1, step=1.5)
    log = synthetic.make_log(world, traj, odom_drift_sigma=0.01)
    node = SlamNode(cfg, robot_id=0)
    for kf in log.keyframes[:10]:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))

    ckpt = str(tmp_path / "ckpt")
    checkpoint.save_node(ckpt, node)
    node2 = checkpoint.load_node(ckpt, cfg)

    np.testing.assert_allclose(node2.optimized_trajectory(),
                               node.optimized_trajectory(), atol=1e-6)
    assert node2.landmark_counts() == node.landmark_counts()
    assert len(node2.dbm.host_record().packets) == 10

    # resuming processing continues seamlessly
    for kf in log.keyframes[10:]:
        p1 = node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
        p2 = node2.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    np.testing.assert_allclose(node2.optimized_trajectory(),
                               node.optimized_trajectory(), atol=1e-4)
