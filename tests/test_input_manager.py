"""InputManager main-loop tests (inputNode.cpp behaviors)."""
import numpy as np
import pytest

from slide_slam_tpu import native
from slide_slam_tpu.config import CapacityConfig, SlamConfig
from slide_slam_tpu.geometry import se3np
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.runtime.input_manager import InputManager
from slide_slam_tpu.runtime.node import SlamNode


def small_cfg():
    return SlamConfig(
        number_of_robots=2, odom_freq_filter=2, msg_delay_tolerance=0.5,
        capacity=CapacityConfig(
            max_poses_per_robot=64, max_cylinders=128, max_cuboids=64,
            max_points=64, max_scan_objects=32, max_cylinder_factors=512,
            max_cuboid_factors=256, max_point_factors=256,
            max_between_factors=16,
        ),
    )


def drive(use_native):
    cfg = small_cfg()
    rng = np.random.default_rng(0)
    world = synthetic.make_forest_world(rng, n_trees=30, n_poles=5, n_cars=5,
                                        extent=20.0)
    traj = synthetic.lawnmower_trajectory(15, extent=16.0, rows=1, step=1.5)
    log = synthetic.make_log(world, traj, dt=1.0)
    node = SlamNode(cfg, robot_id=0)
    im = InputManager(cfg, node, use_native=use_native)
    t = log.keyframes[0].stamp
    for kf in log.keyframes:
        # raw odometry at 2x the keyframe rate (filter keeps 1/2)
        for k in range(4):
            im.on_odometry(kf.stamp - 0.4 + 0.1 * k, kf.odom_pose)
        im.on_observation(kf.stamp, kf.odom_pose, vars(kf))
        im.high_freq_pose(kf.stamp, kf.odom_pose)
        im.tick(kf.stamp + 1.0)
    im.tick(log.keyframes[-1].stamp + 10.0)
    return node, im, log


@pytest.mark.parametrize("use_native", [
    False,
    pytest.param(True, marks=pytest.mark.skipif(
        not native.available(), reason="no toolchain")),
])
def test_main_loop_integrates_observations(use_native):
    node, im, log = drive(use_native)
    # every observation keyframe got integrated
    assert len(node.key_poses) >= len(log.keyframes) - 1
    assert node.landmark_counts()["cylinders"] > 5
    est = node.optimized_trajectory()
    truth = np.stack([k.true_pose for k in log.keyframes])
    ate = synthetic.ate_rmse(est, truth[:len(est)], align=False)
    assert ate < 1.0


def test_high_freq_pose_drift_compensation():
    cfg = small_cfg()
    node = SlamNode(cfg, robot_id=0)
    im = InputManager(cfg, node)
    vio = se3np.from_xyz_yaw(1.0, 2.0, 0.0, 0.1)
    out = im.high_freq_pose(0.0, vio)
    # without a key pose yet, high-freq == vio and slam_to_vio == identity
    np.testing.assert_allclose(out.pose, vio, atol=1e-6)
    np.testing.assert_allclose(out.slam_to_vio, se3np.identity(), atol=1e-6)


def test_odom_freq_filter():
    cfg = small_cfg()
    node = SlamNode(cfg, robot_id=0)
    im = InputManager(cfg, node)
    for i in range(10):
        im.on_odometry(float(i), se3np.from_xyz_yaw(i * 1.0, 0, 0, 0))
    # filter = 2 -> only every 2nd message queued
    assert len(im.odom_queue) == 5
