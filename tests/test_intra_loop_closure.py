"""Intra-robot loop closure E2E: a drifting loop trajectory must be
corrected when the robot revisits the start (sloamNode.cpp:355-486 path)."""
import numpy as np
import pytest

from slide_slam_tpu.config import CapacityConfig, SlamConfig, PlaceRecognitionConfig
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.place_recognition.slidematch import SlideMatchDims
from slide_slam_tpu.runtime.node import SlamNode


def lc_cfg():
    return SlamConfig(
        number_of_robots=2,
        lc_candidate_min_poses_old=40,
        lc_min_pose_idx=10,
        capacity=CapacityConfig(
            max_poses_per_robot=128, max_cylinders=512, max_cuboids=256,
            max_points=128, max_scan_objects=48, max_cylinder_factors=4096,
            max_cuboid_factors=2048, max_point_factors=1024,
            max_between_factors=32,
        ),
        place_recognition=PlaceRecognitionConfig(
            search_xy_step_size=0.25, search_yaw_step_size_degrees=5.0,
            match_threshold_position=0.75, min_num_inliers=6,
            min_num_map_objects_to_start=5,
            match_x_half_range_intra=6.0, match_y_half_range_intra=6.0,
            match_yaw_half_range_intra=15.0,
        ),
    )


@pytest.mark.slow
def test_loop_closure_reduces_drift():
    cfg = lc_cfg()
    rng = np.random.default_rng(3)
    world = synthetic.make_forest_world(rng, n_trees=80, n_poles=12,
                                        n_cars=10, extent=35.0)
    traj = synthetic.loop_trajectory(90, radius=22.0)
    log = synthetic.make_log(world, traj, odom_drift_sigma=0.012,
                             yaw_drift_bias=0.0015, pos_noise=0.02,
                             dropout=0.05, max_range=18.0, seed=5)
    dims = SlideMatchDims(fine_grid=512, max_objects=256,
                          n_yaw=24, rescore_topk=32)
    node = SlamNode(cfg, robot_id=0, slidematch_dims=dims)
    attempted = succeeded = 0
    for i, kf in enumerate(log.keyframes):
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
        if i > 60 and i % 3 == 0:
            before = node.num_attempts_intra
            node.attempt_intra_loop_closure()
            attempted += node.num_attempts_intra - before
    assert node.num_attempts_intra > 0, "never entered a loop-closure region"
    assert node.num_success_intra >= 1, (
        f"no successful intra loop closure in {node.num_attempts_intra} attempts")
    est = node.optimized_trajectory()
    odom = np.stack([kf.odom_pose for kf in log.keyframes])
    truth = traj[:len(est)]
    ate_est = synthetic.ate_rmse(est, truth, align=False)
    ate_odom = synthetic.ate_rmse(odom, traj, align=False)
    # closure + object landmarks must beat dead reckoning clearly
    assert ate_est < ate_odom * 0.8, (ate_est, ate_odom)


@pytest.mark.slow
def test_closure_tf_accuracy():
    """The accepted closure's relative pose must be close to ground truth.

    Guards the composition deviation documented in
    slidematch.find_intra_loop_closure: the corrected query pose is
    q* = lc_tf ∘ q (LEFT map-frame correction), so the closure relative is
    c^-1 ∘ lc_tf ∘ q — NOT the reference's (c^-1 q) ∘ lc_tf
    (place_recognition.cpp:480-495), which diverges under yaw drift."""
    from slide_slam_tpu.geometry import se3np

    cfg = lc_cfg()
    rng = np.random.default_rng(3)
    world = synthetic.make_forest_world(rng, n_trees=80, n_poles=12,
                                        n_cars=10, extent=35.0)
    traj = synthetic.loop_trajectory(90, radius=22.0)
    log = synthetic.make_log(world, traj, odom_drift_sigma=0.012,
                             yaw_drift_bias=0.0015, pos_noise=0.02,
                             dropout=0.05, max_range=18.0, seed=5)
    dims = SlideMatchDims(fine_grid=512, max_objects=256,
                          n_yaw=24, rescore_topk=32)
    node = SlamNode(cfg, robot_id=0, slidematch_dims=dims)

    errors = []
    orig = SlamNode.add_loop_closure_factor

    def spy(self, prev_idx, r1, cur_idx, r2, rel, **kw):
        true_rel = se3np.between(log.keyframes[prev_idx].true_pose,
                                 log.keyframes[cur_idx].true_pose)
        errors.append(float(np.linalg.norm(
            np.asarray(rel)[4:7] - true_rel[4:7])))
        return orig(self, prev_idx, r1, cur_idx, r2, rel, **kw)

    node.add_loop_closure_factor = spy.__get__(node)
    for i, kf in enumerate(log.keyframes):
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
        if i > 60 and i % 3 == 0:
            node.attempt_intra_loop_closure()
    assert errors, "no closure fired"
    assert max(errors) < 1.0, errors
