"""Raw-LiDAR frontend E2E: simulated scans -> segmentation -> objects ->
backend keyframes (BASELINE config 3)."""
import numpy as np
import pytest

from slide_slam_tpu.config import CapacityConfig, SlamConfig
from slide_slam_tpu.frontend.lidar_pipeline import (LidarFrontend,
                                                    LidarFrontendConfig,
                                                    ground_truth_segmenter)
from slide_slam_tpu.frontend.pipeline import PipelineConfig
from slide_slam_tpu.geometry import se3np
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.runtime.node import SlamNode


def simulate_lidar_scan(world, pose7, rng, max_range=20.0,
                        rays_per_tree=60, ground_pts=600):
    """Body-frame point cloud sampling ground + tree trunks + car shells."""
    pts_w = []
    # ground disk
    ang = rng.uniform(0, 2 * np.pi, ground_pts)
    rad = np.sqrt(rng.uniform(0.5, 1.0, ground_pts)) * max_range
    gx = pose7[4] + rad * np.cos(ang)
    gy = pose7[5] + rad * np.sin(ang)
    pts_w.append(np.column_stack([gx, gy, np.zeros(ground_pts)]))
    for root, radius in zip(world.cyl_root, world.cyl_radius):
        if np.linalg.norm(root[:2] - pose7[4:6]) < max_range:
            th = rng.uniform(0, 2 * np.pi, rays_per_tree)
            z = rng.uniform(0.1, 5.0, rays_per_tree)
            pts_w.append(np.column_stack([
                root[0] + radius * np.cos(th), root[1] + radius * np.sin(th),
                z]))
    for pose_c, scale in zip(world.cub_pose, world.cub_scale):
        if np.linalg.norm(pose_c[4:6] - pose7[4:6]) < max_range:
            local = rng.uniform(-0.5, 0.5, (rays_per_tree, 3)) * scale
            local[:, 2] += scale[2] / 2
            yaw = se3np.yaw_of(pose_c)
            cs, sn = np.cos(yaw), np.sin(yaw)
            wx = cs * local[:, 0] - sn * local[:, 1] + pose_c[4]
            wy = sn * local[:, 0] + cs * local[:, 1] + pose_c[5]
            pts_w.append(np.column_stack([wx, wy, local[:, 2]]))
    pts_w = np.concatenate(pts_w).astype(np.float32)
    inv = se3np.inverse(np.asarray(pose7, np.float32))
    return se3np.apply(inv, pts_w)


@pytest.mark.slow
def test_raw_lidar_to_backend():
    rng = np.random.default_rng(4)
    world = synthetic.make_forest_world(rng, n_trees=14, n_poles=0, n_cars=3,
                                        extent=14.0)
    world.ell_pos = world.ell_pos[:0]      # lidar path: no RGBD objects
    traj = synthetic.lawnmower_trajectory(12, extent=10.0, rows=1, step=1.8)

    pose_holder = {"pose": traj[0]}
    frontend = LidarFrontend(
        ground_truth_segmenter(world, lambda: pose_holder["pose"]),
        LidarFrontendConfig(height=32, width=512, desired_period=0.0),
        PipelineConfig(max_points_per_class=1024, max_range=22.0))
    cfg = SlamConfig(
        number_of_robots=2,
        capacity=CapacityConfig(
            max_poses_per_robot=32, max_cylinders=128, max_cuboids=64,
            max_points=32, max_scan_objects=32, max_cylinder_factors=512,
            max_cuboid_factors=128, max_point_factors=64,
            max_between_factors=8,
        ))
    node = SlamNode(cfg, robot_id=0)
    n_cyl_meas = 0
    for i, pose in enumerate(traj):
        pose_holder["pose"] = pose
        scan = simulate_lidar_scan(world, pose, rng)
        rem = np.zeros(len(scan), np.float32)
        obs = frontend.process_scan(1000.0 + 0.5 * i, scan, rem, pose)
        assert obs is not None
        n_cyl_meas += len(obs.get("cyl_root", []))
        node.process_keyframe(1000.0 + 0.5 * i, pose, obs)
    assert n_cyl_meas > 5, "frontend produced no cylinder measurements"
    counts = node.landmark_counts()
    assert counts["cylinders"] >= 4
    # mapped trees near true trees
    est_roots = np.asarray(node.state.cyl_root)[:counts["cylinders"]]
    errs = [np.linalg.norm(world.cyl_root[:, :2] - r[:2], axis=1).min()
            for r in est_roots]
    assert np.median(errs) < 0.7, np.median(errs)


def test_throttle():
    frontend = LidarFrontend(lambda x: np.zeros((1, 32, 512), np.int32),
                             LidarFrontendConfig(height=32, width=512,
                                                 desired_period=0.5))
    pose = se3np.identity()
    pts = np.random.default_rng(0).normal(0, 5, (100, 3)).astype(np.float32)
    rem = np.zeros(100, np.float32)
    assert frontend.process_scan(0.0, pts, rem, pose) is not None
    assert frontend.process_scan(0.2, pts, rem, pose) is None   # throttled
    assert frontend.process_scan(0.6, pts, rem, pose) is not None


@pytest.mark.slow
def test_net_in_the_loop():
    """Raw clouds -> projection -> TRAINED flax net -> unprojection ->
    clustering -> backend (VERDICT r2 ask #5): the L2 chain must compose
    with a real network in the loop, not the ground-truth labeler
    (infer_node.py:119-318 -> process_cloud_node_outdoor.py:222-468)."""
    from slide_slam_tpu.frontend import train_segmentation as ts
    from slide_slam_tpu.frontend.segmentation import RangeSegmentator, segment

    rng = np.random.default_rng(4)
    world = synthetic.make_forest_world(rng, n_trees=14, n_poles=0, n_cars=3,
                                        extent=14.0)
    world.ell_pos = world.ell_pos[:0]
    traj = synthetic.lawnmower_trajectory(12, extent=10.0, rows=1, step=1.8)
    H, W = 32, 256

    # --- train on scans from the first 8 poses, labeled by the GT labeler
    pose_holder = {"pose": traj[0]}
    labeler = ground_truth_segmenter(world, lambda: pose_holder["pose"])
    scans, poses = [], []
    for pose in traj[:8]:
        pose_holder["pose"] = pose
        scans.append(simulate_lidar_scan(world, pose, rng))
        poses.append(pose)

    def gt_label(x, _i=[0]):
        pose_holder["pose"] = poses[_i[0]]
        _i[0] += 1
        return labeler(x)

    inputs, labels, valid = ts.make_synthetic_dataset(
        scans, poses, gt_label, height=H, width=W)
    model = RangeSegmentator(num_classes=10, stage_blocks=(1, 1))
    variables, metrics = ts.train_segmentator(model, inputs, labels, valid,
                                              steps=120, lr=2e-3, batch=2)
    pred = segment(model, variables, inputs)
    iou = ts.mean_iou(pred, labels, valid, 10)
    assert iou > 0.55, (iou, metrics)

    # --- E2E with the trained net as the segmenter
    frontend = LidarFrontend(
        lambda x: segment(model, variables, x),
        LidarFrontendConfig(height=H, width=W, desired_period=0.0),
        PipelineConfig(max_points_per_class=1024, max_range=22.0))
    cfg = SlamConfig(
        number_of_robots=1,
        capacity=CapacityConfig(
            max_poses_per_robot=32, max_cylinders=128, max_cuboids=64,
            max_points=32, max_scan_objects=32, max_cylinder_factors=512,
            max_cuboid_factors=128, max_point_factors=64,
            max_between_factors=8,
        ))
    node = SlamNode(cfg, robot_id=0)
    n_cyl_meas = 0
    for i, pose in enumerate(traj):
        scan = simulate_lidar_scan(world, pose, rng)
        rem = np.zeros(len(scan), np.float32)
        obs = frontend.process_scan(1000.0 + 0.5 * i, scan, rem, pose)
        assert obs is not None
        n_cyl_meas += len(obs.get("cyl_root", []))
        node.process_keyframe(1000.0 + 0.5 * i, pose, obs)
    assert n_cyl_meas > 5, "net-in-loop frontend produced no cylinders"
    counts = node.landmark_counts()
    assert counts["cylinders"] >= 4
    est_roots = np.asarray(node.state.cyl_root)[:counts["cylinders"]]
    errs = [np.linalg.norm(world.cyl_root[:, :2] - r[:2], axis=1).min()
            for r in est_roots]
    assert np.median(errs) < 0.9, np.median(errs)
    est = node.optimized_trajectory()
    ate = synthetic.ate_rmse(est, traj[:len(est)], align=False)
    assert ate < 0.5, ate
