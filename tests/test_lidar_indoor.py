"""Indoor-LiDAR pipeline tests (process_cloud_node_lidar_indoor.py parity).

Synthetic segmented indoor scans (floor + chairs + table) flow through
range gating, ground RANSAC, ground-distance gating, two-layer clustering,
tracking, and min/max-extent cuboid finalization into body-frame centroid
(range-bearing) measurements — the indoor landmark convention."""
import numpy as np
import pytest

from slide_slam_tpu.frontend.lidar_indoor import (IndoorLidarConfig,
                                                  IndoorLidarPipeline)
from slide_slam_tpu.geometry import se3np

CHAIR_RAW, TABLE_RAW, FLOOR_RAW = 3, 4, 2
CHAIR, TABLE = 1, 2


def box_points(rng, center, dims, n):
    return (np.asarray(center)[None]
            + rng.uniform(-0.5, 0.5, (n, 3)) * np.asarray(dims)[None])


def make_scan(rng, sensor_xyz, n_floor=600):
    """Floor + 2 chairs + 1 table, labeled like the segmentation output."""
    floor = np.column_stack([
        rng.uniform(-8, 8, n_floor) + sensor_xyz[0],
        rng.uniform(-8, 8, n_floor) + sensor_xyz[1],
        rng.normal(0.0, 0.01, n_floor)])
    chairs = [box_points(rng, [2.0, 1.0, 0.45], [0.5, 0.5, 0.9], 220),
              box_points(rng, [4.0, -2.0, 0.45], [0.5, 0.5, 0.9], 220)]
    table = box_points(rng, [-1.5, 3.0, 0.55], [1.6, 0.9, 0.7], 300)
    xyz = np.vstack([floor] + chairs + [table]).astype(np.float32)
    labels = np.concatenate([
        np.full(n_floor, FLOOR_RAW),
        np.full(440, CHAIR_RAW),
        np.full(300, TABLE_RAW)])
    return xyz, labels


def run_pipeline(n_scans=5):
    rng = np.random.default_rng(3)
    pipe = IndoorLidarPipeline(IndoorLidarConfig())
    pose = np.asarray(se3np.from_xyz_yaw(0.0, 0.0, 0.6, 0.0), np.float32)
    obs = {}
    for _ in range(n_scans):
        xyz, labels = make_scan(rng, pose[4:7])
        obs = pipe.process_scan(xyz, labels, pose)
    return pipe, pose, obs


def test_emits_centroid_measurements_with_unified_labels():
    _, pose, obs = run_pipeline()
    assert "ell_pose" in obs, "no centroid measurements emitted"
    labs = obs["ell_label"]
    assert (labs == CHAIR).sum() == 2
    assert (labs == TABLE).sum() == 1
    # body-frame positions match the known world layout
    world = {tuple(np.round(c, 1)): l for c, l in
             [([2.0, 1.0, 0.45], CHAIR), ([4.0, -2.0, 0.45], CHAIR),
              ([-1.5, 3.0, 0.55], TABLE)]}
    mat = se3np.matrix(pose)
    for p, lab in zip(obs["ell_pose"], labs):
        w = (mat @ np.concatenate([p[4:7], [1.0]]))[:3]
        best = min(world, key=lambda c: np.linalg.norm(w - c))
        assert np.linalg.norm(w - np.asarray(best)) < 0.25
        assert world[best] == lab
    # indoor min/max extents recover the box dims
    for s, lab in zip(obs["ell_scale"], labs):
        want = [0.5, 0.5, 0.9] if lab == CHAIR else [1.6, 0.9, 0.7]
        assert np.allclose(sorted(s), sorted(want), atol=0.25), (s, want)


def test_ground_points_do_not_become_objects():
    """Points below the ground gate never cluster into landmarks."""
    rng = np.random.default_rng(4)
    pipe = IndoorLidarPipeline(IndoorLidarConfig())
    pose = np.asarray(se3np.from_xyz_yaw(0, 0, 0.6, 0.0), np.float32)
    for _ in range(5):
        # chair-labeled points AT floor height: should be gated out
        floor = np.column_stack([rng.uniform(-5, 5, 400),
                                 rng.uniform(-5, 5, 400),
                                 rng.normal(0, 0.01, 400)])
        low = box_points(rng, [2.0, 1.0, 0.03], [0.5, 0.5, 0.05], 200)
        xyz = np.vstack([floor, low]).astype(np.float32)
        labels = np.concatenate([np.full(400, FLOOR_RAW),
                                 np.full(200, CHAIR_RAW)])
        obs = pipe.process_scan(xyz, labels, pose)
    assert obs == {}


def test_lost_tracks_expire():
    rng = np.random.default_rng(5)
    cfg = IndoorLidarConfig(num_lost_track_times_thresh=2)
    pipe = IndoorLidarPipeline(cfg)
    pose = np.asarray(se3np.from_xyz_yaw(0, 0, 0.6, 0.0), np.float32)
    for _ in range(4):
        xyz, labels = make_scan(rng, pose[4:7])
        pipe.process_scan(xyz, labels, pose)
    assert len(pipe.tracker.tracks) == 3
    # object disappears from view: only floor remains
    for _ in range(4):
        floor = np.column_stack([rng.uniform(-5, 5, 400),
                                 rng.uniform(-5, 5, 400),
                                 rng.normal(0, 0.01, 400)]).astype(np.float32)
        pipe.process_scan(floor, np.full(400, FLOOR_RAW), pose)
    assert len(pipe.tracker.tracks) == 0


def test_backend_consumes_indoor_measurements():
    """The emitted dict feeds SlamNode.process_keyframe directly (the
    sync_centroid_odom -> backend path), producing point landmarks."""
    from slide_slam_tpu.config import CapacityConfig, SlamConfig
    from slide_slam_tpu.runtime.node import SlamNode

    cfg = SlamConfig(
        number_of_robots=1,
        capacity=CapacityConfig(
            max_poses_per_robot=16, max_cylinders=64, max_cuboids=32,
            max_points=32, max_scan_objects=8, max_cylinder_factors=128,
            max_cuboid_factors=64, max_point_factors=64,
            max_between_factors=8))
    node = SlamNode(cfg, 0)
    rng = np.random.default_rng(6)
    pipe = IndoorLidarPipeline(IndoorLidarConfig())
    for k in range(5):
        pose = np.asarray(se3np.from_xyz_yaw(0.6 * k, 0.0, 0.6, 0.0),
                          np.float32)
        xyz, labels = make_scan(rng, pose[4:7])
        obs = pipe.process_scan(xyz, labels, pose)
        node.process_keyframe(1000.0 + 0.5 * k, pose, obs)
    assert node.landmark_counts()["points"] == 3
