"""Indoor RGBD-style E2E: centroid (ellipsoid) landmarks via range-bearing
factors dominate, as in the reference's indoor demos (sync_centroid_odom.py
routes RGBD objects to ellipsoid_factors; graphWrapper.cpp:159-202)."""
import numpy as np
import pytest

from slide_slam_tpu.config import CapacityConfig, SlamConfig
from slide_slam_tpu.geometry import se3np
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.runtime.node import SlamNode


def indoor_world(rng, n_chairs=14, n_tables=8, extent=8.0):
    n = n_chairs + n_tables
    pos = np.concatenate([rng.uniform(-extent, extent, (n, 2)),
                          rng.uniform(0.3, 0.8, (n, 1))], axis=1)
    scale = np.concatenate([
        rng.uniform(0.4, 0.7, (n_chairs, 3)),
        rng.uniform(0.9, 1.6, (n_tables, 3))])
    label = np.concatenate([
        np.full(n_chairs, synthetic.CHAIR), np.full(n_tables, synthetic.TABLE)])
    return synthetic.World(
        cyl_root=np.zeros((0, 3), np.float32),
        cyl_ray=np.zeros((0, 3), np.float32),
        cyl_radius=np.zeros((0,), np.float32),
        cyl_label=np.zeros((0,), np.int32),
        cub_pose=np.zeros((0, 7), np.float32),
        cub_scale=np.zeros((0, 3), np.float32),
        cub_label=np.zeros((0,), np.int32),
        ell_pos=pos.astype(np.float32),
        ell_scale=scale.astype(np.float32),
        ell_label=label.astype(np.int32),
    )


def indoor_cfg():
    return SlamConfig(
        number_of_robots=2, ellipsoid_match_thresh=0.75,
        capacity=CapacityConfig(
            max_poses_per_robot=128, max_cylinders=32, max_cuboids=32,
            max_points=128, max_scan_objects=32, max_cylinder_factors=64,
            max_cuboid_factors=64, max_point_factors=2048,
            max_between_factors=16,
        ),
    )


def test_indoor_centroid_slam():
    cfg = indoor_cfg()
    rng = np.random.default_rng(9)
    world = indoor_world(rng)
    traj = synthetic.lawnmower_trajectory(50, extent=7.0, rows=3, step=0.8)
    log = synthetic.make_log(world, traj, odom_drift_sigma=0.008,
                             pos_noise=0.02, dropout=0.1, max_range=6.0,
                             seed=2)
    node = SlamNode(cfg, robot_id=0)
    for kf in log.keyframes:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    counts = node.landmark_counts()
    assert counts["points"] >= 10, counts
    assert counts["points"] <= 22 + 6   # limited duplication
    # landmark positions converge near truth
    est_pts = np.asarray(node.state.pt_pos)[:counts["points"]]
    errs = []
    for p in est_pts:
        errs.append(np.linalg.norm(world.ell_pos - p, axis=1).min())
    assert np.median(errs) < 0.25, np.median(errs)
    # trajectory better than dead reckoning
    est = node.optimized_trajectory()
    odom = np.stack([kf.odom_pose for kf in log.keyframes])
    ate_est = synthetic.ate_rmse(est, traj[:len(est)], align=False)
    ate_odom = synthetic.ate_rmse(odom, traj, align=False)
    assert ate_est < ate_odom, (ate_est, ate_odom)


def test_rgbd_frontend_to_backend():
    """masks+depth -> backprojection -> instance clouds -> ellipsoid
    measurements -> backend (the full indoor RGBD path)."""
    import jax.numpy as jnp

    from slide_slam_tpu.frontend import rgbd

    cfg = indoor_cfg()
    node = SlamNode(cfg, robot_id=0)
    H, W = 48, 64
    fx = fy = 40.0
    cx, cy = W / 2, H / 2
    # one object at 2 m straight ahead (camera looks +z)
    depth = np.full((H, W), 2.0, np.float32)
    masks = np.zeros((1, H, W), bool)
    masks[0, 16:32, 24:40] = True
    cloud = rgbd.backproject(jnp.asarray(depth), jnp.asarray(masks),
                             jnp.asarray([synthetic.CHAIR], jnp.int32),
                             jnp.asarray([0.9]), fx, fy, cx, cy)
    pts, mask = rgbd.instance_points(cloud, 0, 512)
    centroid = pts[mask].mean(axis=0)
    scale = pts[mask].max(axis=0) - pts[mask].min(axis=0)
    # camera frame == body frame here; feed as ellipsoid measurement
    ell_pose = np.concatenate([[1, 0, 0, 0], centroid]).astype(np.float32)
    obs = {"ell_pose": ell_pose[None], "ell_scale": scale[None].astype(np.float32),
           "ell_label": np.array([synthetic.CHAIR], np.int32)}
    pose = se3np.identity()
    node.process_keyframe(0.0, pose, obs)
    node.process_keyframe(0.5, se3np.from_xyz_yaw(0.1, 0, 0, 0), obs)
    assert node.landmark_counts()["points"] >= 1
    lm = np.asarray(node.state.pt_pos[0])
    assert abs(lm[2] - 2.0) < 0.3   # depth recovered in world frame
