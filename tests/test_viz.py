"""Visualization smoke tests (vizTools.cpp twin: maps, trajectories,
place-recognition matched pairs render without error and produce files)."""
import os

import numpy as np

from slide_slam_tpu import viz


def _map(n=20, seed=0):
    rng = np.random.default_rng(seed)
    m = np.zeros((n, 7), np.float32)
    m[:, 0] = rng.choice([5, 8, 9], n)
    m[:, 1:3] = rng.uniform(-20, 20, (n, 2))
    m[:, 4] = rng.uniform(0.2, 2.0, n)
    return m


def test_render_matched_maps(tmp_path):
    ref = _map()
    yaw = 0.4
    c, s = np.cos(yaw), np.sin(yaw)
    tf = np.eye(4)
    tf[:2, :2] = [[c, -s], [s, c]]
    tf[:2, 3] = [3.0, -1.0]
    qry = ref.copy()
    qry[:, 1:4] = (ref[:, 1:4] - tf[:3, 3]) @ tf[:3, :3]
    out = str(tmp_path / "match.png")
    p = viz.render_matched_maps(ref, qry, tf, ref_pairs=ref[:5],
                                det_pairs=qry[:5], path=out)
    assert p == out and os.path.getsize(out) > 1000


def test_render_mission_and_summary(tmp_path):
    from slide_slam_tpu.config import SlamConfig
    from slide_slam_tpu.io import synthetic
    from slide_slam_tpu.runtime.node import SlamNode

    rng = np.random.default_rng(1)
    world = synthetic.make_forest_world(rng, n_trees=20, n_poles=4,
                                        n_cars=4, extent=20.0)
    traj = synthetic.lawnmower_trajectory(10, extent=15.0, rows=2, step=1.5)
    log = synthetic.make_log(world, traj, odom_drift_sigma=0.005,
                             pos_noise=0.02, dropout=0.0)
    node = SlamNode(SlamConfig(number_of_robots=1), robot_id=0)
    for kf in log.keyframes:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    out = str(tmp_path / "mission.png")
    viz.render_mission([node], out_path=out)
    assert os.path.getsize(out) > 1000
    summary = viz.runtime_summary(node)
    assert "keyframes" in summary or len(summary) > 10
