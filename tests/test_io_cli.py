"""Log persistence + CLI smoke tests."""
import json
import os

import numpy as np

from slide_slam_tpu.io import logs, synthetic


def test_log_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    world = synthetic.make_forest_world(rng, n_trees=20, n_poles=5, n_cars=5,
                                        extent=20.0)
    traj = synthetic.lawnmower_trajectory(10, extent=15.0, rows=1, step=2.0)
    log = synthetic.make_log(world, traj)
    path = str(tmp_path / "log.npz")
    logs.save_log(path, log)
    log2 = logs.load_log(path)
    assert len(log2.keyframes) == len(log.keyframes)
    for a, b in zip(log.keyframes, log2.keyframes):
        assert a.stamp == b.stamp
        np.testing.assert_allclose(a.odom_pose, b.odom_pose)
        np.testing.assert_allclose(a.cyl_root, b.cyl_root)
        np.testing.assert_array_equal(a.cub_label, b.cub_label)


def test_cli_gen_and_eval(tmp_path):
    from slide_slam_tpu.cli import main

    out = str(tmp_path / "data")
    main(["gen-logs", "--out", out, "--robots", "1", "--keyframes", "8",
          "--trees", "20", "--poles", "4", "--cars", "4"])
    assert os.path.exists(os.path.join(out, "robot0.npz"))
    # eval against a perfect trajectory written from ground truth
    log = logs.load_log(os.path.join(out, "robot0.npz"))
    tpath = str(tmp_path / "traj.txt")
    with open(tpath, "w") as f:
        for kf in log.keyframes:
            qw, qx, qy, qz, x, y, z = kf.true_pose
            f.write(f"{kf.stamp} {x} {y} {z} {qx} {qy} {qz} {qw}\n")
    main(["eval", "--traj", tpath, "--log", os.path.join(out, "robot0.npz")])
