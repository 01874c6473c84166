"""Benchmark: end-to-end keyframe throughput of the SLAM engine on TPU.

Replays a synthetic forest measurement log (the processed-bag-equivalent
workload of BASELINE.md) through the full per-keyframe path — submap query,
semantic data association, landmark/factor insertion, and the incremental
Gauss-Newton solve (the reference's iSAM2 stage) — and reports steady-state
keyframes/second.

Baseline: the reference's real-time budget is its 5 Hz main loop
(sloam.yaml:12) with per-keyframe iSAM2 solves on CPU; `vs_baseline` is
throughput relative to that 5 kf/s requirement.

Prints ONE JSON line.
"""
import json
import time

import numpy as np


def main():
    from slide_slam_tpu.config import SlamConfig
    from slide_slam_tpu.io import synthetic
    from slide_slam_tpu.runtime.node import SlamNode

    cfg = SlamConfig(number_of_robots=3)
    rng = np.random.default_rng(0)
    world = synthetic.make_forest_world(rng, n_trees=120, n_poles=20,
                                        n_cars=15, extent=45.0)
    traj = synthetic.lawnmower_trajectory(220, extent=40.0, rows=4, step=1.5)
    log = synthetic.make_log(world, traj, odom_drift_sigma=0.01,
                             pos_noise=0.03, dropout=0.1)

    # warmup: compile + first steps
    node = SlamNode(cfg, robot_id=0)
    for kf in log.keyframes[:12]:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))

    # timed steady-state run on a fresh node (same compiled functions)
    node = SlamNode(cfg, robot_id=0)
    n_warm = 8
    for kf in log.keyframes[:n_warm]:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    kfs = log.keyframes[n_warm:]
    t0 = time.perf_counter()
    for kf in kfs:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    dt = time.perf_counter() - t0
    kf_per_sec = len(kfs) / dt

    est = node.optimized_trajectory()
    ate = synthetic.ate_rmse(est, traj[:len(est)], align=False)

    result = {
        "metric": "keyframes_per_sec",
        "value": round(kf_per_sec, 2),
        "unit": "kf/s",
        "vs_baseline": round(kf_per_sec / 5.0, 2),
        "extra": {
            "n_keyframes": len(kfs),
            "ate_rmse_m": round(float(ate), 4),
            "landmarks": node.landmark_counts(),
            "mean_step_ms": round(1000.0 * dt / len(kfs), 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
