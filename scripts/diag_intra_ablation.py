"""Solo intra-LC ablation on the bench loop mission (VERDICT r4 ask #7):
robot0's two-lap loop with and without intra closures, current gates.
Run: JAX_PLATFORMS=cpu python scripts/diag_intra_ablation.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from slide_slam_tpu.config import SlamConfig, mission_capacity, realtime_solver
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.runtime.mission import MultiRobotMission
import bench


def main():
    cfg = SlamConfig(number_of_robots=3, capacity=mission_capacity(150),
                     solver=realtime_solver(),
                     intra_robot_place_recognition_frequency=0.2)
    rng = np.random.default_rng(7)
    world = synthetic.make_forest_world(rng, n_trees=110, n_poles=18,
                                        n_cars=12, extent=40.0)
    traj = synthetic.loop_trajectory(150, radius=13.0, laps=2.0)
    log = synthetic.make_log(world, traj, robot_id=0, seed=3,
                             odom_drift_sigma=0.012, pos_noise=0.03,
                             dropout=0.1, yaw_drift_bias=0.0008)
    odom = np.stack([kf.odom_pose for kf in log.keyframes])
    print(f"odom ATE: {synthetic.ate_rmse(odom, traj[:len(odom)], align=False):.3f}")
    bench._warm_mission_kernels(cfg, [log], [])
    for flag in (True, False):
        m = MultiRobotMission(cfg, [log], async_runtime=False)
        rep = m.run(intra_lc=flag)
        n = rep.nodes[0]
        est = n.optimized_trajectory()
        ate = synthetic.ate_rmse(est, traj[:len(est)], align=False)
        print(f"intra={flag}: ate={ate:.3f} successes={n.num_success_intra}"
              f"/{n.num_attempts_intra} overflow="
              f"{ {k: v for k, v in n.overflow_report().items() if v} }")


if __name__ == "__main__":
    main()
