"""Diagnose intra-LC: closure TF error vs ground truth + ATE with/without.

JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=1 \
    python scripts/diag_intra_lc.py
"""
import sys, os; sys.path.insert(0, os.getcwd())
import numpy as np

from slide_slam_tpu.config import SlamConfig, mission_capacity, realtime_solver
from slide_slam_tpu.geometry import se3np
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.runtime.mission import MultiRobotMission
from slide_slam_tpu.runtime.node import SlamNode

rng = np.random.default_rng(7)
world = synthetic.make_forest_world(rng, n_trees=110, n_poles=18,
                                    n_cars=12, extent=40.0)
traj = synthetic.loop_trajectory(150, radius=13.0, laps=2.0)
log = synthetic.make_log(world, traj, robot_id=0, seed=3,
                         odom_drift_sigma=0.012, pos_noise=0.03,
                         dropout=0.1, yaw_drift_bias=0.0008)

cfg = SlamConfig(number_of_robots=3, capacity=mission_capacity(150),
                 solver=realtime_solver())

closures = []
orig = SlamNode.add_loop_closure_factor


def spy(self, prev_idx, robot1, cur_idx, robot2, rel, **kw):
    closures.append((prev_idx, cur_idx, np.asarray(rel).copy()))
    return orig(self, prev_idx, robot1, cur_idx, robot2, rel, **kw)


SlamNode.add_loop_closure_factor = spy

for flag in (True, False):
    closures.clear()
    m = MultiRobotMission(cfg, [log])
    rep = m.run(intra_lc=flag)
    est = rep.nodes[0].optimized_trajectory()
    ate = synthetic.ate_rmse(est, traj[:len(est)], align=False)
    print(f"intra={flag}: ATE {ate:.4f} m, closures {len(closures)}, "
          f"successes {rep.nodes[0].num_success_intra}")
    for prev_idx, cur_idx, rel in closures:
        gt_rel = se3np.between(traj[prev_idx], traj[cur_idx])
        err = se3np.between(gt_rel, rel)
        terr = np.linalg.norm(err[4:7])
        aerr = 2 * np.arccos(min(1.0, abs(err[0])))
        print(f"  closure {prev_idx}->{cur_idx}: trans err {terr:.3f} m, "
              f"rot err {np.degrees(aerr):.2f} deg")
    if flag:
        print(f"  closure sigma: {rep.nodes[0]._closure_sigma}")
