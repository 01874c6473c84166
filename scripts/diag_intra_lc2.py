"""Deep-dive one intra closure: grid TF vs LSQ TF vs ground truth."""
import sys, os; sys.path.insert(0, os.getcwd())
import numpy as np

from slide_slam_tpu.config import SlamConfig, mission_capacity, realtime_solver
from slide_slam_tpu.geometry import se3np
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.place_recognition import slidematch
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

captures = []
orig = SlamNode._intra_search


def spy(self, latest, poses_snap, rows_dev, packet):
    res = orig(self, latest, poses_snap, rows_dev, packet)
    if res is not None:
        captures.append((latest, res, packet))
    return res


SlamNode._intra_search = spy
m = MultiRobotMission(cfg, [log], async_runtime=False)
rep = m.run(intra_lc=True)
node = rep.nodes[0]

for latest, (cand, lat, rel, chain), packet in captures:
    gt_rel = se3np.between(traj[cand], traj[lat])
    err = se3np.between(gt_rel, rel)
    print(f"\ncase {cand}->{lat}: rel trans err "
          f"{np.linalg.norm(err[4:7]):.3f} m rot "
          f"{np.degrees(2*np.arccos(min(1, abs(err[0])))):.2f} deg")
    # what were the estimated poses at search time vs GT?
    q_est, c_est = chain[lat], chain[cand]
    print(f"  est cand pose err {np.linalg.norm(c_est[4:7]-traj[cand][4:7]):.3f} m, "
          f"est query pose err {np.linalg.norm(q_est[4:7]-traj[lat][4:7]):.3f} m")
    # replicate the search with extra reporting
    meas = node.packet_measurement_rows(packet)
    import jax.numpy as jnp
    pr = node.place_recognition
    # rebuild submap like _intra_search did (from final map here — approximate)
    qmat = se3np.matrix(q_est)
    meas_map = meas.copy()
    ph = np.concatenate([meas[:, 1:4], np.ones((len(meas), 1), np.float32)], 1)
    meas_map[:, 1:4] = (qmat @ ph.T).T[:, :3]
    sub = node.compact_map(min_hits=1)
    d = np.linalg.norm(sub[:, 1:4] - c_est[4:7], axis=1)
    sub = sub[(d <= cfg.lc_submap_radius) & (np.abs(sub[:, 3] - c_est[6]) < 1.5)]
    found, xyzyaw, tf, n_inl, _ = pr.find_transformation(sub, meas_map, intra=True)
    print(f"  re-search: found={found} inliers={n_inl} xyzyaw={xyzyaw}")
    if found:
        # GT correction: lc_tf should map est-projected query measurements onto
        # the true map. The TRUE corrected query pose:
        q_true = se3np.matrix(traj[lat])
        corr_gt = q_true @ np.linalg.inv(qmat)    # left map-frame correction
        yaw_gt = np.degrees(np.arctan2(corr_gt[1, 0], corr_gt[0, 0]))
        print(f"  gt corr xy=({corr_gt[0,3]:.3f},{corr_gt[1,3]:.3f}) yaw={yaw_gt:.2f}deg"
              f" | grid/lsq corr xy=({tf[0,3]:.3f},{tf[1,3]:.3f}) "
              f"yaw={np.degrees(np.arctan2(tf[1,0],tf[0,0])):.2f}deg")
