"""Diagnose the duplicate-landmark explosion (VERDICT r4 ask #4).

Runs the EXACT bench_mission world/logs on CPU with per-source append
instrumentation: own keyframe DA vs peer replay, per node. Flags bisect
the r4 runtime additions (InputManager routing, async pool, rel-meas).

Run: JAX_PLATFORMS=cpu python scripts/diag_overflow.py [--sync] [--no-im]
     [--no-rel] [--kf N]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sync", action="store_true", help="async_runtime=False")
    ap.add_argument("--no-im", action="store_true", help="use_input_manager=False")
    ap.add_argument("--no-rel", action="store_true", help="drop relative sightings")
    ap.add_argument("--kf", type=int, default=150)
    args = ap.parse_args()

    from slide_slam_tpu.config import (SlamConfig, mission_capacity,
                                       realtime_solver)
    from slide_slam_tpu.io import synthetic
    from slide_slam_tpu.runtime.mission import MultiRobotMission
    from slide_slam_tpu.runtime.node import SlamNode
    import bench

    cfg = SlamConfig(number_of_robots=3, capacity=mission_capacity(args.kf),
                     solver=realtime_solver(),
                     intra_robot_place_recognition_frequency=0.2)
    rng = np.random.default_rng(7)
    world = synthetic.make_forest_world(rng, n_trees=110, n_poles=18,
                                        n_cars=12, extent=40.0)
    trajs = [
        synthetic.loop_trajectory(args.kf, radius=13.0, laps=2.0),
        synthetic.lawnmower_trajectory(args.kf, extent=32.0, rows=3, step=1.4),
        synthetic.lawnmower_trajectory(args.kf, extent=38.0, rows=4, step=1.4),
    ]
    logs = [synthetic.make_log(world, t, robot_id=r, seed=3 + r,
                               odom_drift_sigma=0.012, pos_noise=0.03,
                               dropout=0.1, yaw_drift_bias=0.0008)
            for r, t in enumerate(trajs)]
    rel = [] if args.no_rel else bench._mission_relative_meas(logs, rng)

    # ---- instrumentation: per-source cylinder append deltas --------------
    counters = {}   # rid -> {"own": n, "replay": n}

    orig_fused = SlamNode._fused_step
    orig_replay = SlamNode.replay_peers

    def counting_fused(self, *a, **kw):
        before = int(np.asarray(self.state.cyl_count))
        out = orig_fused(self, *a, **kw)
        after = int(np.asarray(self.state.cyl_count))
        c = counters.setdefault(self.robot_id, {"own": 0, "replay": 0})
        c["own"] += after - before
        return out

    def counting_replay(self):
        before = int(np.asarray(self.state.cyl_count))
        orig_replay(self)
        after = int(np.asarray(self.state.cyl_count))
        c = counters.setdefault(self.robot_id, {"own": 0, "replay": 0})
        c["replay"] += after - before

    SlamNode._fused_step = counting_fused
    SlamNode.replay_peers = counting_replay

    mission = MultiRobotMission(cfg, logs, relative_meas=rel,
                                async_runtime=not args.sync,
                                use_input_manager=not args.no_im)
    t0 = time.time()
    report = mission.run(intra_lc=True)
    dt = time.time() - t0

    n_world_cyl = len(world.cyl_root)
    print(f"\nmode: im={not args.no_im} async={not args.sync} "
          f"rel={not args.no_rel}  world cylinders={n_world_cyl}  "
          f"wall={dt:.1f}s")
    total_overflow = 0
    for node, log, traj in zip(report.nodes, logs, trajs):
        rid = node.robot_id
        cyl = int(np.asarray(node.state.cyl_count))
        ov = node.overflow_report()
        ov_nz = {k: v for k, v in ov.items() if v}
        total_overflow += sum(ov.values())
        c = counters.get(rid, {})
        ate = bench._stamp_matched_ate(node, log, traj)
        print(f"robot{rid}: cyl_count={cyl} own_appends={c.get('own')} "
              f"replay_appends={c.get('replay')} kf={len(node.key_poses)} "
              f"ate={ate:.3f} intra={node.num_success_intra}/"
              f"{node.num_attempts_intra} overflow={ov_nz}")
    print(f"TOTAL overflow={total_overflow}")


if __name__ == "__main__":
    main()
