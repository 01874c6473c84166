"""Diagnose the fixture-mission duplicate flood + wrong-TF merges
(r5 TPU bench: mission_fixture_ate 9.0, overflow 59754, per-robot ATEs
[17.0, 8.2, 1.8]).

Logs every discovered inter-robot TF vs the known truth (all robots share
the world frame, so the true TF between odom frames is ~identity modulo
odom drift) and each node's landmark/overflow growth at comm events.

Run (TPU, compiles cached from bench): python scripts/diag_fixture.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/slide_slam_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

import bench
from slide_slam_tpu.config import forest_config, mission_capacity, realtime_solver
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.runtime.mission import MultiRobotMission
from slide_slam_tpu.runtime.node import SlamNode
from slide_slam_tpu.geometry import se3np
import dataclasses


def main():
    path = ("/root/reference/backend/sloam/clipper_semantic_object/"
            "examples/data/robot2Map_forest.txt")
    rng = np.random.default_rng(11)
    world = synthetic.world_from_reference_map(path, rng)
    fixture_range = 12.0
    density = len(world.cyl_root) / 3500.0
    submap_k = int(np.ceil(density * np.pi * fixture_range ** 2 * 1.8))
    cfg = dataclasses.replace(
        forest_config(),
        number_of_robots=3,
        capacity=dataclasses.replace(
            mission_capacity(150, n_cylinders=len(world.cyl_root),
                             n_cuboids=max(len(world.cub_label), 64)),
            submap_k_cylinder=submap_k),
        solver=realtime_solver(),
        intra_robot_place_recognition_frequency=0.2)
    trajs = [
        synthetic.loop_trajectory(150, radius=13.0, laps=2.0),
        synthetic.lawnmower_trajectory(150, extent=30.0, rows=3, step=1.4),
        synthetic.lawnmower_trajectory(150, extent=36.0, rows=4, step=1.4),
    ]
    offsets = (np.array([30.0, 0.0, 0.0]), np.array([18.0, -10.0, 0.0]),
               np.array([25.0, -5.0, 0.0]))
    for t, off in zip(trajs, offsets):
        t[:, 4:7] = t[:, 4:7] + off[None, :].astype(t.dtype)
    logs = [synthetic.make_log(world, t, robot_id=r, seed=13 + r,
                               odom_drift_sigma=0.012, pos_noise=0.03,
                               dropout=0.1, yaw_drift_bias=0.0008,
                               max_range=fixture_range)
            for r, t in enumerate(trajs)]
    rel = bench._mission_relative_meas(logs, rng)

    # instrument TF acceptance
    orig_apply = SlamNode._apply_inter_result

    def loud_apply(self, res):
        before = dict(self.dbm.loop_closure_tf)
        out = orig_apply(self, res)
        for rid, tf in self.dbm.loop_closure_tf.items():
            if rid not in before:
                t = np.asarray(tf)
                yaw = np.rad2deg(np.arctan2(
                    2 * (t[0] * t[3] + t[1] * t[2]),
                    1 - 2 * (t[2] ** 2 + t[3] ** 2))) if t.shape == (7,) else 0
                print(f"  TF accepted: robot{self.robot_id} <- robot{rid}: "
                      f"t=({t[4]:.2f},{t[5]:.2f},{t[6]:.2f}) yaw={yaw:.1f} "
                      f"deg (truth ~identity)", flush=True)
        return out

    SlamNode._apply_inter_result = loud_apply

    bench._warm_mission_kernels(cfg, logs, rel)
    sync = os.environ.get("DIAG_SYNC") == "1"
    mission = MultiRobotMission(cfg, logs, relative_meas=rel,
                                use_input_manager=True,
                                async_runtime=not sync)
    t0 = time.time()
    report = mission.run(intra_lc=True)
    print(f"wall {time.time()-t0:.1f}s")
    for node, log, traj in zip(report.nodes, logs, trajs):
        ate = bench._stamp_matched_ate(node, log, traj)
        ov = {k: v for k, v in node.overflow_report().items() if v}
        print(f"robot{node.robot_id}: cyl={int(np.asarray(node.state.cyl_count))} "
              f"ate={ate:.3f} merges={sorted(node.dbm.loop_closure_tf)} "
              f"intra={node.num_success_intra}/{node.num_attempts_intra} "
              f"inter_att={node.num_attempts_inter} "
              f"pending={sorted(node._pending_inter_tf)} overflow={ov}")


if __name__ == "__main__":
    main()
