"""Measure keyframe_batch_fused device time vs 8x keyframe_step_fused on
the real TPU (the r5 bench showed 381 ms/kf batched vs 11 ms unbatched).
Run from /root/repo: python scripts/diag_batch_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/slide_slam_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from slide_slam_tpu.config import SlamConfig
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.runtime.node import SlamNode


def main():
    cfg = SlamConfig(number_of_robots=3)
    rng = np.random.default_rng(0)
    world = synthetic.make_forest_world(rng, n_trees=120, n_poles=20,
                                        n_cars=15, extent=45.0)
    traj = synthetic.lawnmower_trajectory(220, extent=40.0, rows=4, step=1.5)
    log = synthetic.make_log(world, traj, odom_drift_sigma=0.01,
                             pos_noise=0.03, dropout=0.1)
    kfs = log.keyframes

    # warm both programs
    node = SlamNode(cfg, robot_id=0)
    for kf in kfs[:4]:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    node.process_keyframe_batch(
        [(kf.stamp, kf.odom_pose, vars(kf)) for kf in kfs[4:12]])
    _ = jax.device_get(node.state.pose_count)

    # unbatched: 32 chained dispatches + one sync
    node_u = SlamNode(cfg, robot_id=0)
    for kf in kfs[:8]:
        node_u.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    _ = jax.device_get(node_u.state.pose_count)
    t0 = time.perf_counter()
    for kf in kfs[8:40]:
        node_u.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    _ = jax.device_get(node_u.state.pose_count)
    dt_u = time.perf_counter() - t0
    print(f"unbatched: 32 kf in {dt_u*1e3:.0f} ms -> {32/dt_u:.1f} kf/s")

    # batched: 4 batches of 8 + one sync
    node_b = SlamNode(cfg, robot_id=0)
    for kf in kfs[:8]:
        node_b.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    _ = jax.device_get(node_b.state.pose_count)
    t0 = time.perf_counter()
    for lo in range(8, 40, 8):
        node_b.process_keyframe_batch(
            [(kf.stamp, kf.odom_pose, vars(kf)) for kf in kfs[lo:lo + 8]])
    _ = jax.device_get(node_b.state.pose_count)
    dt_b = time.perf_counter() - t0
    print(f"batched:   32 kf in {dt_b*1e3:.0f} ms -> {32/dt_b:.1f} kf/s "
          f"({dt_b/4*1e3:.0f} ms/batch)")


if __name__ == "__main__":
    main()
