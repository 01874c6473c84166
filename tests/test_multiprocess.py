"""Multi-process (DCN-shaped) execution: 2 spawned processes x 4 CPU
devices run the decentralized SPMD mission step over ONE global mesh, and
their result must match the single-process 8-device run bit-for-bit-ish.

This exercises the full pod-deployment code path hermetically
(parallel/multiprocess.py): jax.distributed.initialize, global mesh over
process-spanning devices, cross-process collectives (the all_gather/psum
in build_spmd_step ride the distributed runtime between processes — the
DCN tier), and process-local data feeding.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys
sys.path.insert(0, {repo!r})
from slide_slam_tpu.parallel import multiprocess as mp

spec = mp.ProcessSpec(coordinator_address={coord!r}, num_processes=2,
                      process_id={pid}, local_device_count=4, platform="cpu")
jax = mp.initialize(spec)
assert jax.device_count() == 8, jax.devices()
assert jax.process_count() == 2

from slide_slam_tpu.config import CapacityConfig, SlamConfig

cfg = SlamConfig(number_of_robots=8, capacity=CapacityConfig(
    max_poses_per_robot=32, max_cylinders=64, max_cuboids=32, max_points=32,
    max_scan_objects=16, max_cylinder_factors=256, max_cuboid_factors=128,
    max_point_factors=128, max_between_factors=8))
poses, counts, dt = mp.run_spmd_mission_step(cfg, n_steps=3)
out = dict(local_rows=poses.shape[0], counts=counts.tolist(),
           poses=poses.tolist(), step_s=dt)
print("RESULT" + json.dumps(out))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_spmd_matches_single():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for pid in range(2):
        code = WORKER.format(repo=REPO, coord=coord, pid=pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{se[-3000:]}"
        line = [l for l in so.splitlines() if l.startswith("RESULT")][-1]
        outs.append(json.loads(line[len("RESULT"):]))

    # each process owns 4 robots' replicas
    assert outs[0]["local_rows"] == 4 and outs[1]["local_rows"] == 4
    combined = np.asarray(outs[0]["poses"] + outs[1]["poses"], np.float32)
    counts = np.asarray(outs[0]["counts"] + outs[1]["counts"])
    # every replica folded all 8 robots' packets for 4 steps (1 warm + 3)
    assert (counts == 4).all(), counts

    # single-process 8-device reference
    from slide_slam_tpu.config import CapacityConfig, SlamConfig
    from slide_slam_tpu.parallel import multiprocess as mp

    cfg = SlamConfig(number_of_robots=8, capacity=CapacityConfig(
        max_poses_per_robot=32, max_cylinders=64, max_cuboids=32,
        max_points=32, max_scan_objects=16, max_cylinder_factors=256,
        max_cuboid_factors=128, max_point_factors=128,
        max_between_factors=8))
    poses_1p, counts_1p, _ = mp.run_spmd_mission_step(cfg, n_steps=3)
    np.testing.assert_allclose(combined, poses_1p, atol=2e-4)
