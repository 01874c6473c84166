"""Multi-process (multi-host / DCN-shaped) execution.

The single-process `parallel/` stack proves multi-DEVICE SPMD over ICI-style
collectives. Deployment at pod scale adds a second tier: N host processes,
each owning a slice of the global device mesh, coordinated by JAX's
distributed runtime — collectives then ride DCN between hosts exactly as the
in-process mesh rides ICI (BASELINE.md protocol "N>=2 hosts over DCN";
SURVEY §2.7/§5). Nothing in the SPMD programs changes: the same
`build_spmd_step` / `distributed_solve` bodies run under a GLOBAL mesh whose
devices span processes; `jax.make_array_from_process_local_data` feeds each
process its local robots' packets.

Testability without a pod: each process forces
`--xla_force_host_platform_device_count=K` CPU devices, so two local
processes x 4 devices exercise the full multi-process code path (global
mesh assembly, cross-process collectives, local-data feeding) hermetically
— tests/test_multiprocess.py spawns exactly that.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class ProcessSpec:
    coordinator_address: str            # "host:port" of process 0
    num_processes: int
    process_id: int
    local_device_count: Optional[int] = None   # force CPU device count
    platform: Optional[str] = None      # e.g. "cpu" (overrides image default)


def initialize(spec: ProcessSpec):
    """Join the distributed runtime. Must run BEFORE any other jax call in
    the process (jax.distributed.initialize contract). Returns the jax
    module for convenience."""
    import os

    if spec.local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={spec.local_device_count}"
        if want not in flags:
            os.environ["XLA_FLAGS"] = f"{flags} {want}".strip()
    import jax

    if spec.platform is not None:
        # the image's sitecustomize pins jax_platforms to the TPU tunnel;
        # a config update BEFORE backend init overrides it (same trick as
        # tests/conftest.py)
        jax.config.update("jax_platforms", spec.platform)
    jax.distributed.initialize(
        coordinator_address=spec.coordinator_address,
        num_processes=spec.num_processes,
        process_id=spec.process_id)
    return jax


def global_mesh(axis: str = "robot"):
    """One-axis mesh over ALL processes' devices (process-major order, the
    jax.devices() contract — contiguous per-process slices so host->device
    feeding stays local)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def local_batch_to_global(mesh, axis: str, host_array: np.ndarray):
    """Wrap this process's slice of a [R_global, ...] batch into a global
    jax.Array sharded over `axis` (each process passes ONLY its local
    rows)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, host_array)


def run_spmd_mission_step(cfg, n_steps: int = 3, axis: str = "robot"):
    """Build the global mesh, run `n_steps` of the decentralized SPMD step
    with every robot-to-robot TF seeded, and return this process's local
    slice of the final pose array plus simple timing (used by the
    multi-process test and the scaling bench)."""
    import time

    import jax
    import jax.numpy as jnp

    from . import multirobot

    mesh = global_mesh(axis)
    step = multirobot.build_spmd_step(cfg, mesh, axis)
    state = multirobot.make_spmd_state(cfg, mesh, axis)
    # seed all TFs (identity frames) so folds happen from step one
    R = cfg.number_of_robots
    state = state._replace(
        tf_vals=jnp.broadcast_to(jnp.asarray([1., 0, 0, 0, 0, 0, 0]),
                                 (R, R, 7)),
        tf_valid=jnp.ones((R, R), bool))
    packets = multirobot.make_example_packets(cfg)

    state = step(state, packets)                      # compile + step 1
    jax.block_until_ready(state.graph.pose_count)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step(state, packets)
    jax.block_until_ready(state.graph.pose_count)
    dt = (time.perf_counter() - t0) / n_steps

    local = [np.asarray(s.data) for s in state.graph.poses.addressable_shards]
    counts = [np.asarray(s.data) for s in state.graph.pose_count.addressable_shards]
    return np.concatenate(local, axis=0), np.concatenate(counts, axis=0), dt
