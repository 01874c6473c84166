"""Pod-scale distributed bundle adjustment (factor-sharded solve).

BASELINE.json's pod config: "keyframe/map-block partitioned distributed BA
across N>=2 hosts, Schur reduction". Here the normal equations are
data-parallel over FACTORS: each device owns a shard of the landmark/closure
factor arrays, computes its local J^T r / diag(J^T J) / J^T J v, and the
solver's reductions are `psum` over the mesh axis — the PCG state (variables,
search direction) stays replicated and in lockstep on every device. The
variables (pose chains + landmarks) are replicated; the per-robot odometry
chain is replicated too with its sigmas inflated by sqrt(n_shards) so its
psum-reduced information is counted exactly once.

This composes with the per-robot decentralized sharding
(parallel/multirobot.py): robots across one mesh axis, factors across
another.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SlamConfig
from ..factorgraph import solver
from ..factorgraph.graph import GraphState

# factor-array fields split across shards (others are replicated)
_SHARDED = {
    "bf_i": "bf_count", "bf_j": "bf_count", "bf_rel": "bf_count",
    "bf_sigma": "bf_count",
    "cf_pose": "cf_count", "cf_lm": "cf_count", "cf_meas": "cf_count",
    "kf_pose": "kf_count", "kf_lm": "kf_count", "kf_meas_pose": "kf_count",
    "kf_meas_scale": "kf_count", "kf_sigma": "kf_count",
    "uf_pose": "uf_count", "uf_lm": "uf_count", "uf_bearing": "uf_count",
    "uf_range": "uf_count",
}
_COUNTS = ("bf_count", "cf_count", "kf_count", "uf_count")


def shard_state(state: GraphState, n: int) -> GraphState:
    """Host-side: stack n per-shard GraphStates along a leading axis.

    Factor rows are split contiguously; counts become per-shard local counts;
    everything else (variables, odometry chain) is broadcast, with
    odom_sigma * sqrt(n) so psum counts the chain once."""
    out = {}
    counts = {c: int(np.asarray(getattr(state, c))) for c in _COUNTS}
    for f in state._fields:
        a = np.asarray(getattr(state, f))
        if f in _COUNTS:
            continue  # handled below with the shard capacity of their arrays
        if f in _SHARDED:
            cap = a.shape[0]
            shard_cap = -(-cap // n)  # ceil
            padded = np.concatenate(
                [a, np.zeros((shard_cap * n - cap,) + a.shape[1:], a.dtype)],
                axis=0)
            out[f] = padded.reshape((n, shard_cap) + a.shape[1:])
        elif f == "odom_sigma":
            out[f] = np.broadcast_to(a * np.sqrt(float(n)),
                                     (n,) + a.shape).copy()
        else:
            out[f] = np.broadcast_to(a, (n,) + a.shape).copy()
    for cname in _COUNTS:
        total = counts[cname]
        # shard capacity of any array owned by this count
        owner = next(k for k, v in _SHARDED.items() if v == cname)
        shard_cap = out[owner].shape[1]
        local = np.clip(total - shard_cap * np.arange(n), 0, shard_cap)
        out[cname] = local.astype(np.int32)
    return GraphState(**{f: jnp.asarray(out[f]) for f in state._fields})


def unshard_state(stacked: GraphState, original: GraphState) -> GraphState:
    """Take the replicated variables from shard 0; restore the original
    factor arrays/counts (they were only re-laid-out for the solve)."""
    var_fields = {"poses", "pose_count", "prior_pose", "prior_valid",
                  "cyl_ray", "cyl_root", "cyl_radius", "cyl_label",
                  "cyl_hits", "cyl_count", "cub_pose", "cub_scale",
                  "cub_label", "cub_hits", "cub_count", "pt_pos", "pt_scale",
                  "pt_label", "pt_hits", "pt_count", "keypose_xyz"}
    out = {}
    for f in original._fields:
        if f in var_fields:
            out[f] = jax.tree_util.tree_map(lambda a: a, getattr(stacked, f))[0]
        else:
            out[f] = getattr(original, f)
    return GraphState(**out)


def build_distributed_solve(cfg: SlamConfig, mesh: Mesh, axis: str = "shard"):
    """Jitted factor-sharded solve: stacked GraphState [n, ...] -> same."""

    def local_solve(stacked: GraphState) -> GraphState:
        local = jax.tree_util.tree_map(lambda a: a[0], stacked)
        solved = solver.solve(
            local,
            cyl_sigma=cfg.noise.cylinder,
            bearing_sigma=cfg.noise.bearing,
            outer_iters=cfg.solver.max_outer_iterations,
            pcg_iters=cfg.solver.pcg_max_iterations,
            pcg_tol=cfg.solver.pcg_tol,
            axis_name=axis,
        )
        return jax.tree_util.tree_map(lambda a: a[None], solved)

    def jitted(stacked: GraphState) -> GraphState:
        fn = jax.shard_map(
            local_solve, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P(axis), stacked),),
            out_specs=jax.tree_util.tree_map(lambda _: P(axis), stacked),
            check_vma=False,
        )
        return fn(stacked)

    return jax.jit(jitted)


def distributed_solve(state: GraphState, cfg: SlamConfig, mesh: Mesh,
                      axis: str = "shard") -> GraphState:
    """Convenience one-shot: shard -> solve on the mesh -> unshard."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names if a == axis]))
    stacked = shard_state(state, n)
    sharding = NamedSharding(mesh, P(axis))
    stacked = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), stacked)
    solve_fn = build_distributed_solve(cfg, mesh, axis)
    solved = solve_fn(stacked)
    return unshard_state(solved, state)
