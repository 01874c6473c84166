"""Landmark-axis sharded bundle adjustment (SURVEY §5 "long-context"
analog, §7 stage 6).

The factor-sharded tier (parallel/distributed_ba.py) replicates the
variables: per-device LANDMARK memory does not scale. This tier partitions
the landmark arrays themselves — each device owns a contiguous BLOCK of
every landmark family plus exactly the factors that reference its
landmarks — so maps beyond one device's capacity shard across the mesh:

  * poses / odometry chain: replicated (odom sigmas inflated by sqrt(D)
    so the psum-reduced chain information is counted once — the
    distributed_ba convention);
  * between factors (closures, relative measurements): resident on shard
    0 only (they touch poses, not landmarks);
  * cylinders / cuboids / points + their factors: local block per shard,
    factor landmark indices rebased to the local block.

The solve is the Schur-eliminated solver (factorgraph/schur.py) with
`axis_name`: each shard eliminates ITS landmarks in closed form, the
replicated pose-system PCG psums the per-shard Schur corrections over ICI,
and back-substitution is entirely local. Per-device landmark state and the
[NL, 9, 9] block inverses scale 1/D.

The reference has no equivalent (single-process GTSAM); this is the
pod-scale design slot BASELINE.json's "keyframe/map-block partitioned
distributed BA, Schur reduction" names.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SlamConfig
from ..factorgraph import schur
from ..factorgraph.graph import GraphState

# landmark families: (array fields, count field, factor prefix)
_FAMILIES = (
    (("cyl_ray", "cyl_root", "cyl_radius", "cyl_label", "cyl_hits"),
     "cyl_count",
     ("cf_pose", "cf_lm", "cf_meas"), "cf_count"),
    (("cub_pose", "cub_scale", "cub_label", "cub_hits"), "cub_count",
     ("kf_pose", "kf_lm", "kf_meas_pose", "kf_meas_scale", "kf_sigma"),
     "kf_count"),
    (("pt_pos", "pt_scale", "pt_label", "pt_hits"), "pt_count",
     ("uf_pose", "uf_lm", "uf_bearing", "uf_range"), "uf_count"),
)

_BF_FIELDS = ("bf_i", "bf_j", "bf_rel", "bf_sigma")


def shard_state_by_landmark(state: GraphState, n: int) -> GraphState:
    """Host-side: stack n per-shard GraphStates along a leading axis with
    the LANDMARK arrays block-partitioned.

    Landmark l of a family with shard capacity C lives on shard l // C at
    local slot l % C; the family's factors are routed to the owning shard
    (order preserved) with lm indices rebased. Per-shard landmark/factor
    capacities are the global capacity divided by n (factors keep a 2x
    imbalance headroom, counted against the same overflow discipline as
    everywhere else — here sized so nothing drops for reasonable
    balance)."""
    out = {f: None for f in state._fields}
    host = {f: np.asarray(getattr(state, f)) for f in state._fields}

    for lm_fields, lm_count, f_fields, f_count in _FAMILIES:
        cap = host[lm_fields[0]].shape[0]
        shard_cap = -(-cap // n)
        total = int(host[lm_count])
        # landmark arrays: contiguous blocks
        for f in lm_fields:
            a = host[f]
            padded = np.concatenate(
                [a, np.zeros((shard_cap * n - cap,) + a.shape[1:], a.dtype)])
            out[f] = padded.reshape((n, shard_cap) + a.shape[1:])
        out[lm_count] = np.clip(
            total - shard_cap * np.arange(n), 0, shard_cap).astype(np.int32)

        # factors: route to the shard owning their landmark
        fcap = host[f_fields[0]].shape[0]
        fcnt = int(host[f_count])
        lm_field = f_fields[1]                    # the *_lm index array
        lm_idx = host[lm_field][:fcnt]
        owner = lm_idx // shard_cap
        # local factor capacity from the ACTUAL routing (discovery-ordered
        # landmark ids make early shards factor-heavy), rounded up to a
        # 64 bucket so repeated solves at similar fill reuse the compile
        per_shard = np.bincount(owner, minlength=n) if fcnt else np.zeros(n, int)
        local_cap = max(64, int(-(-int(per_shard.max(initial=0)) // 64) * 64))
        stacked = {f: np.zeros((n, local_cap) + host[f].shape[1:],
                               host[f].dtype) for f in f_fields}
        local_counts = np.zeros((n,), np.int32)
        for shard in range(n):
            sel = np.nonzero(owner == shard)[0]
            for f in f_fields:
                vals = host[f][sel]
                if f == lm_field:
                    vals = vals - shard * shard_cap
                stacked[f][shard, :len(sel)] = vals
            local_counts[shard] = len(sel)
        for f in f_fields:
            out[f] = stacked[f]
        out[f_count] = local_counts

    # between factors: shard 0 only
    bf_total = int(host["bf_count"])
    for f in _BF_FIELDS:
        a = host[f]
        z = np.zeros((n,) + a.shape, a.dtype)
        z[0] = a
        out[f] = z
    out["bf_count"] = np.asarray(
        [bf_total] + [0] * (n - 1), np.int32)

    # everything else: replicated; odom sigma inflated so the psum-reduced
    # chain information is counted exactly once
    for f in state._fields:
        if out[f] is not None:
            continue
        a = host[f]
        if f == "odom_sigma":
            out[f] = np.broadcast_to(a * np.sqrt(float(n)), (n,) + a.shape).copy()
        else:
            out[f] = np.broadcast_to(a, (n,) + a.shape).copy()
    return GraphState(**{f: jnp.asarray(out[f]) for f in state._fields})


def unshard_state_by_landmark(stacked: GraphState,
                              original: GraphState) -> GraphState:
    """Gather the solved variables back: poses from shard 0 (replicated),
    landmark blocks re-concatenated into the original layout; factor
    arrays/counts restore the original (re-laid-out only for the solve)."""
    out = {}
    lm_fields = {f: True for fam in _FAMILIES for f in fam[0]}
    pose_fields = {"poses", "pose_count", "prior_pose", "prior_valid",
                   "keypose_xyz"}
    st = jax.tree_util.tree_map(np.asarray, stacked)
    for f in original._fields:
        if f in lm_fields:
            a = getattr(st, f)                       # [n, C, ...]
            cap = np.asarray(getattr(original, f)).shape[0]
            out[f] = jnp.asarray(
                a.reshape((-1,) + a.shape[2:])[:cap])
        elif f in pose_fields:
            out[f] = jnp.asarray(getattr(st, f)[0])
        else:
            out[f] = getattr(original, f)
    return GraphState(**out)


def build_landmark_sharded_solve(cfg: SlamConfig, mesh: Mesh,
                                 axis: str = "lm"):
    """Jitted landmark-sharded Schur solve: stacked GraphState -> same."""

    def local_solve(stacked: GraphState) -> GraphState:
        local = jax.tree_util.tree_map(lambda a: a[0], stacked)
        solved = schur.solve(
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


def landmark_sharded_solve(state: GraphState, cfg: SlamConfig, mesh: Mesh,
                           axis: str = "lm") -> GraphState:
    """Convenience one-shot: shard by landmark -> solve on the mesh ->
    unshard."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names if a == axis]))
    stacked = shard_state_by_landmark(state, n)
    sharding = NamedSharding(mesh, P(axis))
    stacked = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), stacked)
    solve_fn = build_landmark_sharded_solve(cfg, mesh, axis)
    solved = solve_fn(stacked)
    return unshard_state_by_landmark(solved, state)
