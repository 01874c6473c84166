"""Multi-chip SPMD decentralized SLAM.

The reference runs N identical sloam_node *processes* on one machine
connected by ROS pub/sub (decentralized_sloam.launch). The TPU-native
equivalent shards the N decentralized replicas across devices of a
`jax.sharding.Mesh` axis "robot": every device holds one robot's full
engine state (its own factor graph containing ALL robots' chains — the
decentralized model), processes its own keyframe stream, and communication
becomes collectives:

* compact object maps + current keyframe packets: `all_gather` over the
  robot axis (replacing the PoseMstBundle broadcast,
  databaseManager.cpp:219-279);
* the inter-robot TF table: an [R, R] SE3+validity table all-gathered and
  closed transitively by one composition hop per step (replacing the TF
  gossip, databaseManager.cpp:160-187);
* merging: robots with a known TF fold peers' *streamed* keyframes directly
  (when every keyframe is exchanged, the reference's bookmark replay
  sloamNode.cpp:912-1008 degenerates to streaming ingestion).

Place recognition stays an asynchronous kernel (host-triggered) exactly like
the reference's detached threads.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SlamConfig
from ..factorgraph.graph import GraphState, empty_state
from ..geometry import se3
from ..objects import Cuboids, Cylinders, Ellipsoids
from ..runtime import engine


class KeyframePacket(NamedTuple):
    """Fixed-shape per-robot keyframe message (== sloam_msgs/PoseMst)."""
    pose_est: jnp.ndarray     # [7] key pose estimate in own frame
    rel_odom: jnp.ndarray     # [7]
    cyl: Cylinders            # padded body-frame scan
    cub: Cuboids
    ell: Ellipsoids


class SpmdState(NamedTuple):
    """Per-robot replica state; leading axis = robot, sharded over the mesh."""
    graph: GraphState                  # stacked pytree [R, ...]
    tf_vals: jnp.ndarray               # [R, R, 7] peer frame -> own frame
    tf_valid: jnp.ndarray              # [R, R] bool (diag always True)


def make_spmd_state(cfg: SlamConfig, mesh: Mesh, axis: str = "robot") -> SpmdState:
    R = cfg.number_of_robots
    single = empty_state(cfg)
    graph = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (R,) + a.shape), single)
    tf_vals = jnp.broadcast_to(se3.identity()[None, None], (R, R, 7))
    tf_valid = jnp.eye(R, dtype=bool)
    state = SpmdState(graph, tf_vals, tf_valid)
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), state)


def _fold_packet(cfg, g, robot_id, packet, tf, noise_odom, noise_cube):
    pose = se3.compose(tf, packet.pose_est)
    g, _ = engine.keyframe_step(
        cfg, g, jnp.int32(robot_id), pose, packet.rel_odom,
        packet.cyl, packet.cub, packet.ell,
        jnp.asarray(False), jnp.asarray(False), noise_odom, noise_cube,
        enable_solve=False)
    return g


def build_spmd_step(cfg: SlamConfig, mesh: Mesh, axis: str = "robot"):
    """Returns a jitted SPMD step: (SpmdState, packets [R, ...]) -> SpmdState.

    Every robot executes: ingest own keyframe -> all_gather packets + TF
    tables -> gossip-close TFs -> fold peers with known TFs -> solve."""
    R = cfg.number_of_robots
    noise_odom = jnp.asarray(np.asarray(cfg.noise.odom, np.float32))
    noise_cube = jnp.asarray(np.asarray(cfg.noise.cube, np.float32))

    def local_step(state: SpmdState, packets: KeyframePacket) -> SpmdState:
        # leading dim on this device: robots_local (R / n_devices)
        def per_robot(graph, my_tf_vals, my_tf_valid, all_packets):
            # One lax.scan over ALL R keyframe packets: the fold body is
            # traced ONCE regardless of R, so program size stays O(1) in
            # the robot count (MAX_NUM_ROBOTS=13, graph.h:11). The own
            # keyframe is the diagonal entry (tf=identity, always valid);
            # peers fold only once their TF is known — streamed merge,
            # replacing the reference's bookmark replay
            # (sloamNode.cpp:912-1008).
            def body(g, inp):
                pid, packet, tf, known = inp
                g = jax.lax.cond(
                    known,
                    lambda gg: _fold_packet(cfg, gg, pid, packet, tf,
                                            noise_odom, noise_cube),
                    lambda gg: gg, g)
                return g, None

            xs = (jnp.arange(R, dtype=jnp.int32), all_packets,
                  my_tf_vals, my_tf_valid)
            graph, _ = jax.lax.scan(body, graph, xs)
            # one *incremental* solve over the merged graph (the per-step
            # budget; full solves stay host-triggered like the reference's
            # LC threads)
            return engine.solve_incremental(cfg, graph)

        # all_gather packets and TF tables across the robot axis
        all_packets = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, axis, tiled=True), packets)
        all_tf_vals = jax.lax.all_gather(state.tf_vals, axis, tiled=True)
        all_tf_valid = jax.lax.all_gather(state.tf_valid, axis, tiled=True)

        # TF gossip, one transitive hop: if I know B and B knows C then I
        # learn C = my_tf[B] ∘ tf_B[C] (databaseManager.cpp:167-187).
        # Vectorized over (B, C) — O(R^2) compute, O(1) program size.
        def gossip(my_vals, my_valid):
            cand = jax.vmap(lambda vb, row:
                            jax.vmap(lambda t: se3.compose(vb, t))(row)
                            )(my_vals, all_tf_vals)          # [R,R,7]
            ok = my_valid[:, None] & all_tf_valid            # [R,R] via B
            any_ok = jnp.any(ok, axis=0)                     # [R] per C
            b_star = jnp.argmax(ok, axis=0)                  # first valid B
            new_c = cand[b_star, jnp.arange(R)]              # [R,7]
            take = any_ok & (~my_valid)
            new_vals = jnp.where(take[:, None], new_c, my_vals)
            return new_vals, my_valid | take

        tf_vals, tf_valid = jax.vmap(gossip)(state.tf_vals, state.tf_valid)
        graph = jax.vmap(
            lambda g, tv, tm: per_robot(g, tv, tm, all_packets)
        )(state.graph, tf_vals, tf_valid)
        return SpmdState(graph, tf_vals, tf_valid)

    def jitted(state: SpmdState, packets: KeyframePacket) -> SpmdState:
        st = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P(axis), state),
                      jax.tree_util.tree_map(lambda _: P(axis), packets)),
            out_specs=jax.tree_util.tree_map(lambda _: P(axis), state),
            check_vma=False,
        )
        return st(state, packets)

    return jax.jit(jitted, donate_argnums=0)


def set_tf(state: SpmdState, owner: int, peer: int, tf7: np.ndarray) -> SpmdState:
    """Host-side injection of a discovered inter-robot TF (the output of
    place recognition)."""
    return state._replace(
        tf_vals=state.tf_vals.at[owner, peer].set(jnp.asarray(tf7)),
        tf_valid=state.tf_valid.at[owner, peer].set(True),
    )


def make_example_packets(cfg: SlamConfig, rng_seed: int = 0) -> KeyframePacket:
    """Tiny random per-robot packets (for tests / the dry run)."""
    R = cfg.number_of_robots
    S = cfg.capacity.max_scan_objects
    rng = np.random.default_rng(rng_seed)

    def batch(shape, scale=1.0):
        return jnp.asarray(rng.normal(0, scale, (R,) + shape).astype(np.float32))

    cyl = Cylinders(
        root=batch((S, 3), 5.0),
        ray=jnp.broadcast_to(jnp.array([0.0, 0, 1]), (R, S, 3)),
        radius=jnp.abs(batch((S,), 0.3)),
        label=jnp.zeros((R, S), jnp.int32) + 8,
        valid=jnp.asarray(np.arange(S)[None, :] < 5).repeat(R, 0),
    )
    cub = Cuboids(
        pose=jnp.broadcast_to(se3.identity(), (R, S, 7)),
        scale=jnp.abs(batch((S, 3), 1.0)) + 1.0,
        label=jnp.zeros((R, S), jnp.int32) + 5,
        valid=jnp.asarray(np.arange(S)[None, :] < 3).repeat(R, 0),
    )
    ell = Ellipsoids(
        pose=jnp.broadcast_to(se3.identity(), (R, S, 7)),
        scale=jnp.abs(batch((S, 3), 0.5)) + 0.5,
        label=jnp.ones((R, S), jnp.int32),
        valid=jnp.asarray(np.arange(S)[None, :] < 2).repeat(R, 0),
    )
    pose_est = jnp.asarray(
        np.stack([np.asarray(se3.from_xyz_yaw(float(r), 0.5, 0.0, 0.0))
                  for r in range(R)]))
    rel = jnp.broadcast_to(se3.identity(), (R, 7))
    return KeyframePacket(pose_est, rel, cyl, cub, ell)
