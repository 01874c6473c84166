"""Batched peer replay (engine.replay_batch) must be bit-equivalent to the
sequential per-keyframe fold it replaces (sloamNode.cpp:912-1008 replay,
previously one keyframe_step dispatch per peer keyframe)."""
import jax
import jax.numpy as jnp
import numpy as np

from slide_slam_tpu.config import CapacityConfig, SlamConfig
from slide_slam_tpu.factorgraph.graph import empty_state
from slide_slam_tpu.runtime import engine


def tiny_cfg():
    return SlamConfig(
        number_of_robots=2,
        capacity=CapacityConfig(
            max_poses_per_robot=32, max_cylinders=64, max_cuboids=32,
            max_points=16, max_scan_objects=8, max_cylinder_factors=256,
            max_cuboid_factors=128, max_point_factors=64,
            max_between_factors=8,
        ),
    )


def random_packed(rng, n, S):
    """[n, S, 33] packed scans with a few valid cylinders each."""
    out = np.zeros((n, S, 33), np.float32)
    out[:, :, 12] = 1.0
    out[:, :, 24] = 1.0
    k = 4
    out[:, :k, 0:3] = rng.normal(0, 5.0, (n, k, 3))
    out[:, :k, 3:6] = [0.0, 0.0, 1.0]
    out[:, :k, 6] = np.abs(rng.normal(0.3, 0.05, (n, k)))
    out[:, :k, 7] = 8
    out[:, :k, 8] = 1.0
    return out


def random_poses_rels(rng, n):
    par = np.zeros((n, 2, 7), np.float32)
    par[:, :, 0] = 1.0
    par[:, 0, 4] = np.cumsum(rng.normal(1.0, 0.1, n))   # forward walk
    par[:, 1, 4] = 1.0                                   # rel odom ~1 m
    return par


def test_replay_batch_matches_sequential():
    cfg = tiny_cfg()
    rng = np.random.default_rng(3)
    n, S = 11, cfg.capacity.max_scan_objects
    par = random_poses_rels(rng, n)
    packed = random_packed(rng, n, S)
    noise_odom = jnp.asarray(np.asarray(cfg.noise.odom, np.float32))
    noise_cube = jnp.asarray(np.asarray(cfg.noise.cube, np.float32))

    # sequential: one keyframe_step_packed per keyframe (the old path)
    s_seq = empty_state(cfg)
    for i in range(n):
        s_seq, _ = engine.keyframe_step_packed(
            cfg, s_seq, jnp.int32(1),
            jnp.asarray(par[i]), jnp.asarray(packed[i]),
            jnp.asarray(np.array([False, False])),
            noise_odom, noise_cube, enable_solve=False)

    # batched: pad to a 16-chunk and fold in one dispatch
    C = 16
    par_p = np.zeros((C, 2, 7), np.float32)
    par_p[:, :, 0] = 1.0
    par_p[:n] = par
    packed_p = np.zeros((C, S, 33), np.float32)
    packed_p[:, :, 12] = 1.0
    packed_p[:, :, 24] = 1.0
    packed_p[:n] = packed
    ok = np.arange(C) < n
    s_bat = engine.replay_batch(
        cfg, empty_state(cfg), jnp.int32(1), jnp.asarray(par_p),
        jnp.asarray(packed_p), jnp.asarray(ok), noise_odom, noise_cube)

    for name, a, b in zip(s_seq._fields,
                          jax.tree_util.tree_leaves(s_seq),
                          jax.tree_util.tree_leaves(s_bat)):
        if name in ("prior_pose", "prior_valid"):
            # replay deliberately sets NO gauge anchor on the peer chain
            # (engine._keyframe_body set_prior=False: freezing a replayed
            # chain's first pose bakes the merge TF error in — PARITY #9);
            # the sequential own-keyframe path does
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   err_msg=name)
    assert not bool(np.asarray(s_bat.prior_valid)[1])
    assert int(s_bat.pose_count[1]) == n


def test_replay_batch_padding_is_noop():
    cfg = tiny_cfg()
    noise_odom = jnp.asarray(np.asarray(cfg.noise.odom, np.float32))
    noise_cube = jnp.asarray(np.asarray(cfg.noise.cube, np.float32))
    C, S = 16, cfg.capacity.max_scan_objects
    par = np.zeros((C, 2, 7), np.float32)
    par[:, :, 0] = 1.0
    packed = np.random.default_rng(0).normal(
        0, 1, (C, S, 33)).astype(np.float32)   # garbage rows, all masked off
    s0 = empty_state(cfg)
    s1 = engine.replay_batch(
        cfg, s0, jnp.int32(0), jnp.asarray(par), jnp.asarray(packed),
        jnp.asarray(np.zeros(C, bool)), noise_odom, noise_cube)
    assert int(s1.pose_count.sum()) == 0
    assert int(s1.cyl_count) == 0
    assert int(jnp.sum(s1.overflow)) == 0
