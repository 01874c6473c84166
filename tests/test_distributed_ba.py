"""Distributed (factor-sharded) BA must match the single-device solve."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from slide_slam_tpu.config import CapacityConfig, SlamConfig
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.parallel import distributed_ba
from slide_slam_tpu.runtime import engine
from slide_slam_tpu.runtime.node import SlamNode


def small_cfg():
    return SlamConfig(
        number_of_robots=2,
        capacity=CapacityConfig(
            max_poses_per_robot=64, max_cylinders=128, max_cuboids=64,
            max_points=64, max_scan_objects=32, max_cylinder_factors=1024,
            max_cuboid_factors=256, max_point_factors=256,
            max_between_factors=32,
        ),
    )


@pytest.fixture(scope="module")
def populated_state():
    """A state with real factors, solved once incrementally."""
    cfg = small_cfg()
    rng = np.random.default_rng(0)
    world = synthetic.make_forest_world(rng, n_trees=30, n_poles=6, n_cars=6,
                                        extent=20.0)
    traj = synthetic.lawnmower_trajectory(25, extent=16.0, rows=2, step=1.5)
    log = synthetic.make_log(world, traj, odom_drift_sigma=0.02, seed=1)
    node = SlamNode(cfg, robot_id=0)
    for kf in log.keyframes:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    return cfg, node.state


def test_shard_roundtrip(populated_state):
    cfg, state = populated_state
    stacked = distributed_ba.shard_state(state, 4)
    # shard counts sum to the original
    assert int(np.sum(np.asarray(stacked.cf_count))) == int(state.cf_count)
    assert int(np.sum(np.asarray(stacked.kf_count))) == int(state.kf_count)
    # variables replicated
    np.testing.assert_array_equal(np.asarray(stacked.poses[0]),
                                  np.asarray(stacked.poses[3]))


def test_distributed_matches_local(populated_state):
    cfg, state = populated_state
    # pre-converge: both solvers are budgeted approximations, so compare
    # them AT the optimum, where identical math must stay put (the
    # interesting property — sharded psum reductions == local reductions)
    state = engine.solve_full(cfg, jax.tree_util.tree_map(jnp.copy, state))
    local = engine.solve_full(cfg, jax.tree_util.tree_map(jnp.copy, state))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("shard",))
    dist = distributed_ba.distributed_solve(state, cfg, mesh)
    # atol: both are f32 budgeted solvers whose segment reductions sum in
    # different orders (local sort plan vs per-shard plans + psum)
    np.testing.assert_allclose(np.asarray(dist.poses),
                               np.asarray(local.poses), atol=1e-2)
    # landmark comparison restricted to WELL-OBSERVED cylinders: cylinder
    # residuals are whitened by 1/400 (sigma), so moving a k-hit landmark
    # d meters changes the cost by ~k*(d/400)^2 — for small k that is
    # below both solvers' rel_tol stopping criterion (1e-6) and their
    # positions legitimately disagree within the stopping tolerance
    # (measured: 10 cm at 3 hits -> 1.5 cm at 8 hits). Compare the
    # landmarks the data actually pins.
    hits = np.asarray(state.cyl_hits)
    well = hits >= 8
    assert well.sum() >= 20        # the check must still cover the map
    np.testing.assert_allclose(np.asarray(dist.cyl_root)[well],
                               np.asarray(local.cyl_root)[well], atol=2e-2)
