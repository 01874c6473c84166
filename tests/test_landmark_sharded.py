"""Landmark-axis sharded BA (parallel/landmark_sharded.py): partitioning
the landmark arrays across devices must preserve the solution — poses
replicated + psum-reduced Schur corrections, landmarks/factors local."""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest
from jax.sharding import Mesh

from slide_slam_tpu.config import CapacityConfig, SlamConfig
from slide_slam_tpu.factorgraph import schur
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.parallel import landmark_sharded as ls
from slide_slam_tpu.runtime.node import SlamNode


def small_cfg():
    return SlamConfig(
        number_of_robots=2,
        capacity=CapacityConfig(
            max_poses_per_robot=64, max_cylinders=128, max_cuboids=64,
            max_points=64, max_scan_objects=32, max_cylinder_factors=1024,
            max_cuboid_factors=512, max_point_factors=512,
            max_between_factors=32,
        ),
    )


@pytest.fixture(scope="module")
def populated_state():
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
    stacked = ls.shard_state_by_landmark(state, 4)
    # per-shard landmark counts sum to the total
    assert int(np.sum(np.asarray(stacked.cyl_count))) == int(state.cyl_count)
    assert int(np.sum(np.asarray(stacked.cf_count))) == int(state.cf_count)
    # factors landed on the shard owning their landmark
    shard_cap = np.asarray(stacked.cyl_ray).shape[1]
    for shard in range(4):
        k = int(np.asarray(stacked.cf_count)[shard])
        lm = np.asarray(stacked.cf_lm)[shard, :k]
        assert np.all(lm < shard_cap), "local lm index out of shard block"
    # unshard restores the landmark layout exactly (no solve in between)
    restored = ls.unshard_state_by_landmark(stacked, state)
    np.testing.assert_array_equal(np.asarray(restored.cyl_root),
                                  np.asarray(state.cyl_root))
    np.testing.assert_array_equal(np.asarray(restored.poses),
                                  np.asarray(state.poses))


def test_landmark_sharded_matches_local(populated_state):
    cfg, state = populated_state
    # compare AT the optimum (the established distributed-parity protocol,
    # tests/test_distributed_ba.py): pre-converge locally, then both
    # solvers must stay put
    kw = dict(cyl_sigma=cfg.noise.cylinder, bearing_sigma=cfg.noise.bearing,
              outer_iters=jnp.int32(cfg.solver.max_outer_iterations),
              pcg_iters=jnp.int32(cfg.solver.pcg_max_iterations),
              pcg_tol=jnp.float32(cfg.solver.pcg_tol))
    state = schur.solve(jtu.tree_map(jnp.copy, state), **kw)
    local = schur.solve(jtu.tree_map(jnp.copy, state), **kw)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("lm",))
    dist = ls.landmark_sharded_solve(state, cfg, mesh)
    np.testing.assert_allclose(np.asarray(dist.poses),
                               np.asarray(local.poses), atol=1e-2)
    np.testing.assert_allclose(np.asarray(dist.cyl_root),
                               np.asarray(local.cyl_root), atol=1e-2)
    np.testing.assert_allclose(np.asarray(dist.pt_pos),
                               np.asarray(local.pt_pos), atol=1e-2)
