"""Capacity-overflow semantics: appends past any fixed capacity are DROPPED
(never scattered out of bounds / into a neighboring robot's chain) and every
drop is counted in `GraphState.overflow`, surfaced via the runtime-analysis
txt. The reference grows std::vectors and never drops (graph.cpp,
cylinderMapManager.cpp:35-68); under XLA static shapes the equivalent safety
bar is: no silent corruption, no silent truncation.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from slide_slam_tpu.config import CapacityConfig, SlamConfig, SolverConfig
from slide_slam_tpu.factorgraph.graph import OVERFLOW_FIELDS, empty_state
from slide_slam_tpu.geometry import se3np
from slide_slam_tpu.runtime import engine
from slide_slam_tpu.runtime.node import SlamNode


def _tiny_cfg(P=8, **cap_kw):
    return SlamConfig(
        number_of_robots=2,
        capacity=CapacityConfig(
            max_poses_per_robot=P, max_cylinders=32, max_cuboids=16,
            max_points=16, max_scan_objects=8, max_cylinder_factors=64,
            max_cuboid_factors=32, max_point_factors=32,
            max_between_factors=4, **cap_kw),
        solver=SolverConfig(max_outer_iterations=2, pcg_max_iterations=8,
                            incremental_outer_iterations=1,
                            incremental_pcg_iterations=8),
    )


def _run_keyframes(node, n, step=0.6):
    rng = np.random.default_rng(0)
    for i in range(n):
        odom = se3np.from_xyz_yaw(step * i, 0.0, 0.0, 0.0)
        obs = {
            "cyl_root": np.array([[step * i + 2.0, 1.0, 0.0]], np.float32),
            "cyl_ray": np.array([[0.0, 0.0, 1.0]], np.float32),
            "cyl_radius": np.array([0.2], np.float32),
            "cyl_label": np.array([8], np.int32),
        }
        node.process_keyframe(float(i), odom, obs)


def test_pose_overflow_no_cross_chain_corruption():
    """Run a log 2x past max_poses_per_robot: robot 0's chain must cap at P,
    robot 1's chain must stay untouched, and the drop must be reported."""
    P = 8
    cfg = _tiny_cfg(P=P)
    node = SlamNode(cfg, robot_id=0)
    _run_keyframes(node, 2 * P)

    s = node.state
    counts = np.asarray(s.pose_count)
    assert counts[0] == P                      # capped, not grown
    assert counts[1] == 0                      # untouched
    # robot 1's pose slots are still identity (no cross-chain scatter)
    poses = np.asarray(s.poses)
    np.testing.assert_allclose(poses[P:2 * P],
                               np.tile(se3np.identity(), (P, 1)), atol=0)
    # overflow is host-visible
    rep = node.overflow_report()
    assert rep["overflow_poses"] == P
    # overflowed keyframes drop their factors too (no dangling references)
    assert int(s.cf_count) <= cfg.capacity.max_cylinder_factors
    cf = np.asarray(s.cf_pose)[:int(s.cf_count)]
    assert cf.max() < P                        # all factors on robot 0 chain
    # host mirror still has 2P key_poses; device chain has P — trajectory
    # reflects the surviving chain
    assert len(node.optimized_trajectory()) == P


def test_overflow_report_in_runtime_analysis(tmp_path):
    P = 4
    cfg = _tiny_cfg(P=P)
    node = SlamNode(cfg, robot_id=0)
    _run_keyframes(node, P + 3)
    path = str(tmp_path / "runtime.txt")
    node.write_runtime_analysis(path)
    txt = open(path).read()
    assert "overflow_poses: 3" in txt
    for name in OVERFLOW_FIELDS:
        assert f"overflow_{name}:" in txt


def test_between_factor_overflow_drops_not_corrupts():
    cfg = _tiny_cfg()
    s = empty_state(cfg)
    NB = cfg.capacity.max_between_factors
    rel = jnp.asarray(se3np.from_xyz_yaw(1.0, 0, 0, 0))
    sig = jnp.ones(6)
    for k in range(NB + 3):
        s = engine.add_between_factor(cfg, s, jnp.int32(k), jnp.int32(k + 1),
                                      rel, sig)
    assert int(s.bf_count) == NB
    # the LAST stored factor is the NB-th append, not the (NB+3)-th
    assert int(np.asarray(s.bf_i)[NB - 1]) == NB - 1
    assert int(np.asarray(s.overflow)[7]) == 3


def test_landmark_overflow_counts_drops():
    """More distinct landmarks than max_cylinders: count drops, factors on
    dropped landmarks are dropped too."""
    cfg = _tiny_cfg()
    NC = cfg.capacity.max_cylinders
    node = SlamNode(cfg, robot_id=0)
    rng = np.random.default_rng(1)
    n_per = 8
    for i in range(6):   # 48 landmark insert attempts vs NC=32
        odom = se3np.from_xyz_yaw(0.6 * i, 0.0, 0.0, 0.0)
        roots = rng.uniform(-40, 40, (n_per, 3)).astype(np.float32)
        roots[:, 2] = 0.0
        obs = {
            "cyl_root": roots,
            "cyl_ray": np.tile(np.array([[0, 0, 1.0]], np.float32), (n_per, 1)),
            "cyl_radius": np.full(n_per, 0.2, np.float32),
            "cyl_label": np.full(n_per, 8, np.int32),
        }
        node.process_keyframe(float(i), odom, obs)
    s = node.state
    assert int(s.cyl_count) == NC
    rep = node.overflow_report()
    assert rep["overflow_cylinders"] > 0
    # every stored factor references an in-range landmark
    cf_lm = np.asarray(s.cf_lm)[:int(s.cf_count)]
    assert cf_lm.max() < NC
    assert rep["overflow_cylinder_factors"] >= rep["overflow_cylinders"]
