"""Schur-complement solver (factorgraph/schur.py) correctness.

Validates the landmark-eliminated reduced-system solver against (a) the
unified-variable PCG solver on identical graphs and (b) the independent
float64 LM oracle (reference_solver.py) — the same proof obligations the
unified solver carries (the reference's iSAM2 eliminates variables,
graph.cpp:260-272; SURVEY §7 stage 4 names Schur reduction as the
TPU-native analog).
"""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from slide_slam_tpu.config import CapacityConfig, SlamConfig
from slide_slam_tpu.factorgraph import reference_solver as rs
from slide_slam_tpu.factorgraph import schur, solver
from slide_slam_tpu.io import synthetic
from slide_slam_tpu.runtime.node import SlamNode


def _cfg():
    # factor capacities sized so the 60-keyframe fixture fits with zero
    # drops (60 kf x <=32 obs/class): the solver proofs must run on
    # UNCLIPPED graphs — r4's 1024-factor cap silently dropped 452
    # cylinder factors from its own proof fixture (VERDICT r4 Weak #7)
    return SlamConfig(
        number_of_robots=1,
        capacity=CapacityConfig(
            max_poses_per_robot=128, max_cylinders=256, max_cuboids=64,
            max_points=64, max_scan_objects=32, max_cylinder_factors=2048,
            max_cuboid_factors=512, max_point_factors=1024,
            max_between_factors=16),
    )


@pytest.fixture(scope="module")
def logged_state():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    world = synthetic.make_forest_world(rng, n_trees=60, n_poles=10,
                                        n_cars=8, extent=30.0)
    traj = synthetic.lawnmower_trajectory(60, extent=25.0, rows=3, step=1.5)
    log = synthetic.make_log(world, traj, odom_drift_sigma=0.01,
                             pos_noise=0.03, dropout=0.1)
    node = SlamNode(cfg, robot_id=0)
    for kf in log.keyframes:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    assert sum(node.overflow_report().values()) == 0, (
        "proof fixture overflowed — resize its capacities: "
        f"{node.overflow_report()}")
    return cfg, jtu.tree_map(np.asarray, node.state)


def _perturb(state, rng, sigma=0.05):
    s = jtu.tree_map(jnp.asarray, state)
    poses = s.poses + jnp.asarray(rng.normal(0, sigma, s.poses.shape),
                                  jnp.float32)
    q = poses[:, :4] / jnp.linalg.norm(poses[:, :4], axis=1, keepdims=True)
    return s._replace(
        poses=jnp.concatenate([q, poses[:, 4:]], axis=1),
        cyl_root=s.cyl_root + jnp.asarray(
            rng.normal(0, sigma, s.cyl_root.shape), jnp.float32))


def test_schur_matches_unified_converged(logged_state):
    """From the same perturbed start, both solvers reach the same optimum
    (cost and poses) with a thorough budget."""
    cfg, state = logged_state
    rng = np.random.default_rng(3)
    s0 = _perturb(state, rng)
    kw = dict(cyl_sigma=cfg.noise.cylinder, bearing_sigma=cfg.noise.bearing,
              outer_iters=jnp.int32(16), pcg_iters=jnp.int32(256),
              pcg_tol=jnp.float32(1e-8))
    a = solver.solve(jtu.tree_map(jnp.copy, s0), **kw)
    b = schur.solve(jtu.tree_map(jnp.copy, s0), **kw)
    ca = float(solver.cost(a, cfg.noise.cylinder, cfg.noise.bearing))
    cb = float(solver.cost(b, cfg.noise.cylinder, cfg.noise.bearing))
    c0 = float(solver.cost(s0, cfg.noise.cylinder, cfg.noise.bearing))
    assert cb < 0.01 * c0            # schur genuinely descended
    assert cb < ca * 1.05 + 1e-6     # and is at least as converged
    n = int(np.asarray(a.pose_count)[0])
    pa = np.asarray(a.poses)[:n, 4:7]
    pb = np.asarray(b.poses)[:n, 4:7]
    ate = np.sqrt(np.mean(np.linalg.norm(pa - pb, axis=1) ** 2))
    assert ate < 0.05, f"solver disagreement ATE {ate:.4f} m"


def test_schur_tracks_f64_oracle(logged_state):
    """Schur solve from the logged (engine) estimate lands within 5 cm ATE
    of the independent float64 LM optimum of the same factors."""
    cfg, state = logged_state
    s = schur.solve(jtu.tree_map(jnp.asarray, state),
                    cyl_sigma=cfg.noise.cylinder,
                    bearing_sigma=cfg.noise.bearing,
                    outer_iters=jnp.int32(16), pcg_iters=jnp.int32(256),
                    pcg_tol=jnp.float32(1e-8))
    conv, _ = rs.solve_reference(jtu.tree_map(np.asarray, state),
                                 cyl_sigma=cfg.noise.cylinder,
                                 bearing_sigma=cfg.noise.bearing)
    n = int(np.asarray(s.pose_count)[0])
    est = np.asarray(s.poses)[:n, 4:7]
    gap = np.linalg.norm(conv[:n, 4:7] - est, axis=1)
    ate_gap = float(np.sqrt(np.mean(gap ** 2)))
    assert ate_gap < 0.05, f"ATE gap to oracle {ate_gap:.4f} m"


def test_schur_incremental_budget(logged_state):
    """The no-line-search incremental budget (the keyframe path) still
    descends and stays near the optimum when warm-started."""
    cfg, state = logged_state
    s0 = jtu.tree_map(jnp.asarray, state)
    c0 = float(solver.cost(s0, cfg.noise.cylinder, cfg.noise.bearing))
    s = schur.solve(s0, cyl_sigma=cfg.noise.cylinder,
                    bearing_sigma=cfg.noise.bearing,
                    outer_iters=jnp.int32(1), pcg_iters=jnp.int32(16),
                    pcg_tol=jnp.float32(1e-3), line_search=False)
    c1 = float(solver.cost(s, cfg.noise.cylinder, cfg.noise.bearing))
    assert c1 <= c0 * 1.01 + 1e-6
