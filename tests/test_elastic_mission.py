"""Robot join / crash / restart resilience (the reference's designed
failure mode).

Parity target: databaseManager.cpp:98-144, 219-279 — intermittent comm IS
the failure model: the periodic full-database rebroadcast makes joins and
drops idempotent (ingest is by length diff, robots are discovered lazily),
and a crashed node restarts empty and re-receives peer data (its own
history is lost — reference behavior). This repo adds real checkpointing
(io/checkpoint.py) on top, so a restored node also keeps its own history.
"""
import numpy as np
import pytest

from slide_slam_tpu.config import CapacityConfig, SlamConfig
from slide_slam_tpu.io import checkpoint, synthetic
from slide_slam_tpu.runtime.node import SlamNode

N_KF = 30
T_CRASH = 15        # keyframe index of the crash/join event


def small_cfg():
    return SlamConfig(
        number_of_robots=3,
        communication_wait_time=3.0,
        capacity=CapacityConfig(
            max_poses_per_robot=128, max_cylinders=512, max_cuboids=256,
            max_points=128, max_scan_objects=48, max_cylinder_factors=4096,
            max_cuboid_factors=2048, max_point_factors=1024,
            max_between_factors=64,
        ),
    )


@pytest.fixture(scope="module")
def logs():
    rng = np.random.default_rng(11)
    world = synthetic.make_forest_world(rng, n_trees=60, n_poles=10,
                                        n_cars=8, extent=30.0)
    base = synthetic.lawnmower_trajectory(N_KF, extent=22.0, rows=2, step=2.0)
    out = []
    for r, (dx, dy) in enumerate([(0.0, 0.0), (7.0, 5.0), (-6.0, 4.0)]):
        traj = base.copy()
        traj[:, 4] += dx
        traj[:, 5] += dy
        out.append(synthetic.make_log(world, traj, robot_id=r, seed=20 + r,
                                      odom_drift_sigma=0.005, pos_noise=0.02,
                                      dropout=0.05, dt=0.5, t0=1000.0))
    return out


def exchange(nodes, now, rounds=1):
    """All-to-all full-database rebroadcast (mission._exchange without the
    rate gate)."""
    for _ in range(rounds):
        bundles = []
        for n in nodes:
            n.refresh_robot_map()
            bundles.append((n.robot_id, n.dbm.make_bundles(now)))
        for sender, bs in bundles:
            for n in nodes:
                if n.robot_id != sender:
                    for b in bs:
                        n.dbm.ingest_bundle(b)


def feed(node, log, lo, hi):
    for kf in log.keyframes[lo:hi]:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))


def db_len(node, rid):
    rec = node.dbm.records.get(rid)
    return 0 if rec is None else len(rec.packets)


@pytest.mark.slow
def test_robot_joins_mid_mission(logs):
    """A third robot appears halfway; lazy discovery + rebroadcast give it
    the full pre-join history of the others, and its data reaches all."""
    cfg = small_cfg()
    n0 = SlamNode(cfg, 0, prior_tf_known=True)
    n1 = SlamNode(cfg, 1, prior_tf_known=True)
    feed(n0, logs[0], 0, T_CRASH)
    feed(n1, logs[1], 0, T_CRASH)
    exchange([n0, n1], now=1010.0)

    n2 = SlamNode(cfg, 2, prior_tf_known=True)          # late joiner
    nodes = [n0, n1, n2]
    feed(n0, logs[0], T_CRASH, N_KF)
    feed(n1, logs[1], T_CRASH, N_KF)
    feed(n2, logs[2], T_CRASH, N_KF)                    # only its own tail
    exchange(nodes, now=1020.0, rounds=2)

    # joiner received the FULL histories recorded before it existed
    assert db_len(n2, 0) == N_KF and db_len(n2, 1) == N_KF
    # veterans discovered the joiner lazily and hold its whole (short) run
    assert db_len(n0, 2) == N_KF - T_CRASH
    assert db_len(n1, 2) == N_KF - T_CRASH
    # and fold it into their graphs (merge replay)
    for n in nodes:
        n.replay_peers()
    assert int(n0.state.pose_count[2]) == N_KF - T_CRASH
    assert int(n2.state.pose_count[0]) == N_KF


def test_crash_and_fresh_restart(logs):
    """Reference semantics: a crashed robot restarts EMPTY, re-receives
    peers' data via rebroadcast; its own pre-crash history survives only
    in the peers' databases (and their graphs). No corruption either way."""
    cfg = small_cfg()
    nodes = [SlamNode(cfg, r, prior_tf_known=True) for r in range(3)]
    for n, log in zip(nodes, logs):
        feed(n, log, 0, T_CRASH)
    exchange(nodes, now=1010.0)

    nodes[1] = SlamNode(cfg, 1, prior_tf_known=True)    # crash + fresh boot
    for n, log in zip(nodes, logs):
        feed(n, log, T_CRASH, N_KF)
    exchange(nodes, now=1020.0, rounds=2)

    n0, n1, n2 = nodes
    # restarted node re-learned peers' FULL histories
    assert db_len(n1, 0) == N_KF and db_len(n1, 2) == N_KF
    # peers keep the pre-crash history; the restarted node's shorter new
    # stream must NOT overwrite or corrupt it (ingest is by length diff)
    assert db_len(n0, 1) == T_CRASH
    assert db_len(n2, 1) == T_CRASH
    # restarted node keeps building its own chain from scratch
    assert int(n1.state.pose_count[1]) == N_KF - T_CRASH
    for n in nodes:
        n.replay_peers()
    assert int(n1.state.pose_count[0]) == N_KF
    assert int(n0.state.pose_count[1]) == T_CRASH       # pre-crash fold only


def test_crash_and_checkpoint_restore(logs, tmp_path):
    """With checkpoint/resume (beyond the reference), the restored node
    keeps its own history, so the whole fleet re-converges to identical
    databases."""
    cfg = small_cfg()
    nodes = [SlamNode(cfg, r, prior_tf_known=True) for r in range(3)]
    for n, log in zip(nodes, logs):
        feed(n, log, 0, T_CRASH)
    exchange(nodes, now=1010.0)

    ckpt = str(tmp_path / "robot1")
    checkpoint.save_node(ckpt, nodes[1])
    nodes[1] = checkpoint.load_node(ckpt, cfg)          # crash + restore
    for n, log in zip(nodes, logs):
        feed(n, log, T_CRASH, N_KF)
    exchange(nodes, now=1020.0, rounds=2)
    for n in nodes:
        n.replay_peers()

    # full convergence: every node holds every robot's complete history
    for n in nodes:
        for rid in range(3):
            have = (len(n.dbm.host_record().packets) if rid == n.robot_id
                    else db_len(n, rid))
            assert have == N_KF, (n.robot_id, rid, have)
        for rid in range(3):
            assert int(n.state.pose_count[rid]) == N_KF
    # the restored node's own trajectory spans the whole mission and is
    # metrically sane
    est = nodes[1].optimized_trajectory()
    assert len(est) == N_KF
    truth = np.stack([kf.true_pose for kf in logs[1].keyframes])
    ate = synthetic.ate_rmse(est, truth, align=False)
    assert ate < 1.0, ate
