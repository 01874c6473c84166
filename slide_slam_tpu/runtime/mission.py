"""Single-host multi-robot mission runner.

Replaces the reference's tmux/roslaunch demo layer
(multi_robot_utils_launch/script/tmux_multi_robot_with_bags_*.sh +
decentralized_sloam.launch): N decentralized SlamNodes replaying per-robot
measurement logs on one simulated clock, with intermittent communication
every `communication_wait_time` seconds of sim time, inter/intra
place-recognition attempts at their configured frequencies, and relative
inter-robot factor generation at 1 Hz — the same event structure the
reference builds from ROS timers (inputNode.cpp:16, databaseManager.cpp:14,
sloamNode.cpp:46-48)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import SlamConfig
from ..io.synthetic import RobotLog
from ..place_recognition.slidematch import SlideMatchDims
from . import scheduler
from .node import SlamNode
from .profiling import phase


@dataclass
class MissionReport:
    nodes: List[SlamNode]

    def trajectories(self) -> Dict[int, np.ndarray]:
        return {n.robot_id: n.optimized_trajectory() for n in self.nodes}


class MultiRobotMission:
    def __init__(self, cfg: SlamConfig, logs: Sequence[RobotLog],
                 prior_tf_known: bool = False,
                 prior_tf_xyz: Optional[dict] = None,
                 slidematch_dims: Optional[SlideMatchDims] = None,
                 relative_meas: Optional[List] = None):
        """relative_meas: optional list of (receiving_robot_id,
        scheduler.RelativeMeas) AprilTag-style sightings to inject."""
        self.cfg = cfg
        self.logs = list(logs)
        self.nodes = [
            SlamNode(cfg, log.robot_id, prior_tf_known=prior_tf_known,
                     prior_tf_xyz=(prior_tf_xyz or {}).get(log.robot_id),
                     slidematch_dims=slidematch_dims)
            for log in self.logs
        ]
        self.by_id = {n.robot_id: n for n in self.nodes}
        self.relative_meas = relative_meas or []

    def run(self, intra_lc: bool = False, verbose: bool = False,
            final_solve: bool = True) -> MissionReport:
        cfg = self.cfg
        events = []   # (stamp, order, kind, payload)
        for log in self.logs:
            for kf in log.keyframes:
                events.append((kf.stamp, 0, "keyframe", (log.robot_id, kf)))
        for rid, meas in self.relative_meas:
            events.append((meas.stamp, 1, "relative", (rid, meas)))
        t0 = min(e[0] for e in events)
        t1 = max(e[0] for e in events)
        for t in np.arange(t0, t1 + 1e-6, cfg.communication_wait_time):
            events.append((float(t), 2, "comm", None))
        lc_period = 1.0 / cfg.inter_robot_place_recognition_frequency
        for t in np.arange(t0 + 1.0, t1 + 1e-6, min(lc_period, t1 - t0 + 1.0)):
            events.append((float(t), 3, "inter_lc", None))
        if intra_lc:
            intra_period = 1.0 / cfg.intra_robot_place_recognition_frequency
            for t in np.arange(t0 + 1.0, t1 + 1e-6,
                               min(intra_period, t1 - t0 + 1.0)):
                events.append((float(t), 4, "intra_lc", None))
        for t in np.arange(t0, t1 + 1e-6, 1.0 / cfg.rel_inter_robot_factor_frequency):
            events.append((float(t), 5, "rel_factor", None))
        events.sort(key=lambda e: (e[0], e[1]))

        for stamp, _, kind, payload in events:
            if kind == "keyframe":
                rid, kf = payload
                self.by_id[rid].process_keyframe(kf.stamp, kf.odom_pose,
                                                 vars(kf))
            elif kind == "relative":
                rid, meas = payload
                if not meas.only_use_odom:
                    self.by_id[rid].add_relative_measurement(meas)
            elif kind == "comm":
                self._exchange(stamp)
            elif kind == "inter_lc":
                for n in self.nodes:
                    found = n.attempt_inter_loop_closure()
                    if found and verbose:
                        print(f"[t={stamp:.1f}] robot {n.robot_id} found TF "
                              f"to {found}")
            elif kind == "intra_lc":
                for n in self.nodes:
                    n.attempt_intra_loop_closure()
            elif kind == "rel_factor":
                for n in self.nodes:
                    n.process_relative_factors()

        # final flush: one last exchange + merge so trailing keyframes that
        # arrived after the last comm tick are folded in everywhere
        self._exchange(t1 + 10 * cfg.communication_wait_time)
        for n in self.nodes:
            found = n.attempt_inter_loop_closure()
            if found and verbose:
                print(f"[final] robot {n.robot_id} found TF to {found}")
            n.replay_peers()
            n.process_relative_factors()
        if final_solve:
            # finalize: one thorough solve per node (the converged budget the
            # post-closure path uses) so exported trajectories/maps reflect
            # the optimum rather than the last real-time incremental nudge
            from . import engine
            for n in self.nodes:
                n.state = engine.solve_full(cfg, n.state)
                n.refresh_poses()
        return MissionReport(self.nodes)

    def _exchange(self, now: float):
        """All-to-all bundle exchange (databaseManager.cpp:219-279 + the
        per-robot subscriptions :57-60)."""
        with phase("comm_exchange"):
            self._exchange_inner(now)

    def _exchange_inner(self, now: float):
        all_bundles = []
        for n in self.nodes:
            if n.dbm.should_communicate(now):
                n.refresh_robot_map()
                all_bundles.append((n.robot_id, n.dbm.make_bundles(now)))
        for sender, bundles in all_bundles:
            for n in self.nodes:
                if n.robot_id == sender:
                    continue
                for b in bundles:
                    n.dbm.ingest_bundle(b)
