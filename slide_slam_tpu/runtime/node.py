"""Host-side per-robot SLAM node.

The orchestration layer of the reference's SLOAMNode + InputManager
(sloamNode.cpp, inputNode.cpp) without ROS: a thin host loop that pads
measurements, drives the jitted keyframe step, and keeps the host-side
database (timestamps, body-frame measurement packets for comm and loop
closure — the PoseMstPair deque of databaseManager.h:45-73).
"""
from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..factorgraph.graph import GraphState, empty_state
from ..geometry import se3
from ..objects import Cuboids, Cylinders, Ellipsoids, pad_boxlike, pad_cylinders
from . import engine


@dataclass
class PoseMstPair:
    """One keyframe packet (== sloam_msgs/PoseMst): key pose estimate at
    insertion time, raw relative odometry, stamp, body-frame measurements."""
    stamp: float
    key_pose: np.ndarray            # [7]
    rel_odom: np.ndarray            # [7]
    cyl_root: np.ndarray
    cyl_ray: np.ndarray
    cyl_radius: np.ndarray
    cyl_label: np.ndarray
    cub_pose: np.ndarray
    cub_scale: np.ndarray
    cub_label: np.ndarray
    ell_pose: np.ndarray
    ell_scale: np.ndarray
    ell_label: np.ndarray


def packet_from_obs(stamp, key_pose, rel_odom, obs: dict) -> PoseMstPair:
    return PoseMstPair(
        stamp=float(stamp), key_pose=np.asarray(key_pose, np.float32),
        rel_odom=np.asarray(rel_odom, np.float32),
        cyl_root=obs.get("cyl_root", np.zeros((0, 3), np.float32)),
        cyl_ray=obs.get("cyl_ray", np.zeros((0, 3), np.float32)),
        cyl_radius=obs.get("cyl_radius", np.zeros((0,), np.float32)),
        cyl_label=obs.get("cyl_label", np.zeros((0,), np.int32)),
        cub_pose=obs.get("cub_pose", np.zeros((0, 7), np.float32)),
        cub_scale=obs.get("cub_scale", np.zeros((0, 3), np.float32)),
        cub_label=obs.get("cub_label", np.zeros((0,), np.int32)),
        ell_pose=obs.get("ell_pose", np.zeros((0, 7), np.float32)),
        ell_scale=obs.get("ell_scale", np.zeros((0, 3), np.float32)),
        ell_label=obs.get("ell_label", np.zeros((0,), np.int32)),
    )


@dataclass
class RobotDatabase:
    """Per-robot record (databaseManager.h:45-73)."""
    packets: List[PoseMstPair] = field(default_factory=list)
    bookmark_fg: int = 0            # next packet to fold into the factor graph
    compact_map: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 7), np.float32))


class SlamNode:
    """One robot's backend: device GraphState + host database.

    `hostRobotID` owns pose chain `robot_id` inside the shared GraphState; the
    chains of peers are filled by the replay/merge path (multi-robot)."""

    def __init__(self, cfg: SlamConfig, robot_id: int):
        self.cfg = cfg
        self.robot_id = robot_id
        self.state: GraphState = empty_state(cfg)
        self.db: Dict[int, RobotDatabase] = {robot_id: RobotDatabase()}
        self.loop_closure_tf: Dict[int, np.ndarray] = {}   # peer -> SE3 [7]
        self.key_poses: List[np.ndarray] = []              # optimized poses
        self.key_stamps: List[float] = []
        self.latest_odom: Optional[np.ndarray] = None
        self.latest_odom_stamp: float = -np.inf
        self.is_in_lc_region = False
        # runtime accounting (sloamNode.h:79-91 equivalents)
        self.data_association_time: List[float] = []
        self.fg_time: List[float] = []
        self.intra_lc_time: List[float] = []
        self.inter_lc_time: List[float] = []
        self.num_attempts_intra = 0
        self.num_success_intra = 0
        self.num_attempts_inter = 0
        self.num_success_inter = 0
        self._noise_odom = jnp.asarray(np.asarray(cfg.noise.odom, np.float32))
        self._noise_cube = jnp.asarray(np.asarray(cfg.noise.cube, np.float32))

    # ------------------------------------------------------------------
    def _pad_obs(self, p: PoseMstPair):
        S = self.cfg.capacity.max_scan_objects
        cyl = pad_cylinders(p.cyl_root, p.cyl_ray, p.cyl_radius, p.cyl_label, S)
        cub = pad_boxlike(Cuboids, p.cub_pose, p.cub_scale, p.cub_label, S)
        ell = pad_boxlike(Ellipsoids, p.ell_pose, p.ell_scale, p.ell_label, S)
        return cyl, cub, ell

    def prev_key_pose(self) -> np.ndarray:
        if self.key_poses:
            return self.key_poses[-1]
        return np.asarray(se3.identity(), np.float32)

    # ------------------------------------------------------------------
    def process_keyframe(self, stamp: float, odom_pose: np.ndarray,
                         obs: dict) -> np.ndarray:
        """Main path (inputNode.cpp:88-186 case 1/2): integrate one keyframe.

        odom_pose: the raw odometry pose synced with the observation.
        Returns the optimized key pose."""
        odom_pose = np.asarray(odom_pose, np.float32)
        if self.latest_odom is None:
            rel = np.asarray(se3.identity(), np.float32)
        else:
            rel = np.asarray(se3.between(jnp.asarray(self.latest_odom),
                                         jnp.asarray(odom_pose)), np.float32)
        prev = self.prev_key_pose()
        if not self.key_poses:
            pose_est = odom_pose  # first keyframe anchors at raw odometry
        else:
            pose_est = np.asarray(
                se3.compose(jnp.asarray(prev), jnp.asarray(rel)), np.float32)

        packet = packet_from_obs(stamp, pose_est, rel, obs)
        self.db[self.robot_id].packets.append(packet)

        new_pose = self._step(self.robot_id, pose_est, rel, packet,
                              drop=self.is_in_lc_region, solve=True)
        self.key_poses.append(np.asarray(new_pose, np.float32))
        self.key_stamps.append(float(stamp))
        self.latest_odom = odom_pose
        self.latest_odom_stamp = float(stamp)
        self.db[self.robot_id].bookmark_fg = len(self.db[self.robot_id].packets)
        return self.key_poses[-1]

    def _step(self, robot_id: int, pose_est, rel, packet: PoseMstPair,
              drop: bool, solve: bool):
        cyl, cub, ell = self._pad_obs(packet)
        t0 = time.perf_counter()
        self.state, out = engine.keyframe_step(
            self.cfg, self.state,
            jnp.int32(robot_id), jnp.asarray(pose_est), jnp.asarray(rel),
            cyl, cub, ell,
            jnp.asarray(drop), jnp.asarray(solve),
            self._noise_odom, self._noise_cube,
        )
        pose = np.asarray(out.pose)
        self.fg_time.append(time.perf_counter() - t0)
        return pose

    # ------------------------------------------------------------------
    def optimized_trajectory(self) -> np.ndarray:
        """Pull the robot's optimized pose chain off the device."""
        n = int(self.state.pose_count[self.robot_id])
        P = self.cfg.capacity.max_poses_per_robot
        base = self.robot_id * P
        return np.asarray(self.state.poses[base:base + n])

    def trajectory_of(self, robot_id: int) -> np.ndarray:
        n = int(self.state.pose_count[robot_id])
        P = self.cfg.capacity.max_poses_per_robot
        base = robot_id * P
        return np.asarray(self.state.poses[base:base + n])

    def landmark_counts(self):
        return {
            "cylinders": int(self.state.cyl_count),
            "cuboids": int(self.state.cub_count),
            "points": int(self.state.pt_count),
        }

    # ------------------------------------------------------------------
    def compact_map(self, min_hits: Optional[int] = None) -> np.ndarray:
        """Vector7d rows [label, x, y, z, dim1, dim2, dim3]
        (databaseManager.cpp:64-96, getFinalMap min-hit gating)."""
        if min_hits is None:
            min_hits = self.cfg.min_landmark_hits
        s = self.state
        rows = []
        nc = int(s.cyl_count)
        if nc:
            hits = np.asarray(s.cyl_hits[:nc])
            keep = hits >= min_hits
            root = np.asarray(s.cyl_root[:nc])[keep]
            lab = np.asarray(s.cyl_label[:nc])[keep]
            rad = np.asarray(s.cyl_radius[:nc])[keep]
            rows.append(np.concatenate([
                lab[:, None].astype(np.float32), root,
                rad[:, None], np.zeros((len(root), 2), np.float32)], axis=1))
        nk = int(s.cub_count)
        if nk:
            hits = np.asarray(s.cub_hits[:nk])
            keep = hits >= min_hits
            tr = np.asarray(s.cub_pose[:nk, 4:7])[keep]
            lab = np.asarray(s.cub_label[:nk])[keep]
            sc = np.asarray(s.cub_scale[:nk])[keep]
            rows.append(np.concatenate([
                lab[:, None].astype(np.float32), tr, sc], axis=1))
        nu = int(s.pt_count)
        if nu:
            hits = np.asarray(s.pt_hits[:nu])
            keep = hits >= min_hits
            tr = np.asarray(s.pt_pos[:nu])[keep]
            lab = np.asarray(s.pt_label[:nu])[keep]
            sc = np.asarray(s.pt_scale[:nu])[keep]
            rows.append(np.concatenate([
                lab[:, None].astype(np.float32), tr, sc], axis=1))
        if not rows:
            return np.zeros((0, 7), np.float32)
        return np.concatenate(rows, axis=0)

    def write_trajectory(self, path: str, robot_id: Optional[int] = None):
        """TUM-style `stamp x y z qx qy qz qw` (sloamNode.cpp:318-337)."""
        rid = self.robot_id if robot_id is None else robot_id
        traj = self.trajectory_of(rid)
        stamps = self.key_stamps if rid == self.robot_id else range(len(traj))
        with open(path, "w") as f:
            for st, p in zip(stamps, traj):
                qw, qx, qy, qz, x, y, z = p
                f.write(f"{st} {x} {y} {z} {qx} {qy} {qz} {qw}\n")
