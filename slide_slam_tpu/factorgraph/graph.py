"""Fixed-capacity factor-graph state.

Replaces GTSAM's NonlinearFactorGraph/ISAM2 (graph.h:68-159,
graphWrapper.h:23-138) with struct-of-array storage:

* Variables: pose chains for up to R robots (slot = robot * P + pose_idx),
  cylinder landmarks (7-dof), cuboid landmarks (9-dof), point landmarks
  (3-dof). Landmark arrays double as the semantic map (the reference keeps a
  separate map manager and syncs it back after every solve,
  graphWrapper.cpp:259-275 — here they are the same memory).
* Factors: the per-robot odometry chain is implicit (slot i stores the
  measured motion prev->i); loop-closure/relative-measurement between
  factors, cylinder factors, cuboid factors and bearing-range factors are
  typed arrays with validity masks.

Everything is a pytree of jnp arrays; counts are traced scalars so the whole
keyframe path can live under one jit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import se3


OVERFLOW_FIELDS = ("poses", "cylinders", "cuboids", "points",
                   "cylinder_factors", "cuboid_factors", "point_factors",
                   "between_factors")


class GraphState(NamedTuple):
    # ---- variables -------------------------------------------------------
    poses: jnp.ndarray        # [R*P, 7]
    pose_count: jnp.ndarray   # [R] int32
    prior_pose: jnp.ndarray   # [R, 7] anchor value for each robot chain
    prior_valid: jnp.ndarray  # [R] bool
    # (timestamps stay host-side in the database — they need f64)

    cyl_ray: jnp.ndarray      # [NC, 3]
    cyl_root: jnp.ndarray     # [NC, 3]
    cyl_radius: jnp.ndarray   # [NC]
    cyl_label: jnp.ndarray    # [NC] int32
    cyl_hits: jnp.ndarray     # [NC] int32
    cyl_count: jnp.ndarray    # int32

    cub_pose: jnp.ndarray     # [NK, 7]
    cub_scale: jnp.ndarray    # [NK, 3]
    cub_label: jnp.ndarray    # [NK] int32
    cub_hits: jnp.ndarray     # [NK] int32
    cub_count: jnp.ndarray    # int32

    pt_pos: jnp.ndarray       # [NU, 3]
    pt_scale: jnp.ndarray     # [NU, 3] ellipsoid dims (metadata, set at insert)
    pt_label: jnp.ndarray     # [NU] int32
    pt_hits: jnp.ndarray      # [NU] int32
    pt_count: jnp.ndarray     # int32

    # ---- factors ---------------------------------------------------------
    odom_rel: jnp.ndarray     # [R*P, 7] measured motion (slot-1 -> slot)
    odom_sigma: jnp.ndarray   # [R*P, 6]

    bf_i: jnp.ndarray         # [NB] int32 pose slot
    bf_j: jnp.ndarray         # [NB] int32 pose slot
    bf_rel: jnp.ndarray       # [NB, 7]
    bf_sigma: jnp.ndarray     # [NB, 6]
    bf_count: jnp.ndarray     # int32

    cf_pose: jnp.ndarray      # [F1] int32 pose slot
    cf_lm: jnp.ndarray        # [F1] int32 cylinder index
    cf_meas: jnp.ndarray      # [F1, 7]  [ray, root, radius] in body frame
    cf_count: jnp.ndarray     # int32

    kf_pose: jnp.ndarray      # [F2] int32
    kf_lm: jnp.ndarray        # [F2] int32
    kf_meas_pose: jnp.ndarray   # [F2, 7] body frame
    kf_meas_scale: jnp.ndarray  # [F2, 3]
    kf_sigma: jnp.ndarray     # [F2, 9]
    kf_count: jnp.ndarray     # int32

    uf_pose: jnp.ndarray      # [F3] int32
    uf_lm: jnp.ndarray        # [F3] int32 point index
    uf_bearing: jnp.ndarray   # [F3, 3] unit vector, body frame
    uf_range: jnp.ndarray     # [F3]
    uf_count: jnp.ndarray     # int32

    # ---- bookkeeping -----------------------------------------------------
    keypose_xyz: jnp.ndarray  # [R*P, 3] key pose positions (for LC queries)
    # cumulative capacity-overflow counters, indexed by OVERFLOW_FIELDS:
    # [poses, cyl_lm, cub_lm, pt_lm, cyl_f, cub_f, pt_f, between_f] — every
    # dropped append is counted here so silent truncation is host-visible
    # (runtime-analysis txt; the reference grows std::vectors and never
    # drops, so any nonzero counter means "raise the capacity preset")
    overflow: jnp.ndarray     # [8] int32

    @property
    def num_robots(self) -> int:
        return self.prior_pose.shape[0]

    @property
    def poses_per_robot(self) -> int:
        return self.poses.shape[0] // self.prior_pose.shape[0]

    def pose_slot(self, robot, idx):
        return robot * self.poses_per_robot + idx

    # masks -----------------------------------------------------------------
    def pose_valid(self) -> jnp.ndarray:
        P = self.poses_per_robot
        idx = jnp.arange(self.poses.shape[0]) % P
        rid = jnp.arange(self.poses.shape[0]) // P
        return idx < self.pose_count[rid]

    def odom_valid(self) -> jnp.ndarray:
        P = self.poses_per_robot
        idx = jnp.arange(self.poses.shape[0]) % P
        rid = jnp.arange(self.poses.shape[0]) // P
        return (idx >= 1) & (idx < self.pose_count[rid])

    def cyl_valid(self) -> jnp.ndarray:
        return jnp.arange(self.cyl_ray.shape[0]) < self.cyl_count

    def cub_valid(self) -> jnp.ndarray:
        return jnp.arange(self.cub_pose.shape[0]) < self.cub_count

    def pt_valid(self) -> jnp.ndarray:
        return jnp.arange(self.pt_pos.shape[0]) < self.pt_count

    def bf_valid(self) -> jnp.ndarray:
        return jnp.arange(self.bf_i.shape[0]) < self.bf_count

    def cf_valid(self) -> jnp.ndarray:
        return jnp.arange(self.cf_pose.shape[0]) < self.cf_count

    def kf_valid(self) -> jnp.ndarray:
        return jnp.arange(self.kf_pose.shape[0]) < self.kf_count

    def uf_valid(self) -> jnp.ndarray:
        return jnp.arange(self.uf_pose.shape[0]) < self.uf_count

    def cyl_lm7(self) -> jnp.ndarray:
        """Landmark cylinders as 7-vectors [ray, root, radius]."""
        return jnp.concatenate(
            [self.cyl_ray, self.cyl_root, self.cyl_radius[:, None]], axis=-1
        )


def empty_state(cfg: SlamConfig, dtype=jnp.float32) -> GraphState:
    R = cfg.number_of_robots
    P = cfg.capacity.max_poses_per_robot
    NC = cfg.capacity.max_cylinders
    NK = cfg.capacity.max_cuboids
    NU = cfg.capacity.max_points
    NB = cfg.capacity.max_between_factors
    F1 = cfg.capacity.max_cylinder_factors
    F2 = cfg.capacity.max_cuboid_factors
    F3 = cfg.capacity.max_point_factors
    i32 = jnp.int32
    return GraphState(
        poses=se3.identity((R * P,), dtype),
        pose_count=jnp.zeros((R,), i32),
        prior_pose=se3.identity((R,), dtype),
        prior_valid=jnp.zeros((R,), bool),
        cyl_ray=jnp.tile(jnp.array([[0.0, 0.0, 1.0]], dtype), (NC, 1)),
        cyl_root=jnp.zeros((NC, 3), dtype),
        cyl_radius=jnp.zeros((NC,), dtype),
        cyl_label=jnp.zeros((NC,), i32),
        cyl_hits=jnp.zeros((NC,), i32),
        cyl_count=jnp.zeros((), i32),
        cub_pose=se3.identity((NK,), dtype),
        cub_scale=jnp.zeros((NK, 3), dtype),
        cub_label=jnp.zeros((NK,), i32),
        cub_hits=jnp.zeros((NK,), i32),
        cub_count=jnp.zeros((), i32),
        pt_pos=jnp.zeros((NU, 3), dtype),
        pt_scale=jnp.zeros((NU, 3), dtype),
        pt_label=jnp.zeros((NU,), i32),
        pt_hits=jnp.zeros((NU,), i32),
        pt_count=jnp.zeros((), i32),
        odom_rel=se3.identity((R * P,), dtype),
        odom_sigma=jnp.ones((R * P, 6), dtype),
        bf_i=jnp.zeros((NB,), i32),
        bf_j=jnp.zeros((NB,), i32),
        bf_rel=se3.identity((NB,), dtype),
        bf_sigma=jnp.ones((NB, 6), dtype),
        bf_count=jnp.zeros((), i32),
        cf_pose=jnp.zeros((F1,), i32),
        cf_lm=jnp.zeros((F1,), i32),
        cf_meas=jnp.zeros((F1, 7), dtype),
        cf_count=jnp.zeros((), i32),
        kf_pose=jnp.zeros((F2,), i32),
        kf_lm=jnp.zeros((F2,), i32),
        kf_meas_pose=se3.identity((F2,), dtype),
        kf_meas_scale=jnp.zeros((F2, 3), dtype),
        kf_sigma=jnp.ones((F2, 9), dtype),
        kf_count=jnp.zeros((), i32),
        uf_pose=jnp.zeros((F3,), i32),
        uf_lm=jnp.zeros((F3,), i32),
        uf_bearing=jnp.tile(jnp.array([[1.0, 0.0, 0.0]], dtype), (F3, 1)),
        uf_range=jnp.zeros((F3,), dtype),
        uf_count=jnp.zeros((), i32),
        keypose_xyz=jnp.zeros((R * P, 3), dtype),
        overflow=jnp.zeros((8,), i32),
    )


def noise_arrays(cfg: SlamConfig):
    """Materialize the noise config as arrays (see graphWrapper.cpp:26-65)."""
    n = cfg.noise
    return {
        "odom": np.asarray(n.odom, np.float32),
        "closure": np.asarray(n.odom, np.float32) * n.closure_scale,
        "rel_meas": np.asarray(n.rel_meas, np.float32),
        "cube": np.asarray(n.cube, np.float32),
        "cylinder": np.float32(n.cylinder),
        "bearing": np.float32(n.bearing),
        "floor": np.float32(n.noise_floor),
    }
