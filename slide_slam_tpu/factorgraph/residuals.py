"""Factor residuals on object-landmark manifolds.

Re-derivations of the reference's GTSAM factors with JAX autodiff Jacobians
(the reference uses numerical differentiation with step 1e-6,
cylinderFactor.cpp:40-49, cubeFactor.cpp:41-51 — forward-mode AD here is both
exact and cheap).

Conventions (GTSAM-compatible):
* pose tangent xi = [omega(3), v(3)], right retraction p*Exp(xi);
* cylinder manifold dim 7, tangent order [ray(3), root(3), radius]
  (cylinderFactor.h:45-64);
* cuboid manifold dim 9, tangent [se3 log(6), scale(3)] (cubeFactor.h:46-114);
* residuals are whitened by 1/sigma outside these functions.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry import se3

# ---------------------------------------------------------------------------
# Pose factors
# ---------------------------------------------------------------------------


def prior_residual(pose, prior_pose):
    """GTSAM PriorFactor<Pose3>: Log(prior^-1 * pose)."""
    return se3.local(prior_pose, pose)


def between_residual(pose_i, pose_j, measured_rel):
    """GTSAM BetweenFactor<Pose3>: Log(measured^-1 * (pose_i^-1 pose_j)).

    Covers odometry (graph.cpp:44-69), loop closure (:233-245) and relative
    inter-robot factors (:247-258)."""
    return se3.local(measured_rel, se3.between(pose_i, pose_j))


# ---------------------------------------------------------------------------
# Cylinder factor (7-dim)
# ---------------------------------------------------------------------------


def cylinder_project(root, ray, radius, pose):
    """CylinderMeasurement::project (cylinderFactor.h:71-77): body -> map."""
    return se3.apply(pose, root), se3.rotate(pose, ray), radius


def cylinder_residual(pose, lm, meas_local):
    """CylinderFactor error (cylinderFactor.cpp:20-51).

    lm, meas_local: 7-vectors [ray(3), root(3), radius] — landmark in map
    frame, measurement in body frame. error = proj(meas).localCoordinates(lm):
    [lm.ray - proj.ray, lm.root - proj.root, proj.radius - lm.radius]
    (cylinderFactor.h:45-51)."""
    m_ray, m_root, m_rad = meas_local[0:3], meas_local[3:6], meas_local[6]
    p_root, p_ray, p_rad = cylinder_project(m_root, m_ray, m_rad, pose)
    return jnp.concatenate([
        lm[0:3] - p_ray,
        lm[3:6] - p_root,
        (p_rad - lm[6])[None],
    ])


def cylinder_retract(lm, delta):
    """Component-wise retraction (cylinderFactor.h:59-64)."""
    return lm + delta


def cylinder_to_local(lm_world, pose):
    """World-frame cylinder 7-vec -> body frame (graph.cpp:188-190 projects
    by pose^-1 before storing the factor)."""
    inv = se3.inverse(pose)
    root_l = se3.apply(inv, lm_world[3:6])
    ray_l = se3.rotate(inv, lm_world[0:3])
    return jnp.concatenate([ray_l, root_l, lm_world[6][None]])


# ---------------------------------------------------------------------------
# Cuboid factor (9-dim)
# ---------------------------------------------------------------------------


def cuboid_residual(pose, lm_pose, lm_scale, meas_pose_local, meas_scale):
    """CubeFactor error (cubeFactor.cpp:17-53, cubeFactor.h:46-87).

    proj = pose * meas_pose_local; error[0:6] = Logmap(lm_pose^-1 * proj.pose)
    (q.pose.inverse()*pose with q = landmark), error[6:9] = meas.scale -
    lm.scale."""
    proj = se3.compose(pose, meas_pose_local)
    err_se3 = se3.log(se3.compose(se3.inverse(lm_pose), proj))
    return jnp.concatenate([err_se3, meas_scale - lm_scale])


def cuboid_retract(lm_pose, lm_scale, delta):
    """Pose3 right-retract on the SE(3) part, plus on scale
    (cubeFactor.h:95-114)."""
    return se3.retract(lm_pose, delta[0:6]), lm_scale + delta[6:9]


# ---------------------------------------------------------------------------
# Bearing-range factor for point (ellipsoid centroid) landmarks
# ---------------------------------------------------------------------------


def bearing_range_residual(pose, point, meas_bearing, meas_range):
    """Bearing + range to a point landmark (graph.cpp:158-180).

    The reference uses GTSAM BearingRangeFactor3D whose bearing error is a
    2-dim Unit3 tangent; here the bearing error is the 3-dim difference of
    unit vectors in the body frame, which agrees to first order (the
    difference of unit vectors is orthogonal to the direction) and keeps the
    residual chart-free. Noise is isotropic sigma=1 either way
    (graphWrapper.cpp:63-64)."""
    p_body = se3.apply(se3.inverse(pose), point)
    rng = jnp.linalg.norm(p_body)
    direction = p_body / jnp.maximum(rng, 1e-9)
    return jnp.concatenate([direction - meas_bearing, (rng - meas_range)[None]])
