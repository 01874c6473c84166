"""Batched SE(3) math on arrays — the L0 substrate of the TPU-native engine.

Replaces the reference's Sophus/GTSAM scalar pose types
(/root/reference/backend/sloam/include/helpers/definitions.h:30-143) with pure
functions over arrays of shape [..., 7]:

    pose = [qw, qx, qy, qz, tx, ty, tz]

Tangent vectors follow the GTSAM convention ``xi = [omega(3), v(3)]``
(rotation first, translation second) so that the reference's noise vectors
(RPY-first, graphWrapper.cpp:45-48) carry over unchanged.

Everything is batched, jit-friendly, and differentiable. No data-dependent
control flow: small-angle branches use `jnp.where` with Taylor fallbacks.
"""
from __future__ import annotations

import jax.numpy as jnp

# Slice layout of a pose 7-vector.
QUAT = slice(0, 4)   # (w, x, y, z)
TRANS = slice(4, 7)

_EPS = 1e-8


def identity(shape=(), dtype=jnp.float32):
    """Identity pose(s) with the given batch shape."""
    p = jnp.zeros(tuple(shape) + (7,), dtype=dtype)
    return p.at[..., 0].set(1.0)


def from_quat_trans(quat_wxyz, trans):
    return jnp.concatenate([quat_wxyz, trans], axis=-1)


def quat(pose):
    return pose[..., QUAT]


def trans(pose):
    return pose[..., TRANS]


# ---------------------------------------------------------------------------
# Quaternion primitives (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_mul(q1, q2):
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, _EPS)
    # canonicalize sign (w >= 0) so log is continuous
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q. Shapes broadcast."""
    qv = q[..., 1:4]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_to_matrix(q):
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def quat_from_matrix(m):
    """Rotation matrix [..., 3, 3] -> quaternion (w,x,y,z). Branch-free."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best per element
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4(which), 4(comps)]
    scores = jnp.stack(
        [tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1
    )
    best = jnp.argmax(scores, axis=-1)
    picked = jnp.take_along_axis(
        cand, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    return quat_normalize(picked)


# ---------------------------------------------------------------------------
# SO(3) exp/log
# ---------------------------------------------------------------------------

def so3_exp_quat(omega):
    """Axis-angle [...,3] -> quaternion."""
    theta2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < 1e-8
    half = 0.5 * theta
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    s = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    return jnp.concatenate([w, s * omega], axis=-1)


def so3_log(q):
    """Quaternion -> axis-angle [...,3]."""
    q = quat_normalize(q)
    w = q[..., :1]
    v = q[..., 1:4]
    vn2 = jnp.sum(v * v, axis=-1, keepdims=True)
    vn = jnp.sqrt(jnp.maximum(vn2, _EPS * _EPS))
    small = vn2 < 1e-10
    # angle = 2 atan2(|v|, w); factor = angle / |v|
    angle = 2.0 * jnp.arctan2(vn, w)
    factor = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), angle / vn)
    return factor * v


def _so3_left_jacobian(omega):
    """V(omega): translation part of SE(3) exp. [...,3] -> [...,3,3]."""
    theta2 = jnp.sum(omega * omega, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = skew(omega)
    W2 = W @ W
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / theta2)
    b = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye + a * W + b * W2


def _so3_left_jacobian_inv(omega):
    theta2 = jnp.sum(omega * omega, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = skew(omega)
    W2 = W @ W
    small = theta2 < 1e-8
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.sin(half_theta)) / theta2,
    )
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye - 0.5 * W + cot_term * W2


def skew(v):
    zeros = jnp.zeros_like(v[..., 0])
    r = jnp.stack(
        [zeros, -v[..., 2], v[..., 1],
         v[..., 2], zeros, -v[..., 0],
         -v[..., 1], v[..., 0], zeros],
        axis=-1,
    )
    return r.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def compose(a, b):
    """a ∘ b."""
    qa, ta = quat(a), trans(a)
    qb, tb = quat(b), trans(b)
    return from_quat_trans(quat_normalize(quat_mul(qa, qb)), quat_rotate(qa, tb) + ta)


def inverse(p):
    qi = quat_conj(quat(p))
    return from_quat_trans(qi, -quat_rotate(qi, trans(p)))


def apply(p, pts):
    """Transform point(s) [...,3] by pose(s) [...,7]; shapes broadcast."""
    return quat_rotate(quat(p), pts) + trans(p)


def rotate(p, vecs):
    return quat_rotate(quat(p), vecs)


def exp(xi):
    """xi = [omega, v] [...,6] -> pose [...,7]  (SE(3) exponential)."""
    omega, v = xi[..., :3], xi[..., 3:6]
    q = so3_exp_quat(omega)
    V = _so3_left_jacobian(omega)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return from_quat_trans(q, t)


def log(p):
    """pose [...,7] -> xi = [omega, v] [...,6]."""
    omega = so3_log(quat(p))
    Vinv = _so3_left_jacobian_inv(omega)
    v = jnp.einsum("...ij,...j->...i", Vinv, trans(p))
    return jnp.concatenate([omega, v], axis=-1)


def retract(p, xi):
    """Right retraction p ∘ Exp(xi) — GTSAM Pose3 convention."""
    return compose(p, exp(xi))


def local(p, q):
    """Log(p⁻¹ ∘ q): tangent taking p to q."""
    return log(compose(inverse(p), q))


def between(a, b):
    """a⁻¹ ∘ b (GTSAM `between`)."""
    return compose(inverse(a), b)


def matrix(p):
    """pose [...,7] -> homogeneous [...,4,4]."""
    R = quat_to_matrix(quat(p))
    t = trans(p)[..., :, None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(m):
    return from_quat_trans(quat_from_matrix(m[..., :3, :3]), m[..., :3, 3])


def from_xyz_yaw(x, y, z, yaw):
    """SE(3) with yaw-only rotation (used by place recognition SE(2)xYaw)."""
    x, y, z, yaw = (jnp.asarray(v, dtype=jnp.float32) for v in (x, y, z, yaw))
    half = 0.5 * yaw
    q = jnp.stack([jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half)], axis=-1)
    t = jnp.stack([x, y, z], axis=-1)
    return from_quat_trans(q, t)


def yaw_of(p):
    """Yaw angle of the rotation (atan2 of rotation-matrix entries)."""
    R = quat_to_matrix(quat(p))
    return jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
