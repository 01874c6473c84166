"""Batched semantic object containers.

The reference models landmarks as scalar C++ classes
(/root/reference/backend/sloam/src/objects/{cylinder,cube,ellipsoid}.cpp).
Here each object family is a struct-of-arrays with a validity mask so that
whole scans and whole maps are single fixed-shape tensors that XLA can fuse
over. Semantics preserved:

* Cylinder: {root in R3, ray in R3, radius, semantic_label}  (cylinder.cpp:39-45)
* Cuboid:   {pose in SE(3), scale in R3, semantic_label}     (cube.cpp:14-20)
* Ellipsoid:{pose (centroid, upright), scale, semantic_label} (ellipsoid.cpp:12-22)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .geometry import se3


class Cylinders(NamedTuple):
    root: jnp.ndarray    # [N, 3]
    ray: jnp.ndarray     # [N, 3]
    radius: jnp.ndarray  # [N]
    label: jnp.ndarray   # [N] int32
    valid: jnp.ndarray   # [N] bool

    @property
    def capacity(self) -> int:
        return self.root.shape[0]

    @staticmethod
    def empty(n: int, dtype=jnp.float32) -> "Cylinders":
        return Cylinders(
            root=jnp.zeros((n, 3), dtype),
            ray=jnp.tile(jnp.array([[0.0, 0.0, 1.0]], dtype), (n, 1)),
            radius=jnp.zeros((n,), dtype),
            label=jnp.zeros((n,), jnp.int32),
            valid=jnp.zeros((n,), bool),
        )

    def project(self, pose) -> "Cylinders":
        """World-frame version of body-frame cylinders (cylinder.cpp:236-242).

        Ray transforms as a direction (rotation only)."""
        return self._replace(
            root=se3.apply(pose, self.root),
            ray=se3.rotate(pose, self.ray),
        )

    def centroid(self) -> jnp.ndarray:
        return self.root


class Cuboids(NamedTuple):
    pose: jnp.ndarray    # [N, 7]
    scale: jnp.ndarray   # [N, 3]
    label: jnp.ndarray   # [N] int32
    valid: jnp.ndarray   # [N] bool

    @property
    def capacity(self) -> int:
        return self.pose.shape[0]

    @staticmethod
    def empty(n: int, dtype=jnp.float32) -> "Cuboids":
        return Cuboids(
            pose=se3.identity((n,), dtype),
            scale=jnp.zeros((n, 3), dtype),
            label=jnp.zeros((n,), jnp.int32),
            valid=jnp.zeros((n,), bool),
        )

    def project(self, pose) -> "Cuboids":
        """cube.cpp:31-36 — full SE(3) compose, scale unchanged."""
        return self._replace(pose=se3.compose(pose, self.pose))

    def centroid(self) -> jnp.ndarray:
        return se3.trans(self.pose)


class Ellipsoids(NamedTuple):
    pose: jnp.ndarray    # [N, 7]
    scale: jnp.ndarray   # [N, 3]
    label: jnp.ndarray   # [N] int32
    valid: jnp.ndarray   # [N] bool

    @property
    def capacity(self) -> int:
        return self.pose.shape[0]

    @staticmethod
    def empty(n: int, dtype=jnp.float32) -> "Ellipsoids":
        return Ellipsoids(
            pose=se3.identity((n,), dtype),
            scale=jnp.zeros((n, 3), dtype),
            label=jnp.zeros((n,), jnp.int32),
            valid=jnp.zeros((n,), bool),
        )

    def project(self, pose) -> "Ellipsoids":
        """ellipsoid.cpp:33-38."""
        return self._replace(pose=se3.compose(pose, self.pose))

    def centroid(self) -> jnp.ndarray:
        return se3.trans(self.pose)


def pad_cylinders(root, ray, radius, label, n: int, dtype=jnp.float32) -> Cylinders:
    """Build a padded Cylinders batch from variable-length host data.

    Pure numpy construction + one transfer: variable k must never reach the
    device as a shape (each distinct shape would be a fresh compilation on
    the TPU tunnel backend)."""
    import numpy as np

    k = min(len(radius), n)
    np_root = np.zeros((n, 3), np.float32)
    np_ray = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    np_rad = np.zeros((n,), np.float32)
    np_lab = np.zeros((n,), np.int32)
    np_val = np.zeros((n,), bool)
    if k:
        np_root[:k] = np.asarray(root[:k], np.float32)
        np_ray[:k] = np.asarray(ray[:k], np.float32)
        np_rad[:k] = np.asarray(radius[:k], np.float32)
        np_lab[:k] = np.asarray(label[:k], np.int32)
        np_val[:k] = True
    return Cylinders(root=jnp.asarray(np_root), ray=jnp.asarray(np_ray),
                     radius=jnp.asarray(np_rad), label=jnp.asarray(np_lab),
                     valid=jnp.asarray(np_val))


def pad_boxlike(cls, pose, scale, label, n: int, dtype=jnp.float32):
    """Build padded Cuboids/Ellipsoids from host data (pose as [k,7] wxyz+t)."""
    import numpy as np

    k = min(len(label), n)
    np_pose = np.zeros((n, 7), np.float32)
    np_pose[:, 0] = 1.0
    np_scale = np.zeros((n, 3), np.float32)
    np_lab = np.zeros((n,), np.int32)
    np_val = np.zeros((n,), bool)
    if k:
        np_pose[:k] = np.asarray(pose[:k], np.float32)
        np_scale[:k] = np.asarray(scale[:k], np.float32)
        np_lab[:k] = np.asarray(label[:k], np.int32)
        np_val[:k] = True
    return cls(pose=jnp.asarray(np_pose), scale=jnp.asarray(np_scale),
               label=jnp.asarray(np_lab), valid=jnp.asarray(np_val))
