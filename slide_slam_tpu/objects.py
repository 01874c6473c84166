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
    """Build a padded Cylinders batch from variable-length host data."""
    import numpy as np

    k = min(len(radius), n)
    out = Cylinders.empty(n, dtype)
    if k == 0:
        return out
    return Cylinders(
        root=out.root.at[:k].set(np.asarray(root[:k], np.float32)),
        ray=out.ray.at[:k].set(np.asarray(ray[:k], np.float32)),
        radius=out.radius.at[:k].set(np.asarray(radius[:k], np.float32)),
        label=out.label.at[:k].set(np.asarray(label[:k], np.int32)),
        valid=out.valid.at[:k].set(True),
    )


def pad_boxlike(cls, pose, scale, label, n: int, dtype=jnp.float32):
    """Build padded Cuboids/Ellipsoids from host data (pose as [k,7] wxyz+t)."""
    import numpy as np

    k = min(len(label), n)
    out = cls.empty(n, dtype)
    if k == 0:
        return out
    return cls(
        pose=out.pose.at[:k].set(np.asarray(pose[:k], np.float32)),
        scale=out.scale.at[:k].set(np.asarray(scale[:k], np.float32)),
        label=out.label.at[:k].set(np.asarray(label[:k], np.int32)),
        valid=out.valid.at[:k].set(True),
    )
