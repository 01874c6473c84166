"""RGBD detection backprojection.

The reference's detect.py (frontend/object_modeller/script/detect.py:103-260)
runs YOLOv8 instance masks, then backprojects the aligned depth through the
camera intrinsics into a labeled point cloud. The detector itself is an
external model (ultralytics); this module provides the TPU-side geometry: the
vectorized backprojection and per-instance cloud extraction that turn
(masks, depth, K) into the labeled clouds the object modeller consumes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class LabeledCloud(NamedTuple):
    xyz: jnp.ndarray        # [H*W, 3] camera-frame points
    label: jnp.ndarray      # [H*W] int32 (-1 background)
    instance: jnp.ndarray   # [H*W] int32 (-1 background)
    confidence: jnp.ndarray # [H*W]
    valid: jnp.ndarray      # [H*W] depth valid & inside a mask


@functools.partial(jax.jit, static_argnames=())
def backproject(depth: jnp.ndarray, masks: jnp.ndarray,
                mask_labels: jnp.ndarray, mask_conf: jnp.ndarray,
                fx: float, fy: float, cx: float, cy: float,
                depth_scale: float = 1.0, max_depth: float = 10.0,
                conf_thresh: float = 0.5) -> LabeledCloud:
    """depth [H, W] (raw units * depth_scale = meters), masks [K, H, W] bool
    instance masks, mask_labels [K] int32, mask_conf [K].

    Camera convention: +z forward, x right, y down (standard pinhole)."""
    H, W = depth.shape
    z = depth * depth_scale
    u = jnp.arange(W, dtype=z.dtype)[None, :].repeat(H, 0)
    v = jnp.arange(H, dtype=z.dtype)[:, None].repeat(W, 1)
    x = (u - cx) / fx * z
    y = (v - cy) / fy * z
    xyz = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)

    conf_ok = mask_conf >= conf_thresh
    m = masks & conf_ok[:, None, None]
    # first (highest-priority) mask wins per pixel
    any_mask = jnp.any(m, axis=0)
    inst = jnp.where(any_mask, jnp.argmax(m, axis=0), -1)
    flat_inst = inst.reshape(-1)
    safe = jnp.clip(flat_inst, 0, masks.shape[0] - 1)
    label = jnp.where(flat_inst >= 0, mask_labels[safe], -1).astype(jnp.int32)
    conf = jnp.where(flat_inst >= 0, mask_conf[safe], 0.0)
    depth_ok = (z.reshape(-1) > 1e-3) & (z.reshape(-1) < max_depth)
    valid = depth_ok & (flat_inst >= 0)
    return LabeledCloud(xyz=xyz, label=label,
                        instance=flat_inst.astype(jnp.int32),
                        confidence=conf, valid=valid)


def to_world(cloud: LabeledCloud, cam_pose7: jnp.ndarray) -> LabeledCloud:
    """Transform camera-frame points by the (synced-odometry) camera pose."""
    from ..geometry import se3

    return cloud._replace(xyz=se3.apply(cam_pose7, cloud.xyz))


def instance_points(cloud: LabeledCloud, instance_id: int, max_points: int):
    """Padded [max_points, 3] + mask for one instance (host-friendly).
    Over-capacity instances are stride-subsampled (not truncated) so the
    kept points still span the instance — the reference's analogue is the
    voxel downsample capped at num_instance_point_lim
    (object_tracker.py:8-78)."""
    import numpy as np

    sel = np.asarray(cloud.valid) & (np.asarray(cloud.instance) == instance_id)
    pts = np.asarray(cloud.xyz)[sel]
    if len(pts) > max_points:
        idx = np.round(np.linspace(0, len(pts) - 1, max_points)).astype(int)
        pts = pts[idx]
    out = np.zeros((max_points, 3), np.float32)
    out[:len(pts)] = pts
    mask = np.zeros((max_points,), bool)
    mask[:len(pts)] = True
    return out, mask
