"""Spherical range-image projection.

Vectorized jax re-expression of LaserScan.do_range_projection
(frontend/scan2shape/script/laserscan.py:150-232): project a LiDAR point
cloud onto an HxW range image (fov_up/fov_down vertical model), keeping the
nearest return per pixel via a depth-ordered scatter, and keep the
(proj_x, proj_y) bookkeeping needed to unproject per-point labels.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RangeImage(NamedTuple):
    range_img: jnp.ndarray     # [H, W] (-1 where empty)
    xyz_img: jnp.ndarray       # [H, W, 3]
    remission_img: jnp.ndarray # [H, W]
    proj_x: jnp.ndarray        # [N] column of each point
    proj_y: jnp.ndarray        # [N] row of each point
    mask: jnp.ndarray          # [H, W] valid pixels


@functools.partial(jax.jit, static_argnames=("height", "width",
                                             "fov_up_deg", "fov_down_deg"))
def project(points: jnp.ndarray, remission: jnp.ndarray,
            valid: jnp.ndarray, *, height: int = 64, width: int = 1024,
            fov_up_deg: float = 15.0, fov_down_deg: float = -15.0) -> RangeImage:
    """points [N,3] (invalid rows masked), remission [N]."""
    fov_up = np.deg2rad(fov_up_deg)
    fov_down = np.deg2rad(fov_down_deg)
    fov = abs(fov_down) + abs(fov_up)

    depth = jnp.linalg.norm(points, axis=1)
    depth_safe = jnp.maximum(depth, 1e-6)
    yaw = -jnp.arctan2(points[:, 1], points[:, 0])
    pitch = jnp.arcsin(jnp.clip(points[:, 2] / depth_safe, -1.0, 1.0))

    proj_x = 0.5 * (yaw / np.pi + 1.0) * width            # laserscan.py:176
    proj_y = (1.0 - (pitch + abs(fov_down)) / fov) * height
    proj_x = jnp.clip(jnp.floor(proj_x), 0, width - 1).astype(jnp.int32)
    proj_y = jnp.clip(jnp.floor(proj_y), 0, height - 1).astype(jnp.int32)

    # nearest return wins: order by decreasing depth so closer points
    # scatter last (laserscan.py:200-214)
    order = jnp.argsort(-depth)
    flat = proj_y[order] * width + proj_x[order]
    ok = valid[order]
    flat = jnp.where(ok, flat, height * width)            # OOB -> dropped

    rimg = jnp.full((height * width,), -1.0)
    rimg = rimg.at[flat].set(depth[order], mode="drop")
    ximg = jnp.zeros((height * width, 3))
    ximg = ximg.at[flat].set(points[order], mode="drop")
    mimg = jnp.zeros((height * width,))
    mimg = mimg.at[flat].set(remission[order], mode="drop")

    rimg = rimg.reshape(height, width)
    return RangeImage(
        range_img=rimg,
        xyz_img=ximg.reshape(height, width, 3),
        remission_img=mimg.reshape(height, width),
        proj_x=proj_x, proj_y=proj_y,
        mask=rimg >= 0,
    )


def unproject_labels(ri: RangeImage, label_img: jnp.ndarray,
                     n_points: int) -> jnp.ndarray:
    """Per-point labels by indexing the label image at each point's pixel
    (the reference writes them into the intensity channel,
    infer_node.py:238-258)."""
    return label_img[ri.proj_y, ri.proj_x]


def make_model_input(ri: RangeImage, means=None, stds=None) -> jnp.ndarray:
    """[5, H, W] network input: range, x, y, z, remission, normalized and
    zeroed outside the mask (infer_node.py:221-229)."""
    feats = jnp.concatenate([
        ri.range_img[None], jnp.moveaxis(ri.xyz_img, -1, 0),
        ri.remission_img[None]], axis=0)
    if means is not None:
        feats = (feats - means[:, None, None]) / stds[:, None, None]
    return feats * ri.mask[None]
