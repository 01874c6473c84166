"""Raw-LiDAR frontend: scan -> segmentation -> object measurements.

The glue that the reference splits across infer_node.py (RangeNet++
inference on the range image) and process_cloud_node_outdoor.py (per-class
processing): one call takes a raw deskewed point cloud + synced odometry
pose and produces the body-frame object-measurement dict the backend
consumes. BASELINE config 3 ("single-robot raw LiDAR: LIO odometry +
scan2shape instance segmentation frontend").

The segmentation model is pluggable: the flax RangeSegmentator (with
converted weights), or any callable `(range_input [1,H,W,5]) -> labels
[1,H,W]` — including ground-truth labelers in tests/sim (the reference
similarly supports `use_sim` label shortcuts,
process_cloud_node_outdoor.py:204-214).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from .pipeline import PipelineConfig, ProcessCloudPipeline
from . import range_projection


@dataclass
class LidarFrontendConfig:
    height: int = 64
    width: int = 1024
    fov_up_deg: float = 15.0
    fov_down_deg: float = -15.0
    desired_period: float = 0.5          # 2 Hz throttle (infer_node_params.yaml:20)


class LidarFrontend:
    def __init__(self, segment_fn: Callable, cfg: Optional[LidarFrontendConfig] = None,
                 pipeline_cfg: Optional[PipelineConfig] = None):
        """segment_fn(model_input [1, H, W, 5]) -> labels [1, H, W] int."""
        self.cfg = cfg or LidarFrontendConfig()
        self.segment_fn = segment_fn
        self.pipeline = ProcessCloudPipeline(pipeline_cfg)
        self._last_stamp = -np.inf

    def process_scan(self, stamp: float, points_body: np.ndarray,
                     remission: np.ndarray, sensor_pose7: np.ndarray):
        """Returns the measurement dict or None when throttled.

        points_body: [N, 3] deskewed body-frame cloud; sensor_pose7: the
        synced odometry pose (body -> world)."""
        if stamp - self._last_stamp < self.cfg.desired_period:
            return None                                   # 2 Hz throttle
        self._last_stamp = stamp
        c = self.cfg
        n = len(points_body)
        pts = jnp.asarray(np.asarray(points_body, np.float32))
        rem = jnp.asarray(np.asarray(remission, np.float32))
        valid = jnp.ones((n,), bool)
        ri = range_projection.project(
            pts, rem, valid, height=c.height, width=c.width,
            fov_up_deg=c.fov_up_deg, fov_down_deg=c.fov_down_deg)
        model_in = range_projection.make_model_input(ri)[None]   # [1,5,H,W]
        model_in = jnp.moveaxis(model_in, 1, -1)                 # [1,H,W,5]
        labels_img = self.segment_fn(model_in)[0]                # [H,W]
        point_labels = np.asarray(
            range_projection.unproject_labels(ri, labels_img, n))
        # transform to world (utils_outdoor.py:162-258)
        from ..geometry import se3np
        world_pts = se3np.apply(np.asarray(sensor_pose7, np.float32),
                                np.asarray(points_body, np.float32))
        return self.pipeline.process_scan(world_pts, point_labels,
                                          sensor_pose7)


def ground_truth_segmenter(world, sensor_pose7_getter):
    """Test/sim labeler: labels each projected pixel by the nearest world
    object class (the reference's use_sim shortcut)."""
    from ..geometry import se3np

    def fn(model_input):
        # model_input [1, H, W, 5]: channels (range, x, y, z, remission);
        # x,y,z are BODY-frame points
        x = np.asarray(model_input)[0]
        H, W, _ = x.shape
        pose = sensor_pose7_getter()
        pts = x[..., 1:4].reshape(-1, 3)
        wpts = se3np.apply(pose, pts.astype(np.float32))
        labels = np.zeros((H * W,), np.int32)
        mask = x[..., 0].reshape(-1) > 0
        if mask.any():
            labels[mask] = _nearest_object_label(world, wpts[mask])
        return jnp.asarray(labels.reshape(1, H, W))

    return fn


def _nearest_object_label(world, pts, ground_z=0.25, max_dist=1.5):
    labels = np.full(len(pts), 1, np.int32)       # default: ground
    centers = []
    labs = []
    if len(world.cyl_root):
        centers.append(world.cyl_root[:, :2])
        labs.append(world.cyl_label)
    if len(world.cub_pose):
        centers.append(world.cub_pose[:, 4:6])
        labs.append(world.cub_label)
    if centers:
        centers = np.concatenate(centers)
        labs = np.concatenate(labs)
        d = np.linalg.norm(pts[:, None, :2] - centers[None], axis=-1)
        nearest = np.argmin(d, axis=1)
        near_enough = d[np.arange(len(pts)), nearest] < max_dist
        above_ground = pts[:, 2] > ground_z
        sel = near_enough & above_ground
        labels[sel] = labs[nearest[sel]]
    return labels
