"""Indoor-LiDAR semantic pipeline (LLOL-odometry variant).

Re-derivation of process_cloud_node_lidar_indoor.py:1-678 — the third
frontend variant next to outdoor LiDAR (pipeline.py) and indoor RGBD
(rgbd.py): a segmented indoor LiDAR scan of chairs/tables/floor becomes
**centroid (range-bearing) landmark measurements** for the backend, the
indoor landmark convention (sync_centroid_odom.py:58-99 routes indoor
markers into ellipsoid_factors).

Stages, mirroring segmented_synced_pc_cb (:320-658):

1. range gate (`threshold_by_range`, utils_outdoor.py:416),
2. raw->unified label remap ({chair:3, table:4, floor:2} raw ->
   {chair:1, table:2}, :62 — "required if we want the lidar and camera
   labels to be the same for map merging"),
3. ground-plane RANSAC on the floor class (:405-415, batched hypothesis
   RANSAC instead of open3d segment_plane),
4. distance-to-ground gate (`calc_dist_to_ground` > ground_median_increment,
   :471-476),
5. per class two-layer DBSCAN (noise cull then instance cluster,
   :490-527) via the shared two_stage_cluster kernel,
6. bbox seeds (fit_cuboid, length-threshold gate) -> Hungarian track
   update with lost-track expiry (:599-612),
7. aged tracks -> hull-PCA cuboid with exact min/max extents
   (cuboid_detection_indoor, cuboid_utils_indoor.py:76-160) -> each valid
   object emitted as a body-frame centroid measurement with the cuboid
   dims as scale (publish_cuboid_and_range_bearing_measurements path).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from . import clustering, cuboid_fit, cylinder_fit
from .tracker import MultiClassTracker


@dataclass
class IndoorClassSpec:
    name: str
    raw_label: int              # segmentation output id (:58)
    label: int                  # unified backend label (:62)
    eps_first: float = 1.25     # epsilon_scan_1st_layer
    min_samples_first: int = 40
    eps_scan: float = 0.35
    min_samples_scan: int = 15
    fit_length_thresh: float = 0.3
    track_age_threshold: int = 3
    assignment_threshold: float = 1.5
    dim_lo: tuple = (0.2, 0.2, 0.2)
    dim_hi: tuple = (4.0, 4.0, 2.5)


def indoor_lidar_classes() -> List[IndoorClassSpec]:
    return [
        IndoorClassSpec("chair", raw_label=3, label=1),
        IndoorClassSpec("table", raw_label=4, label=2,
                        dim_hi=(5.0, 5.0, 1.8)),
    ]


@dataclass
class IndoorLidarConfig:
    classes: List[IndoorClassSpec] = field(
        default_factory=indoor_lidar_classes)
    floor_raw_label: int = 2
    valid_range_threshold: float = 15.0
    ground_median_increment: float = 0.15    # min height above ground
    max_points_per_class: int = 1024
    max_points_per_instance: int = 512
    num_lost_track_times_thresh: int = 10    # (:600-607)
    downsample_res: float = 0.1


class IndoorLidarPipeline:
    def __init__(self, cfg: Optional[IndoorLidarConfig] = None):
        self.cfg = cfg or IndoorLidarConfig()
        self.tracker = MultiClassTracker(
            {c.label: c.assignment_threshold for c in self.cfg.classes},
            downsample_res=self.cfg.downsample_res)
        self.scan_idx = 0
        self.ground_plane = np.array([0.0, 0.0, 1.0, 0.0])  # ax+by+cz+d=0

    # ------------------------------------------------------------------
    def _pad(self, pts: np.ndarray, n: int):
        out = np.zeros((n, 3), np.float32)
        k = min(len(pts), n)
        if k:
            out[:k] = pts[:k]
        mask = np.zeros((n,), bool)
        mask[:k] = True
        return out, mask

    def _update_ground(self, floor_pts: np.ndarray):
        """Ground RANSAC (:405-415); keeps the previous plane when too few
        floor points are visible (the reference's cached-model fallback)."""
        if len(floor_pts) < 50:
            return
        gp, gm = self._pad(floor_pts, self.cfg.max_points_per_class)
        n, d, _ = cylinder_fit.fit_plane_ransac(
            jnp.asarray(gp)[None], jnp.asarray(gm)[None], thresh=0.1)
        n = np.asarray(n)[0]
        if abs(n[2]) > 0.5:                 # sanity: roughly horizontal
            self.ground_plane = np.array([n[0], n[1], n[2], float(d[0])])

    def _dist_to_ground(self, pts: np.ndarray) -> np.ndarray:
        a, b, c, d = self.ground_plane
        return ((pts[:, 0] * a + pts[:, 1] * b + pts[:, 2] * c + d)
                / max(np.linalg.norm([a, b, c]), 1e-9))

    # ------------------------------------------------------------------
    def process_scan(self, xyz: np.ndarray, raw_labels: np.ndarray,
                     sensor_pose7: np.ndarray) -> Dict[str, np.ndarray]:
        """xyz [N,3] world-frame points, raw_labels [N] segmentation ids.
        Returns the body-frame measurement dict (ell_* rows) for the
        backend keyframe."""
        cfg = self.cfg
        xyz = np.asarray(xyz, np.float32)
        raw_labels = np.asarray(raw_labels)
        sensor_xyz = np.asarray(sensor_pose7, np.float32)[4:7]
        rng_ok = (np.linalg.norm(xyz - sensor_xyz, axis=1)
                  < cfg.valid_range_threshold)

        self._update_ground(xyz[rng_ok & (raw_labels == cfg.floor_raw_label)])

        for spec in cfg.classes:
            pts = xyz[rng_ok & (raw_labels == spec.raw_label)]
            if len(pts) == 0:
                continue
            pts = pts[self._dist_to_ground(pts) > cfg.ground_median_increment]
            if len(pts) < spec.min_samples_scan:
                continue
            pad, mask = self._pad(pts, cfg.max_points_per_class)
            labels = np.asarray(clustering.two_stage_cluster(
                jnp.asarray(pad), jnp.asarray(mask),
                spec.eps_first, spec.min_samples_first,
                spec.eps_scan, spec.min_samples_scan))[:len(pts)]
            seeds, raw = [], []
            for lab in np.unique(labels):
                if lab < 0:
                    continue
                ipts = pts[labels == lab]
                lo = ipts.min(axis=0)
                hi = ipts.max(axis=0)
                # fit_cuboid_indoor gate: length (max XY extent) threshold
                if max(hi[0] - lo[0], hi[1] - lo[1]) < spec.fit_length_thresh:
                    continue
                seeds.append([float(np.median(ipts[:, 0])),
                              float(np.median(ipts[:, 1])),
                              float(hi[0] - lo[0]), float(hi[1] - lo[1])])
                raw.append(ipts)
            if seeds:
                self.tracker.update(spec.label, np.asarray(seeds), raw,
                                    self.scan_idx)

        self.tracker.expire(self.scan_idx, cfg.num_lost_track_times_thresh)
        obs = self._emit_centroids()
        self.scan_idx += 1
        return self._to_body_frame(obs, sensor_pose7)

    # ------------------------------------------------------------------
    def _emit_centroids(self) -> dict:
        cfg = self.cfg
        age_thr = {c.label: c.track_age_threshold for c in cfg.classes}
        tracks = self.tracker.aged_tracks(age_thr)
        obs = {"ell_pose": [], "ell_scale": [], "ell_label": []}
        if not tracks:
            return obs
        specs = {c.label: c for c in cfg.classes}
        pads, masks, lo, hi = [], [], [], []
        for t in tracks:
            p, m = self._pad(t.all_raw_points, cfg.max_points_per_instance)
            pads.append(p)
            masks.append(m)
            lo.append(specs[t.class_label].dim_lo)
            hi.append(specs[t.class_label].dim_hi)
        fits = cuboid_fit.fit_cuboids(
            jnp.asarray(np.stack(pads)), jnp.asarray(np.stack(masks)),
            jnp.asarray(np.asarray(lo, np.float32)),
            jnp.asarray(np.asarray(hi, np.float32)),
            minmax_extents=True)            # indoor: exact min/max extents
        for i, t in enumerate(tracks):
            if not bool(fits.valid[i]):
                continue
            pose = np.concatenate([[1, 0, 0, 0],
                                   np.asarray(fits.centroid[i])])
            obs["ell_pose"].append(pose.astype(np.float32))
            obs["ell_scale"].append(np.asarray(fits.dims[i], np.float32))
            obs["ell_label"].append(t.class_label)
        return obs

    def _to_body_frame(self, obs: dict, sensor_pose7) -> dict:
        if not obs["ell_pose"]:
            return {}
        inv = se3.inverse(jnp.asarray(np.asarray(sensor_pose7, np.float32)))
        poses = jnp.asarray(np.stack(obs["ell_pose"]))
        return {
            "ell_pose": np.asarray(se3.compose(inv, poses)),
            "ell_scale": np.stack(obs["ell_scale"]).astype(np.float32),
            "ell_label": np.asarray(obs["ell_label"], np.int32),
        }
