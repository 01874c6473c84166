"""Semantic frontend pipeline: labeled point cloud -> object measurements.

The staged equivalent of process_cloud_node_outdoor.py +
cylinder_plane_modeller.py: per segmented scan (world frame),

1. range gating (threshold_by_range, utils_outdoor.py:416),
2. ground-plane extraction from ground-labeled points,
3. per cuboid class: two-stage DBSCAN -> bbox seeds -> Hungarian track
   update; aged tracks' accumulated clouds -> batched PCA cuboid fit,
4. per cylinder class: DBSCAN instances -> batched cylinder fit against
   local ground patches,
5. conversion to body-frame measurements (the SemanticMeasSyncOdom payload
   the backend consumes).

Instead of ROS topics between four processes, the stages are function calls
around jitted kernels with fixed shapes.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from . import clustering, cuboid_fit, cylinder_fit
from .tracker import MultiClassTracker


@dataclass(frozen=True)
class ClassSpec:
    """Per-class geometry/clustering gates
    (process_cloud_node_outdoor_class_info.yaml:15-34)."""
    name: str
    label: int
    model: str                   # "cuboid" | "cylinder" | "ground"
    eps_noise: float = 0.5
    min_samples_noise: int = 5
    eps_cluster: float = 1.0
    min_samples_cluster: int = 10
    dim_lo: tuple = (0.5, 0.5, 0.5)
    dim_hi: tuple = (8.0, 4.0, 3.0)
    assignment_threshold: float = 2.0
    track_age_threshold: int = 2
    fit_cuboid_dim_thresh: float = 0.3


def outdoor_classes() -> List[ClassSpec]:
    """The outdoor demo classes: ground=1, car=5 cuboid, tree=8 cylinder,
    lightpole=9 cylinder."""
    return [
        ClassSpec("ground", 1, "ground"),
        ClassSpec("car", 5, "cuboid", dim_lo=(2.0, 1.0, 0.8),
                  dim_hi=(7.0, 3.0, 2.5)),
        ClassSpec("tree", 8, "cylinder", eps_cluster=0.8,
                  min_samples_cluster=8),
        ClassSpec("lightpole", 9, "cylinder", eps_cluster=0.6,
                  min_samples_cluster=5),
    ]


def kitti_classes() -> List[ClassSpec]:
    """KITTI semantic-segmentation ids
    (process_cloud_node_outdoor_kitti_class_info.yaml): ground=40,
    car=10 cuboid (assignment threshold 1.0, per-class DBSCAN [0.5, 10],
    dim cutoffs 0.5-7.5 / 0.5-7.5 / 0.2-4.0), tree=71 and lightpole=80
    cylinders."""
    return [
        ClassSpec("ground", 40, "ground"),
        ClassSpec("car", 10, "cuboid", eps_cluster=0.5,
                  min_samples_cluster=10, assignment_threshold=1.0,
                  dim_lo=(0.5, 0.5, 0.2), dim_hi=(7.5, 7.5, 4.0)),
        ClassSpec("tree", 71, "cylinder", assignment_threshold=1.0),
        ClassSpec("lightpole", 80, "cylinder", assignment_threshold=1.0),
    ]


def kitti_pipeline_config() -> "PipelineConfig":
    """KITTI benchmark preset
    (process_cloud_node_outdoor_kitti_params.yaml + the 64x1024 HDL-64
    cloud layout): 100 m valid range, conservative first-layer DBSCAN
    (epsilon 0.1 / 7 samples), second layer (0.5 / 25), no car facing-dir
    estimate, cuboid orientation consensus on."""
    import dataclasses
    classes = [dataclasses.replace(c, eps_noise=0.1, min_samples_noise=7)
               for c in kitti_classes()]
    return PipelineConfig(classes=classes, max_range=100.0,
                          estimate_facing_dir_car=False,
                          cluster_and_fix_cuboid_orientation=True)


@dataclass
class PipelineConfig:
    classes: List[ClassSpec] = field(default_factory=outdoor_classes)
    max_range: float = 30.0
    max_points_per_class: int = 1024     # static clustering capacity
    max_instances: int = 32
    max_points_per_instance: int = 512
    ground_patch_size: float = 4.0
    breast_height: float = 1.37
    default_radius: float = 0.2
    radius_cutoff: tuple = (0.05, 1.0)
    downsample_res: float = 0.15
    # cuboid finalization flags (process_cloud_node_outdoor.py:119-122)
    estimate_facing_dir_car: bool = False
    cluster_and_fix_cuboid_orientation: bool = True


class ProcessCloudPipeline:
    def __init__(self, cfg: Optional[PipelineConfig] = None):
        self.cfg = cfg or PipelineConfig()
        self.tracker = MultiClassTracker(
            {c.label: c.assignment_threshold for c in self.cfg.classes},
            downsample_res=self.cfg.downsample_res)
        self.scan_idx = 0

    # ------------------------------------------------------------------
    def _pad_points(self, pts: np.ndarray, n: int):
        out = np.zeros((n, 3), np.float32)
        k = min(len(pts), n)
        if k:
            out[:k] = pts[:k]
        mask = np.zeros((n,), bool)
        mask[:k] = True
        return out, mask

    def _instances_from_labels(self, pts: np.ndarray, labels: np.ndarray):
        """Group clustered points into per-instance padded arrays."""
        inst, ptss = [], []
        for lab in np.unique(labels):
            if lab < 0:
                continue
            inst.append(lab)
            ptss.append(pts[labels == lab])
        return ptss

    # ------------------------------------------------------------------
    def process_scan(self, xyz: np.ndarray, point_labels: np.ndarray,
                     sensor_pose7: np.ndarray) -> dict:
        """xyz [N, 3] world-frame labeled scan points, point_labels [N]
        semantic ids, sensor_pose7 the synced odometry pose.

        Returns the body-frame measurement dict for the backend keyframe."""
        cfg = self.cfg
        xyz = np.asarray(xyz, np.float32)
        point_labels = np.asarray(point_labels)
        sensor_xyz = np.asarray(sensor_pose7, np.float32)[4:7]
        rng_ok = np.linalg.norm(xyz - sensor_xyz, axis=1) < cfg.max_range
        obs = {k: [] for k in ("cyl_root", "cyl_ray", "cyl_radius", "cyl_label",
                               "cub_pose", "cub_scale", "cub_label")}

        ground_spec = next((c for c in cfg.classes if c.model == "ground"), None)
        ground_pts = (xyz[rng_ok & (point_labels == ground_spec.label)]
                      if ground_spec is not None else np.zeros((0, 3), np.float32))

        for spec in cfg.classes:
            if spec.model == "ground":
                continue
            pts = xyz[rng_ok & (point_labels == spec.label)]
            if len(pts) < spec.min_samples_cluster:
                continue
            pad, mask = self._pad_points(pts, cfg.max_points_per_class)
            labels = np.asarray(clustering.two_stage_cluster(
                jnp.asarray(pad), jnp.asarray(mask),
                spec.eps_noise, spec.min_samples_noise,
                spec.eps_cluster, spec.min_samples_cluster))
            instances = self._instances_from_labels(
                pad[:len(pts)], labels[:len(pts)])
            if not instances:
                continue

            if spec.model == "cuboid":
                seeds = []
                for ipts in instances:
                    p, m = self._pad_points(ipts, cfg.max_points_per_instance)
                    xc, yc, l, w, ok = cuboid_fit.fit_bbox_seeds(
                        jnp.asarray(p)[None], jnp.asarray(m)[None],
                        spec.fit_cuboid_dim_thresh)
                    if bool(ok[0]):
                        seeds.append((float(xc[0]), float(yc[0]),
                                      float(l[0]), float(w[0]), ipts))
                if seeds:
                    dets = np.asarray([s[:4] for s in seeds])
                    raw = [s[4] for s in seeds]
                    self.tracker.update(spec.label, dets, raw, self.scan_idx)
            elif spec.model == "cylinder":
                self._fit_cylinders(spec, instances, ground_pts, obs)

        # aged cuboid tracks -> PCA cuboid fits (world) -> measurements
        self._emit_cuboids(obs)
        self.scan_idx += 1
        return self._to_body_frame(obs, sensor_pose7)

    # ------------------------------------------------------------------
    def _fit_cylinders(self, spec: ClassSpec, instances, ground_pts, obs):
        cfg = self.cfg
        I = len(instances)
        pads, masks, cens = [], [], []
        for ipts in instances:
            p, m = self._pad_points(ipts, cfg.max_points_per_instance)
            pads.append(p)
            masks.append(m)
            cens.append(np.median(ipts, axis=0))
        pads = jnp.asarray(np.stack(pads))
        masks = jnp.asarray(np.stack(masks))
        cens = jnp.asarray(np.stack(cens).astype(np.float32))
        gp, gm = self._pad_points(ground_pts, cfg.max_points_per_class)
        patch_masks = cylinder_fit.select_ground_patches(
            jnp.asarray(gp), jnp.asarray(gm), cens, cfg.ground_patch_size)
        have_patch = np.asarray(jnp.sum(patch_masks, axis=1)) >= 5
        normals, ds, _ = cylinder_fit.fit_plane_ransac(
            jnp.broadcast_to(jnp.asarray(gp), (I,) + gp.shape), patch_masks,
            thresh=0.1)
        # fallback: flat ground through the instance's lowest point
        z0 = np.asarray(jnp.min(jnp.where(masks, pads[..., 2], 1e9), axis=1))
        normals = np.array(normals)
        ds = np.array(ds)
        normals[~have_patch] = [0.0, 0.0, 1.0]
        ds[~have_patch] = -z0[~have_patch]
        fit = cylinder_fit.fit_cylinders(
            pads, masks, jnp.asarray(normals), jnp.asarray(ds),
            breast_height=self.cfg.breast_height,
            radius_cutoff=self.cfg.radius_cutoff,
            default_radius=self.cfg.default_radius)
        for i in range(I):
            if bool(fit.valid[i]):
                obs["cyl_root"].append(np.asarray(fit.root[i]))
                obs["cyl_ray"].append(np.asarray(fit.ray[i]))
                obs["cyl_radius"].append(float(fit.radius[i]))
                obs["cyl_label"].append(spec.label)

    def _emit_cuboids(self, obs):
        cfg = self.cfg
        age_thr = {c.label: c.track_age_threshold for c in cfg.classes}
        tracks = self.tracker.aged_tracks(age_thr)
        if not tracks:
            return
        specs = {c.label: c for c in cfg.classes}
        pads, masks, lo, hi, labs = [], [], [], [], []
        for t in tracks:
            p, m = self._pad_points(t.all_raw_points,
                                    cfg.max_points_per_instance)
            pads.append(p)
            masks.append(m)
            sp = specs[t.class_label]
            lo.append(sp.dim_lo)
            hi.append(sp.dim_hi)
            labs.append(t.class_label)
        fits = cuboid_fit.fit_cuboids(
            jnp.asarray(np.stack(pads)), jnp.asarray(np.stack(masks)),
            jnp.asarray(np.asarray(lo, np.float32)),
            jnp.asarray(np.asarray(hi, np.float32)),
            estimate_facing_dir=cfg.estimate_facing_dir_car)
        yaws = np.asarray(fits.yaw, np.float64)
        if cfg.cluster_and_fix_cuboid_orientation:
            # snap the VALID cuboids' yaws to the scene's dominant
            # orthogonal directions (publish_cuboid_markers:318-322)
            vmask = np.asarray(fits.valid)
            if vmask.sum() > 2:
                yaws[vmask] = cuboid_fit.cluster_cuboid_orientation(
                    yaws[vmask])
        for i, t in enumerate(tracks):
            if bool(fits.valid[i]):
                pose = np.asarray(se3.from_xyz_yaw(
                    float(fits.centroid[i, 0]), float(fits.centroid[i, 1]),
                    float(fits.centroid[i, 2]), float(yaws[i])), np.float32)
                obs["cub_pose"].append(pose)
                obs["cub_scale"].append(np.asarray(fits.dims[i]))
                obs["cub_label"].append(t.class_label)

    # ------------------------------------------------------------------
    def _to_body_frame(self, obs, sensor_pose7):
        """World measurements -> body frame (the backend expects body-frame
        scans synced with odometry)."""
        inv = se3.inverse(jnp.asarray(np.asarray(sensor_pose7, np.float32)))
        out = {}
        if obs["cyl_root"]:
            roots = jnp.asarray(np.stack(obs["cyl_root"]))
            rays = jnp.asarray(np.stack(obs["cyl_ray"]))
            out["cyl_root"] = np.asarray(se3.apply(inv, roots))
            out["cyl_ray"] = np.asarray(se3.rotate(inv, rays))
            out["cyl_radius"] = np.asarray(obs["cyl_radius"], np.float32)
            out["cyl_label"] = np.asarray(obs["cyl_label"], np.int32)
        if obs["cub_pose"]:
            poses = jnp.asarray(np.stack(obs["cub_pose"]))
            out["cub_pose"] = np.asarray(se3.compose(inv, poses))
            out["cub_scale"] = np.stack(obs["cub_scale"]).astype(np.float32)
            out["cub_label"] = np.asarray(obs["cub_label"], np.int32)
        return out
