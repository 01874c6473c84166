"""Frontend tests: projection, clustering, fitting, tracking, pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slide_slam_tpu.frontend import (clustering, cuboid_fit, cylinder_fit,
                                     range_projection, rgbd)
from slide_slam_tpu.frontend.pipeline import (ClassSpec, PipelineConfig,
                                              ProcessCloudPipeline)
from slide_slam_tpu.frontend.tracker import (MultiClassTracker,
                                             hungarian_assignment,
                                             voxel_downsample)
from slide_slam_tpu.geometry import se3


# ---------------------------------------------------------------------------
class TestRangeProjection:
    def test_pixels_and_nearest_wins(self):
        # two points along +x at different ranges: same pixel, nearest kept
        pts = jnp.asarray(np.array([[5.0, 0, 0], [10.0, 0, 0],
                                    [0.0, 5.0, 0]], np.float32))
        rem = jnp.asarray(np.array([0.1, 0.2, 0.3], np.float32))
        valid = jnp.ones(3, bool)
        ri = range_projection.project(pts, rem, valid, height=16, width=64)
        # +x -> yaw 0 -> column W/2
        assert int(ri.proj_x[0]) == 32
        r = float(ri.range_img[int(ri.proj_y[0]), int(ri.proj_x[0])])
        assert abs(r - 5.0) < 1e-5   # nearest of 5 and 10
        # +y -> yaw -pi/2 -> column W/4
        assert int(ri.proj_x[2]) == 16

    def test_mask_and_model_input(self):
        pts = jnp.asarray(np.random.default_rng(0).normal(
            0, 5, (100, 3)).astype(np.float32))
        rem = jnp.zeros(100)
        ri = range_projection.project(pts, rem, jnp.ones(100, bool),
                                      height=16, width=64)
        x = range_projection.make_model_input(ri)
        assert x.shape == (5, 16, 64)
        assert bool(jnp.all(x[0][~ri.mask] == 0))


# ---------------------------------------------------------------------------
class TestClustering:
    def test_matches_sklearn_dbscan(self):
        from sklearn.cluster import DBSCAN

        rng = np.random.default_rng(0)
        blobs = np.concatenate([
            rng.normal([0, 0, 0], 0.2, (40, 3)),
            rng.normal([5, 5, 0], 0.2, (40, 3)),
            rng.normal([10, 0, 0], 0.2, (30, 3)),
            rng.uniform(-20, 20, (10, 3)),     # sparse noise
        ]).astype(np.float32)
        n = len(blobs)
        pad = np.zeros((160, 3), np.float32)
        pad[:n] = blobs
        mask = np.zeros(160, bool)
        mask[:n] = True
        ours = np.asarray(clustering.dbscan(jnp.asarray(pad), jnp.asarray(mask),
                                            eps=0.8, min_samples=5))[:n]
        ref = DBSCAN(eps=0.8, min_samples=5).fit_predict(blobs)
        # same partition (up to label renaming) and same noise set
        assert np.array_equal(ours == -1, ref == -1)
        for lab in np.unique(ref[ref >= 0]):
            sel = ref == lab
            assert len(np.unique(ours[sel])) == 1
            # and that cluster isn't merged with another
            other = (ref >= 0) & ~sel
            assert not np.any(np.isin(ours[other], np.unique(ours[sel])))


# ---------------------------------------------------------------------------
def synth_box_points(rng, center, dims, yaw, n=400):
    local = rng.uniform(-0.5, 0.5, (n, 3)) * np.asarray(dims)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    return (R @ local.T).T + np.asarray(center)


class TestCuboidFit:
    def test_recovers_box(self):
        rng = np.random.default_rng(1)
        dims = [4.4, 1.8, 1.5]
        yaw = 0.6
        center = [10.0, -3.0, 0.75]
        pts = synth_box_points(rng, center, dims, yaw, 600).astype(np.float32)
        pad = np.zeros((1024, 3), np.float32)
        pad[:600] = pts
        mask = np.zeros(1024, bool)
        mask[:600] = True
        fit = cuboid_fit.fit_cuboids(
            jnp.asarray(pad)[None], jnp.asarray(mask)[None],
            jnp.asarray([[2.0, 1.0, 0.8]]), jnp.asarray([[7.0, 3.0, 2.5]]))
        assert bool(fit.valid[0])
        np.testing.assert_allclose(np.asarray(fit.centroid[0]), center, atol=0.15)
        np.testing.assert_allclose(np.asarray(fit.dims[0]), dims, atol=0.35)
        dyaw = abs(float(fit.yaw[0]) - yaw) % np.pi
        assert min(dyaw, np.pi - dyaw) < 0.05

    def test_dim_gate_rejects(self):
        rng = np.random.default_rng(2)
        pts = synth_box_points(rng, [0, 0, 0], [0.2, 0.2, 0.2], 0.0, 100)
        pad = np.zeros((256, 3), np.float32)
        pad[:100] = pts
        mask = np.zeros(256, bool)
        mask[:100] = True
        fit = cuboid_fit.fit_cuboids(
            jnp.asarray(pad)[None], jnp.asarray(mask)[None],
            jnp.asarray([[2.0, 1.0, 0.8]]), jnp.asarray([[7.0, 3.0, 2.5]]))
        assert not bool(fit.valid[0])


def synth_tree_points(rng, root, radius, height=6.0, n=300, lean=(0.0, 0.0)):
    t = rng.uniform(0, height, n)
    th = rng.uniform(0, 2 * np.pi, n)
    axis = np.array([lean[0], lean[1], 1.0])
    axis /= np.linalg.norm(axis)
    pts = (np.asarray(root)[None] + t[:, None] * axis[None]
           + radius * np.stack([np.cos(th), np.sin(th), np.zeros(n)], 1))
    return pts


class TestCylinderFit:
    def test_recovers_tree(self):
        rng = np.random.default_rng(3)
        root = [5.0, 2.0, 0.0]
        radius = 0.3
        pts = synth_tree_points(rng, root, radius, n=500).astype(np.float32)
        pad = np.zeros((512, 3), np.float32)
        pad[:500] = pts
        mask = np.zeros(512, bool)
        mask[:500] = True
        normal = jnp.asarray([[0.0, 0.0, 1.0]])
        d = jnp.asarray([0.0])
        fit = cylinder_fit.fit_cylinders(jnp.asarray(pad)[None],
                                         jnp.asarray(mask)[None], normal, d)
        assert bool(fit.valid[0])
        np.testing.assert_allclose(np.asarray(fit.root[0][:2]), root[:2],
                                   atol=0.4)
        # the reference measures the breast-height diameter as a max pairwise
        # *3D* distance (cylinder_plane_modeller.py:449-460), so the +-0.3 m
        # band height inflates it: expected ~ sqrt(0.6^2 + 0.6^2)/2 = 0.42
        assert 0.25 < float(fit.radius[0]) < 0.45
        assert float(fit.ray[0, 2]) > 0.95

    def test_plane_fit(self):
        rng = np.random.default_rng(4)
        # plane z = 0.1 x + 0.5 with noise + outliers
        xy = rng.uniform(-5, 5, (200, 2))
        z = 0.1 * xy[:, 0] + 0.5 + rng.normal(0, 0.01, 200)
        pts = np.column_stack([xy, z]).astype(np.float32)
        pts[:10, 2] += 3.0  # outliers
        mask = np.ones(200, bool)
        n, d = cylinder_fit.fit_plane_lsq(jnp.asarray(pts)[None],
                                          jnp.asarray(mask)[None])
        n, d = np.asarray(n[0]), float(d[0])
        # check plane passes near (0, 0, 0.5)
        assert abs(np.dot(n, [0, 0, 0.5]) + d) < 0.05
        assert n[2] > 0.9

    def test_plane_fit_ransac_heavy_outliers(self):
        """40% structured outliers: LSQ tilts, RANSAC must not
        (open3d segment_plane parity, process_cloud_node_outdoor.py:283)."""
        rng = np.random.default_rng(5)
        n_in, n_out = 120, 80
        xy = rng.uniform(-5, 5, (n_in, 2))
        z = 0.05 * xy[:, 1] + 1.0 + rng.normal(0, 0.01, n_in)
        inliers = np.column_stack([xy, z])
        # outliers: a slanted wall
        t = rng.uniform(0, 4, (n_out, 2))
        wall = np.column_stack([t[:, 0], np.full(n_out, 5.0), t[:, 1]])
        pts = np.concatenate([inliers, wall]).astype(np.float32)
        mask = np.ones(len(pts), bool)
        n, d, cnt = cylinder_fit.fit_plane_ransac(
            jnp.asarray(pts)[None], jnp.asarray(mask)[None], thresh=0.05)
        n, d = np.asarray(n[0]), float(d[0])
        assert int(cnt[0]) >= n_in * 0.9
        assert n[2] > 0.99                       # stays horizontal-ish
        assert abs(np.dot(n, [0, 0, 1.0]) + d) < 0.05
        # degenerate guard: empty mask row doesn't NaN
        n2, d2, cnt2 = cylinder_fit.fit_plane_ransac(
            jnp.zeros((1, 8, 3)), jnp.zeros((1, 8), bool))
        assert np.all(np.isfinite(np.asarray(n2)))
        assert int(cnt2[0]) == 0

    def test_plane_fit_ransac_sparse_mask(self):
        """Live-pipeline shape: the patch mask covers only ~4% of 1024
        padded ground points (pipeline.py:175-181) and 30% of THOSE are
        wall outliers. Hypotheses must be drawn from the masked subset —
        uniform draws over all padded slots would yield no valid triple
        and silently fall back to outlier-contaminated LSQ."""
        rng = np.random.default_rng(11)
        G = 1024
        n_in, n_out = 28, 12            # 40 masked points out of 1024
        pts = rng.uniform(-50, 50, (G, 3)).astype(np.float32)  # padding junk
        mask = np.zeros(G, bool)
        sel = rng.choice(G, n_in + n_out, replace=False)
        xy = rng.uniform(-1, 1, (n_in, 2))
        z = 0.02 * xy[:, 0] + 0.3 + rng.normal(0, 0.005, n_in)
        pts[sel[:n_in]] = np.column_stack([xy, z])
        # wall outliers: vertical plane
        t = rng.uniform(0, 2, (n_out, 2))
        pts[sel[n_in:]] = np.column_stack([t[:, 0], np.full(n_out, 1.0), t[:, 1]])
        mask[sel] = True
        n, d, cnt = cylinder_fit.fit_plane_ransac(
            jnp.asarray(pts)[None], jnp.asarray(mask)[None], thresh=0.05)
        n, d = np.asarray(n[0]), float(d[0])
        assert int(cnt[0]) >= n_in * 0.8     # valid hypotheses were found
        assert n[2] > 0.99                   # ground stays horizontal
        assert abs(np.dot(n, [0, 0, 0.3]) + d) < 0.05


# ---------------------------------------------------------------------------
class TestTracker:
    def test_hungarian_gating(self):
        cost = np.array([[0.1, 5.0], [5.0, 0.2], [9.0, 9.0]])
        matches, lost, new = hungarian_assignment(cost, unassigned_cost=2.0)
        assert (0, 0) in matches and (1, 1) in matches
        assert lost == [2] and new == []

    def test_track_lifecycle_and_ema(self):
        tr = MultiClassTracker({5: 2.0}, downsample_res=-1)
        rng = np.random.default_rng(5)
        pts = rng.normal(0, 1, (50, 3))
        tr.update(5, np.array([[0.0, 0.0, 4.0, 2.0]]), [pts], 0)
        assert len(tr.tracks) == 1 and tr.tracks[0].age == 1
        tr.update(5, np.array([[1.0, 0.0, 4.0, 2.0]]), [pts], 1)
        t = tr.tracks[0]
        assert t.age == 2
        assert abs(t.x - 0.1) < 1e-9          # EMA alpha = 0.1
        # far detection -> new track
        tr.update(5, np.array([[50.0, 0.0, 4.0, 2.0]]), [pts], 2)
        assert len(tr.tracks) == 2

    def test_voxel_downsample(self):
        pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [5.0, 5, 5]])
        out = voxel_downsample(pts, 0.3)
        assert len(out) == 2


# ---------------------------------------------------------------------------
class TestRGBD:
    def test_backprojection(self):
        H, W = 32, 48
        depth = np.full((H, W), 2.0, np.float32)
        masks = np.zeros((2, H, W), bool)
        masks[0, 8:16, 8:16] = True
        masks[1, 20:28, 30:40] = True
        cloud = rgbd.backproject(
            jnp.asarray(depth), jnp.asarray(masks),
            jnp.asarray([1, 2], jnp.int32), jnp.asarray([0.9, 0.4]),
            fx=40.0, fy=40.0, cx=W / 2, cy=H / 2, conf_thresh=0.5)
        v = np.asarray(cloud.valid).reshape(H, W)
        assert v[10, 10] and not v[0, 0]
        assert not v[22, 32]           # below confidence threshold
        # center pixel backprojects to (0, 0, 2)
        xyz = np.asarray(cloud.xyz).reshape(H, W, 3)
        np.testing.assert_allclose(xyz[H // 2, W // 2], [0, 0, 2.0], atol=0.1)


# ---------------------------------------------------------------------------
class TestPipeline:
    def test_scene_to_measurements(self):
        rng = np.random.default_rng(7)
        # scene: one car, two trees, ground
        car_c, car_dims, car_yaw = [8.0, 2.0, 0.75], [4.4, 1.8, 1.5], 0.4
        tree_roots = [[4.0, -4.0, 0.0], [12.0, 6.0, 0.0]]
        pipeline = ProcessCloudPipeline()
        pose = np.asarray(se3.identity(), np.float32)
        obs = {}
        for scan in range(4):
            pts, labs = [], []
            g_xy = rng.uniform(-15, 15, (300, 2))
            pts.append(np.column_stack([g_xy, np.zeros(300)]))
            labs.append(np.full(300, 1))
            pts.append(synth_box_points(rng, car_c, car_dims, car_yaw, 400))
            labs.append(np.full(400, 5))
            for tr in tree_roots:
                pts.append(synth_tree_points(rng, tr, 0.3, n=200))
                labs.append(np.full(200, 8))
            xyz = np.concatenate(pts).astype(np.float32)
            lab = np.concatenate(labs)
            obs = pipeline.process_scan(xyz, lab, pose)
        assert "cub_pose" in obs and len(obs["cub_pose"]) >= 1
        assert "cyl_root" in obs and len(obs["cyl_root"]) == 2
        # car centroid recovered (body frame == world frame, identity pose)
        d = np.linalg.norm(obs["cub_pose"][:, 4:6] - np.asarray(car_c)[:2],
                           axis=1)
        assert d.min() < 0.5
        roots = obs["cyl_root"]
        for tr in tree_roots:
            assert np.linalg.norm(roots[:, :2] - np.asarray(tr)[:2],
                                  axis=1).min() < 0.5

    def test_kitti_preset(self):
        """KITTI config variant (process_cloud_node_outdoor_kitti_params
        .yaml + kitti class_info): KITTI semantic ids (car=10, tree=71,
        ground=40), 100 m range, same pipeline machinery."""
        from slide_slam_tpu.frontend.pipeline import kitti_pipeline_config

        cfg = kitti_pipeline_config()
        assert cfg.max_range == 100.0
        ids = {c.name: c.label for c in cfg.classes}
        assert ids == {"ground": 40, "car": 10, "tree": 71, "lightpole": 80}
        import dataclasses
        rng = np.random.default_rng(9)
        # KITTI HDL-64 clouds are dense: the preset's conservative
        # first-layer DBSCAN (eps 0.1 / 7 samples) needs >~250 pts/m^2, so
        # give the test cloud matching density (and capacity to keep it)
        cfg = dataclasses.replace(cfg, max_points_per_class=4096)
        pipeline = ProcessCloudPipeline(cfg)
        pose = np.asarray(se3.identity(), np.float32)
        obs = {}
        for scan in range(4):
            pts, labs = [], []
            g_xy = rng.uniform(-15, 15, (300, 2))
            pts.append(np.column_stack([g_xy, np.zeros(300)]))
            labs.append(np.full(300, 40))
            pts.append(synth_box_points(rng, [8.0, 2.0, 0.75],
                                        [2.0, 1.0, 0.8], 0.4, 4000))
            labs.append(np.full(4000, 10))
            pts.append(synth_tree_points(rng, [4.0, -4.0, 0.0], 0.3, n=2000))
            labs.append(np.full(2000, 71))
            xyz = np.concatenate(pts).astype(np.float32)
            lab = np.concatenate(labs)
            obs = pipeline.process_scan(xyz, lab, pose)
        assert "cyl_root" in obs and len(obs["cyl_root"]) >= 1
        assert "cub_pose" in obs and len(obs["cub_pose"]) >= 1


# ---------------------------------------------------------------------------
class TestSegmentation:
    def test_forward_shapes(self):
        from slide_slam_tpu.frontend import segmentation as seg

        model = seg.small_segmentator(num_classes=8)
        params = seg.init_params(model, jax.random.PRNGKey(0), height=16,
                                 width=128)
        x = jnp.zeros((1, 16, 128, 5))
        labels = seg.segment(model, params, x)
        assert labels.shape == (1, 16, 128)
        assert labels.dtype == jnp.int32

    def test_crf_smooths_isolated_errors(self):
        """CRF head (CRF.py:10-127): a lone misclassified pixel inside a
        spatially-tight uniform region flips to the neighborhood class;
        distant regions don't bleed into each other."""
        from slide_slam_tpu.frontend import segmentation as seg

        H, W, C = 8, 16, 3
        xyz = np.zeros((1, H, W, 3), np.float32)
        xyz[0, :, :8] = [0.0, 0.0, 0.0]      # region A: tight cluster
        xyz[0, :, 8:] = [50.0, 0.0, 0.0]     # region B: far away
        sm = np.zeros((1, H, W, C), np.float32)
        sm[0, :, :8, 1] = 0.9                # region A: class 1
        sm[0, :, :8, 0] = 0.1
        sm[0, :, 8:, 2] = 0.9                # region B: class 2
        sm[0, :, 8:, 0] = 0.1
        # one bad pixel in the middle of A claims class 2
        sm[0, 4, 4] = [0.05, 0.15, 0.8]
        mask = np.ones((1, H, W), bool)
        out = seg.crf_refine(jnp.asarray(xyz), jnp.asarray(sm),
                             jnp.asarray(mask), iters=3)
        out = np.asarray(out)
        assert out[0, 4, 4].argmax() == 1        # error smoothed away
        assert out[0, 2, 2].argmax() == 1        # region A stable
        assert out[0, 4, 12].argmax() == 2       # region B stable

    def test_segment_with_crf_shapes(self):
        from slide_slam_tpu.frontend import segmentation as seg

        model = seg.small_segmentator(num_classes=6)
        params = seg.init_params(model, jax.random.PRNGKey(0), height=16,
                                 width=64)
        x = np.zeros((1, 16, 64, 5), np.float32)
        x[..., 0] = 5.0     # valid range everywhere
        labels = seg.segment_with_crf(model, params, jnp.asarray(x), iters=1)
        assert labels.shape == (1, 16, 64)


class TestCuboidFinalization:
    """Convex-hull PCA prefilter + yaw clustering
    (cuboid_utils_outdoor.py:80-90, 211-305)."""

    def test_hull_prefilter_resists_interior_density_bias(self):
        """A dense off-axis interior blob must not tilt the PCA direction
        when fitting on the hull outline (the reference's use_convex)."""
        rng = np.random.default_rng(7)
        yaw = 0.5
        pts = synth_box_points(rng, [0, 0, 0.75], [4.4, 1.8, 1.5], yaw,
                               400).astype(np.float32)
        # diagonal interior blob (as if one corner reflected many returns)
        t = rng.uniform(0, 1, 600)
        blob = np.stack([3.0 * t - 1.5, 2.0 * t - 1.0,
                         rng.uniform(0, 1.5, 600)], 1)
        c, s = np.cos(yaw), np.sin(yaw)
        blob[:, :2] = blob[:, :2] @ np.array([[c, s], [-s, c]]) * 0.4
        allp = np.vstack([pts, blob.astype(np.float32)])
        pad = np.zeros((2048, 3), np.float32)
        pad[:len(allp)] = allp
        mask = np.zeros(2048, bool)
        mask[:len(allp)] = True
        fit = cuboid_fit.fit_cuboids(
            jnp.asarray(pad)[None], jnp.asarray(mask)[None],
            jnp.asarray([[2.0, 1.0, 0.8]]), jnp.asarray([[7.0, 3.0, 2.5]]),
            use_convex=True)
        dyaw = abs(float(fit.yaw[0]) - yaw) % np.pi
        assert min(dyaw, np.pi - dyaw) < 0.07

    def test_hull_mask_selects_outline(self):
        rng = np.random.default_rng(8)
        pts = np.zeros((1, 256, 3), np.float32)
        pts[0, :, :2] = rng.normal(0, 1, (256, 2))
        mask = np.ones((1, 256), bool)
        hm = np.asarray(cuboid_fit._hull_vertex_mask(
            jnp.asarray(pts), jnp.asarray(mask)))[0]
        # far fewer hull vertices than points, and every hull vertex is
        # extreme: its projection on some direction is the max
        assert 3 <= hm.sum() <= cuboid_fit.N_HULL_DIRS
        r = np.linalg.norm(pts[0, :, :2], axis=1)
        assert hm[np.argmax(r)]          # farthest point is always on hull

    def test_cluster_cuboid_orientation_snaps_to_two_orthogonal(self):
        rng = np.random.default_rng(9)
        main = 0.3
        yaws = np.concatenate([
            main + rng.normal(0, 0.05, 12),                 # dominant row
            main + np.pi / 2 + rng.normal(0, 0.05, 5),      # cross row
        ])
        snapped = cuboid_fit.cluster_cuboid_orientation(yaws)
        uniq = np.unique(np.round(snapped, 6))
        assert len(uniq) == 2
        d = abs(uniq[0] - uniq[1]) % np.pi
        assert np.isclose(min(d, np.pi - d), np.pi / 2, atol=1e-6)
        # dominant cluster center near the true main direction
        assert min(abs(uniq - main)) < 0.1

    def test_cluster_orientation_small_n_passthrough(self):
        y = np.array([0.3, 1.2])
        np.testing.assert_array_equal(
            cuboid_fit.cluster_cuboid_orientation(y), y)

    def test_cluster_orientation_merges_close_centers(self):
        rng = np.random.default_rng(10)
        yaws = 0.4 + rng.normal(0, 0.03, 10)   # one direction only
        snapped = cuboid_fit.cluster_cuboid_orientation(yaws)
        uniq = np.unique(np.round(snapped, 6))
        assert len(uniq) == 1                  # all snap to the merged center
        assert abs(uniq[0] - 0.4) < 0.05
