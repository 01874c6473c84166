"""Open-vocabulary RGBD frontend tests.

Parity target: detect_open_vocab.py (YOLO-World queries from the class
YAML, bbox-filled masks, confidence gating, depth backprojection into a
labeled cloud) — the external network is replaced by a scripted detector,
exactly as the real one plugs in."""
import numpy as np

from slide_slam_tpu.frontend import open_vocab as ov


CLS_YAML = {
    "chair": {"id": 1, "length_cutoff": [0.2, 1.5],
              "height_cutoff": [0.2, 1.5], "class_assignment_thresh": 0.75},
    "table": {"id": 2, "length_cutoff": [0.5, 5.0],
              "height_cutoff": [0.2, 2.0], "class_assignment_thresh": 1.5},
    "whiteboard": {"id": 7, "length_cutoff": [0.5, 4.0],
                   "height_cutoff": [0.5, 2.5],
                   "class_assignment_thresh": 1.0},
}


def _frontend(detect_fn):
    return ov.OpenVocabFrontend(
        detect_fn=detect_fn, classes=ov.parse_class_info(CLS_YAML),
        fx=200.0, fy=200.0, cx=80.0, cy=60.0, depth_scale=1.0)


def test_queries_from_class_yaml():
    fe = _frontend(lambda rgb: [])
    assert fe.queries == ["chair", "table", "whiteboard"]
    assert fe._by_name["whiteboard"].class_id == 7


def test_bbox_fill_and_backprojection():
    H, W = 120, 160
    depth = np.full((H, W), 2.0, np.float32)

    def detector(rgb):
        return [ov.Detection("chair", 0.9,
                             np.asarray([40, 30, 80, 70], float)),
                ov.Detection("table", 0.2,          # below threshold
                             np.asarray([0, 0, 20, 20], float)),
                ov.Detection("unknown thing", 0.99,  # not in queries
                             np.asarray([100, 10, 120, 40], float))]

    fe = _frontend(detector)
    cloud = fe.process_frame(np.zeros((H, W, 3), np.uint8), depth)
    valid = np.asarray(cloud.valid)
    labels = np.asarray(cloud.label)[valid]
    assert valid.sum() == 40 * 40            # bbox fill
    assert np.all(labels == 1)               # chair id
    # center pixel of the box backprojects to z=2, x=(60-80)/200*2=-0.2
    xyz = np.asarray(cloud.xyz).reshape(H, W, 3)
    np.testing.assert_allclose(xyz[50, 60], [-0.2, -0.1, 2.0], atol=1e-5)


def test_world_transform_and_instance_gates():
    from slide_slam_tpu.geometry import se3np

    H, W = 100, 120
    depth = np.full((H, W), 3.0, np.float32)

    def detector(rgb):
        # chair-sized box and a sliver too short for the height cutoff
        return [ov.Detection("chair", 0.8, np.asarray([30, 30, 70, 70], float)),
                ov.Detection("table", 0.8, np.asarray([90, 50, 115, 54], float))]

    fe = _frontend(detector)
    # level forward-looking camera: world_x = cam_z, world_y = -cam_x,
    # world_z = -cam_y (z-up world), at (10, 0, 0)
    R_wc = np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
    pose = np.concatenate([se3np.quat_from_matrix(R_wc),
                           [10.0, 0.0, 0.0]]).astype(np.float32)
    cloud = fe.process_frame(np.zeros((H, W, 3), np.uint8), depth,
                             cam_pose7=pose)
    meas = fe.instance_measurements(cloud)
    # the chair (0.6 x 0.6 m) passes gates; the 4-px-tall table strip
    # (0.06 m high) fails its height cutoff
    assert len(meas) == 1
    pts, mask, cls_id, conf = meas[0]
    assert cls_id == 1 and conf > 0.7
    # world frame: the wall of points sits 3 m in front of x=10
    assert abs(pts[mask][:, 0].mean() - 13.0) < 0.2


def test_mask_detections_pass_through():
    H, W = 60, 80
    depth = np.full((H, W), 1.0, np.float32)
    m = np.zeros((H, W), bool)
    m[10:30, 10:30] = True

    def detector(rgb):
        return [ov.Detection("table", 0.95, np.asarray([0, 0, 0, 0], float),
                             mask=m)]

    fe = _frontend(detector)
    cloud = fe.process_frame(np.zeros((H, W, 3), np.uint8), depth)
    assert np.asarray(cloud.valid).sum() == m.sum()
    assert np.all(np.asarray(cloud.label)[np.asarray(cloud.valid)] == 2)
