"""AprilTag detection + relative-measurement generation tests.

Parity target: frontend/relative_meas_gen/src/apriltag_meas_gen.cpp (tag
detection via the apriltag library; extrinsics lookup; relative-transform
composition) and apriltag_test.cpp (detection on a fixture image). Here
the fixture is rendered from our own deterministic family and re-detected
under synthetic camera projections."""
import numpy as np
import pytest

from slide_slam_tpu.frontend import apriltag as at
from slide_slam_tpu.geometry import se3np


@pytest.fixture(scope="module")
def family():
    fam = at.generate_family(d=6, min_hamming=11, count=12, seed=42)
    assert len(fam.codes) == 12
    return fam


def test_family_properties(family):
    # min pairwise hamming (incl. rotations) >= 11
    def rots(c):
        out = [c]
        for _ in range(3):
            out.append(at._rotate_code(out[-1], family.d))
        return out

    for i, a in enumerate(family.codes):
        for ra in rots(a)[1:]:
            assert bin(a ^ ra).count("1") >= 11     # rotation-asymmetric
        for b in family.codes[i + 1:]:
            for rb in rots(b):
                assert bin(a ^ rb).count("1") >= 11


def test_decode_with_rotation_and_bitflips(family):
    code = family.codes[3]
    for rot in range(4):
        c = code
        for _ in range(rot):
            c = at._rotate_code(c, family.d)
        # decode of a rotated observation maps back to id 3
        tid, r, h = family.decode(c)
        assert tid == 3 and h == 0
    # two bit flips still decode
    flipped = code ^ (1 << 5) ^ (1 << 20)
    tid, _, h = family.decode(flipped, max_hamming=2)
    assert tid == 3 and h == 2
    # three flips rejected at max_hamming=2 (assuming margin)
    assert family.decode(code ^ 0b111, max_hamming=2) in (None, (3, 0, 3))


def _render_in_scene(family, tag_id, H_px, img_shape=(240, 320), bg=200):
    """Place the rendered tag into a scene via homography H_px mapping tag
    coords ([-1,1]^2 at BLACK border corners) -> image px."""
    tag = family.render(tag_id, cell_px=16).astype(np.float32)
    t = family.total_cells
    span = t - 2
    img = np.full(img_shape, float(bg), np.float32)
    ys, xs = np.mgrid[0:img_shape[0], 0:img_shape[1]]
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(xs.size)], axis=0)
    Hinv = np.linalg.inv(H_px)
    tp = Hinv @ pts
    tx, ty = tp[0] / tp[2], tp[1] / tp[2]
    # tag coords -> rendered-image px: black square spans [-1,1] = span cells
    # of the t-cell render; white border adds 1 cell each side.
    px = (tx + (t / span)) / (2 * t / span) * tag.shape[1]
    py = (ty + (t / span)) / (2 * t / span) * tag.shape[0]
    inside = (px >= 0) & (px < tag.shape[1]) & (py >= 0) & (py < tag.shape[0])
    pxc = np.clip(px.astype(int), 0, tag.shape[1] - 1)
    pyc = np.clip(py.astype(int), 0, tag.shape[0] - 1)
    vals = tag[pyc, pxc]
    flat = img.ravel()
    flat[inside] = vals[inside]
    return img.reshape(img_shape)


def test_detect_axis_aligned(family):
    H = np.array([[40.0, 0, 160], [0, 40.0, 120], [0, 0, 1]])
    img = _render_in_scene(family, 5, H)
    dets = at.detect(img, family)
    assert len(dets) == 1
    assert dets[0].tag_id == 5
    assert dets[0].hamming == 0
    assert np.linalg.norm(dets[0].center - [160, 120]) < 2.0


def test_detect_rotated_and_perspective(family):
    th = 0.5
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    H = np.eye(3)
    H[:2, :2] = R * 35.0
    H[:2, 2] = [150, 130]
    H[2, :2] = [4e-4, -3e-4]      # mild perspective
    img = _render_in_scene(family, 2, H)
    dets = at.detect(img, family)
    assert len(dets) == 1
    assert dets[0].tag_id == 2
    # recovered homography reprojects tag corners onto the warp
    tag_corners = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float)
    expect = at._apply_h(H, tag_corners)
    got = at._apply_h(dets[0].H, tag_corners)
    # corner sets match (orientation-resolved: same cyclic assignment)
    err = np.linalg.norm(np.sort(expect, axis=0) - np.sort(got, axis=0))
    assert err < 6.0


def test_pose_recovery(family):
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    tagsize = 0.4
    # ground-truth camera->tag pose
    T = np.eye(4)
    T[:3, :3] = se3np.quat_to_matrix(
        se3np.quat_normalize(np.asarray([0.98, 0.05, -0.1, 0.05])))
    T[:3, 3] = [0.2, -0.1, 2.0]
    # project tag corners ((+-s/2, +-s/2, 0) in tag frame) through K[R|t]
    corners_tag = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float) \
        * tagsize / 2
    pts = np.concatenate([corners_tag, np.zeros((4, 1)), np.ones((4, 1))], 1)
    cam = (T @ pts.T).T[:, :3]
    uv = (K @ cam.T).T
    uv = uv[:, :2] / uv[:, 2:3]
    H = at._homography_4pt(np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]],
                                    float), uv)
    T_est = at._pose_from_homography(H, K, tagsize)
    assert np.linalg.norm(T_est[:3, 3] - T[:3, 3]) < 0.02
    dR = T_est[:3, :3].T @ T[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 2.0


def test_detect_full_pipeline_pose(family):
    K = np.array([[260.0, 0, 160], [0, 260.0, 120], [0, 0, 1]])
    tagsize = 0.5
    T = np.eye(4)
    T[:3, 3] = [0.1, 0.05, 2.5]
    corners_tag = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float) \
        * tagsize / 2
    pts = np.concatenate([corners_tag, np.zeros((4, 1)), np.ones((4, 1))], 1)
    cam = (T @ pts.T).T[:, :3]
    uv = (K @ cam.T).T
    uv = uv[:, :2] / uv[:, 2:3]
    H = at._homography_4pt(
        np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float), uv)
    img = _render_in_scene(family, 7, H)
    dets = at.detect(img, family, K=K, tagsize=tagsize)
    assert len(dets) == 1 and dets[0].tag_id == 7
    assert np.linalg.norm(dets[0].pose[:3, 3] - T[:3, 3]) < 0.12


def test_measurer_composition(family):
    """CalculateRelativeTransformation mirror: hostbot->cam * cam->tag *
    inv(observedbot->tag) (apriltag_meas_gen.cpp:177-188)."""
    K = np.eye(3)
    bot_to_cam = np.eye(4)
    bot_to_cam[:3, 3] = [0.1, 0.0, 0.3]
    config = {
        "dataset": "CoPeD",
        "wanda": {"id": 2, "tags": [
            {"id": 7, "x": 0.0, "y": 0.0, "z": 0.5,
             "qw": 1.0, "qx": 0.0, "qy": 0.0, "qz": 0.0}]},
    }
    m = at.ApriltagMeasurer(family, K, 0.17, bot_to_cam, config,
                            host_robot_id=0)
    assert 7 in m.tag_table and m.tag_table[7][0] == 2
    cam_to_tag = np.eye(4)
    cam_to_tag[:3, 3] = [0.0, 0.0, 3.0]
    T = m.relative_transform(cam_to_tag, m.tag_table[7][1])
    expect = bot_to_cam @ cam_to_tag @ np.linalg.inv(m.tag_table[7][1])
    np.testing.assert_allclose(T, expect, atol=1e-12)


def test_measurer_end_to_end(family):
    """Rendered image of a peer's tag -> RelativeMeas with correct robot
    index and plausible range."""
    K = np.array([[260.0, 0, 160], [0, 260.0, 120], [0, 0, 1]])
    tagsize = 0.5
    T = np.eye(4)
    T[:3, 3] = [0.0, 0.0, 2.0]
    corners_tag = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float) \
        * tagsize / 2
    pts = np.concatenate([corners_tag, np.zeros((4, 1)), np.ones((4, 1))], 1)
    uv = (K @ (T @ pts.T).T[:, :3].T).T
    uv = uv[:, :2] / uv[:, 2:3]
    H = at._homography_4pt(
        np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float), uv)
    img = _render_in_scene(family, 0, H)
    config = {"dataset": "CoPeD",
              "peer": {"id": 1, "tags": [
                  {"id": 0, "x": 0, "y": 0, "z": 0,
                   "qw": 1, "qx": 0, "qy": 0, "qz": 0}]}}
    m = at.ApriltagMeasurer(family, K, tagsize, np.eye(4), config)
    meas = m.process_image(img, stamp=4.2)
    assert len(meas) == 1
    assert meas[0].robot_index == 1
    assert meas[0].stamp == 4.2
    rng = np.linalg.norm(meas[0].relative_pose[4:7])
    assert rng == pytest.approx(2.0, abs=0.15)
