"""ROS1 bag ingestion tests.

Parity target: the reference's data path replays rosbags of
sloam_msgs/SemanticMeasSyncOdom + RelativeInterRobotMeasurementOdom into
the backend (tmux_multi_robot_with_bags_*.sh + robot.cpp:101-175). Here the
bag reader/writer roundtrip is validated bit-exactly, including bz2 chunk
compression and definition-driven deserialization, and a converted bag is
driven through the full SLAM node."""
import bz2
import os
import struct

import numpy as np
import pytest

from slide_slam_tpu.io import logs, rosbag, synthetic


def _make_log(n_kf=20, seed=0):
    rng = np.random.default_rng(seed)
    world = synthetic.make_forest_world(rng, n_trees=30, n_poles=5,
                                        n_cars=5, extent=25.0)
    traj = synthetic.lawnmower_trajectory(n_kf, extent=20.0, rows=2, step=1.5)
    return synthetic.make_log(world, traj, odom_drift_sigma=0.005,
                              pos_noise=0.02, dropout=0.0)


def test_bag_roundtrip(tmp_path):
    log = _make_log()
    bag = str(tmp_path / "robot0.bag")
    rosbag.robot_log_to_bag(bag, log)

    topics = rosbag.bag_topics(bag)
    assert topics == {f"/robot{log.robot_id}/semantic_meas_sync_odom":
                      "sloam_msgs/SemanticMeasSyncOdom"}

    log2 = rosbag.bag_to_robot_log(bag, robot_id=log.robot_id)
    assert len(log2.keyframes) == len(log.keyframes)
    for a, b in zip(log.keyframes, log2.keyframes):
        assert b.stamp == pytest.approx(a.stamp, abs=1e-6)
        np.testing.assert_allclose(b.odom_pose, a.odom_pose, atol=1e-6)
        np.testing.assert_allclose(b.cyl_root, a.cyl_root.reshape(-1, 3),
                                   atol=1e-6)
        np.testing.assert_array_equal(b.cyl_label, a.cyl_label)
        np.testing.assert_allclose(b.cub_scale, a.cub_scale.reshape(-1, 3),
                                   atol=1e-6)
        np.testing.assert_allclose(b.ell_pose, a.ell_pose.reshape(-1, 7),
                                   atol=1e-6)


def test_bag_bz2_chunk(tmp_path):
    """Reader must decompress bz2 chunks (rosbag's default compression)."""
    log = _make_log(n_kf=5, seed=1)
    bag = str(tmp_path / "plain.bag")
    rosbag.robot_log_to_bag(bag, log)

    # recompress the single chunk as bz2
    with open(bag, "rb") as f:
        assert f.read(13) == b"#ROSBAG V2.0\n"
        body = f.read()
    recs = list(rosbag._records(body))
    out = b"#ROSBAG V2.0\n"
    for header, data in recs:
        if header.get("op", b"\x00")[0] == 0x05:
            header = dict(header)
            header["compression"] = b"bz2"
            data = bz2.compress(data)
        h = rosbag._write_header(header)
        out += struct.pack("<I", len(h)) + h
        out += struct.pack("<I", len(data)) + data
    bag2 = str(tmp_path / "compressed.bag")
    with open(bag2, "wb") as f:
        f.write(out)

    log2 = rosbag.bag_to_robot_log(bag2)
    assert len(log2.keyframes) == 5
    np.testing.assert_allclose(log2.keyframes[0].odom_pose,
                               log.keyframes[0].odom_pose, atol=1e-6)


def test_relative_measurement_extraction(tmp_path):
    reg = rosbag.builtin_registry()
    header = {"seq": 0, "stamp": 12.5, "frame_id": ""}
    odom = {"header": header, "child_frame_id": "",
            "pose": {"pose": rosbag._pose_to_ros(
                np.asarray([1, 0, 0, 0, 1.0, 2.0, 0.0])),
                "covariance": [0.0] * 36},
            "twist": {"twist": {"linear": {"x": 0, "y": 0, "z": 0},
                                "angular": {"x": 0, "y": 0, "z": 0}},
                      "covariance": [0.0] * 36}}
    msg = {"header": header,
           "relativePose": rosbag._pose_to_ros(
               np.asarray([1, 0, 0, 0, 3.0, 0.0, 0.0])),
           "robotIdObserver": 0, "robotIdObserved": 1,
           "odometryObserver": odom, "odometryObserved": odom}
    bag = str(tmp_path / "rel.bag")
    rosbag.write_bag(bag, [("/relative_inter_robot_meas_sync",
                            "sloam_msgs/RelativeInterRobotMeasurementOdom",
                            12.5, msg)], registry=reg)
    rel = rosbag.bag_relative_measurements(bag, host_robot_id=0)
    assert len(rel) == 1
    assert rel[0].robot_index == 1 and not rel[0].only_use_odom
    assert rel[0].stamp == pytest.approx(12.5)
    np.testing.assert_allclose(rel[0].relative_pose[4:], [3.0, 0, 0],
                               atol=1e-9)
    # observed-side view keeps its own odom and flags only_use_odom
    rel_obs = rosbag.bag_relative_measurements(bag, host_robot_id=1)
    assert len(rel_obs) == 1
    assert rel_obs[0].robot_index == 0 and rel_obs[0].only_use_odom
    # uninvolved robot sees nothing
    assert rosbag.bag_relative_measurements(bag, host_robot_id=2) == []


def test_definition_driven_parsing():
    """Reader trusts the embedded definition, not builtin specs: parse an
    unknown type from its definition text."""
    reg = rosbag.TypeRegistry()
    definition = (
        "float32[2] xy\nuint8 flag\nMyInner inner\nstring name\n"
        + "=" * 80 + "\nMSG: foo_msgs/MyInner\nint32 a\nfloat64[] b\n")
    reg.parse_definition("foo_msgs/MyOuter", definition)
    payload = (struct.pack("<2f", 1.5, -2.5) + struct.pack("B", 7)
               + struct.pack("<i", -3) + struct.pack("<I", 2)
               + struct.pack("<2d", 0.25, 0.75)
               + struct.pack("<I", 2) + b"hi")
    msg = reg.read("foo_msgs/MyOuter", payload)
    np.testing.assert_allclose(msg["xy"], [1.5, -2.5])
    assert msg["flag"] == 7
    assert msg["inner"]["a"] == -3
    np.testing.assert_allclose(msg["inner"]["b"], [0.25, 0.75])
    assert msg["name"] == "hi"


@pytest.mark.slow
def test_bag_to_slam_end_to_end(tmp_path):
    """Converted bag drives the full SLAM node (the reference's replay)."""
    from slide_slam_tpu.config import SlamConfig
    from slide_slam_tpu.runtime.node import SlamNode

    log = _make_log(n_kf=15, seed=2)
    bag = str(tmp_path / "r0.bag")
    rosbag.robot_log_to_bag(bag, log)
    log2 = rosbag.bag_to_robot_log(bag)

    node = SlamNode(SlamConfig(number_of_robots=1), robot_id=0)
    for kf in log2.keyframes:
        node.process_keyframe(kf.stamp, kf.odom_pose, vars(kf))
    assert len(node.key_poses) == len(log2.keyframes)
    counts = node.landmark_counts()
    assert counts["cylinders"] > 0


def test_cli_convert_bag(tmp_path, capsys):
    from slide_slam_tpu import cli

    log = _make_log(n_kf=6, seed=3)
    bag = str(tmp_path / "r0.bag")
    out = str(tmp_path / "r0.npz")
    rosbag.robot_log_to_bag(bag, log)
    cli.main(["convert-bag", "--bag", bag, "--out", out])
    assert os.path.exists(out)
    log2 = logs.load_log(out)
    assert len(log2.keyframes) == 6
    cli.main(["convert-bag", "--bag", bag, "--list"])
    assert "semantic_meas_sync_odom" in capsys.readouterr().out


def test_write_bag_custom_type_self_describing(tmp_path):
    """Bags written from a custom registry embed a real definition: a FRESH
    reader (no registry supplied) must fully decode the message instead of
    silently yielding {} from an empty message_definition."""
    reg = rosbag.builtin_registry()
    reg.parse_definition(
        "foo_msgs/Custom",
        "float32[3] xyz\nuint8 flag\nstring tag\n")
    msg = {"xyz": [1.0, 2.0, 3.0], "flag": 7, "tag": "hello"}
    bag = str(tmp_path / "custom.bag")
    rosbag.write_bag(bag, [("/t", "foo_msgs/Custom", 1.5, msg)], registry=reg)
    out = list(rosbag.read_bag(bag))
    assert len(out) == 1
    got = out[0].msg
    # decoded payload carries every field, not {}
    assert isinstance(got, dict) and got, f"empty decode: {out[0]!r}"
    np.testing.assert_allclose(got["xyz"], [1.0, 2.0, 3.0])
    assert got["flag"] == 7 and got["tag"] == "hello"
    # unknown types without a definition raise instead of writing junk
    with pytest.raises(KeyError):
        rosbag.write_bag(str(tmp_path / "bad.bag"),
                         [("/t", "foo_msgs/Nope", 0.0, {})], registry=reg)
