"""GPS/sim adapter tests (reference: relative_meas_gen tests + scripts)."""
import numpy as np
import pytest

from slide_slam_tpu.io import adapters
from slide_slam_tpu.geometry import se3np as se3


def _pose(xyz, qxyzw):
    x, y, z, w = qxyzw
    return np.array([w, x, y, z, *xyz], np.float64)


def test_relative_pose_golden():
    """Golden values from the reference's testMultiUGV.py:17-37."""
    pose1 = _pose([3.4, -5.2, 1.1], [0.4029115, 0.1611646, 0.805823, 0.4029115])
    pose2 = _pose([1, 2, 3], [0, 0, 0.7071068, 0.7071068])
    rel = adapters.relative_pose(pose1, pose2)
    np.testing.assert_almost_equal(rel[4], 7.43896085266152, 5)
    np.testing.assert_almost_equal(rel[5], -2.13116887703829, 5)
    np.testing.assert_almost_equal(rel[6], -1.15324631249453, 5)
    # quaternion up to sign; reference gives xyzw = (-0.398862, 0.1709409,
    # -0.2849014, 0.8547043)
    q = rel[0:4] * np.sign(rel[0])
    np.testing.assert_allclose(
        q, [0.8547043, -0.398862, 0.1709409, -0.2849014], atol=1e-6)


def test_euler_noise_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(10):
        p = se3.retract(se3.identity(), rng.normal(0, 0.8, 6).astype(np.float32))
        e = adapters._euler_xyz_from_quat(p[0:4])
        q = adapters._quat_from_euler_xyz(e)
        np.testing.assert_allclose(q * np.sign(q[0]), p[0:4] * np.sign(p[0]),
                                   atol=1e-5)


def test_add_pose_noise_statistics():
    rng = np.random.default_rng(0)
    base = np.asarray(se3.from_xyz_yaw(1.0, 2.0, 0.5, 0.3))
    samples = np.stack([adapters.add_pose_noise(base, 0.1, 0.02, rng)
                        for _ in range(400)])
    err = samples[:, 4:7] - base[4:7]
    assert abs(err.mean()) < 0.02
    assert abs(err.std() - 0.1) < 0.02
    # rotation perturbation stays small
    dots = np.abs(samples[:, 0:4] @ base[0:4])
    assert np.all(dots > 0.999)


def test_gps_to_enu_flat_earth():
    """Small geodetic offsets must match the local flat-earth approximation."""
    lat0, lon0, alt0 = 39.9526, -75.1652, 12.0  # Philadelphia
    dn, de, du = 30.0, -45.0, 3.0               # metres north/east/up
    lat_m = 111132.92 - 559.82 * np.cos(2 * np.radians(lat0))
    lon_m = 111412.84 * np.cos(np.radians(lat0)) - 93.5 * np.cos(3 * np.radians(lat0))
    enu = adapters.gps_to_enu(lat0, lon0, alt0,
                              lat0 + dn / lat_m, lon0 + de / lon_m, alt0 + du)
    np.testing.assert_allclose(enu, [de, dn, du], atol=0.05)


def test_gps_relative_measurement_sync_gate():
    odom = se3.identity()
    fix1 = (10.0, 39.95, -75.16, 10.0)
    fix2 = (10.02, 39.9501, -75.16, 10.0)
    rm = adapters.gps_relative_measurement(10.0, fix1, fix2, 1, odom)
    assert rm is not None and rm.robot_index == 1
    assert np.linalg.norm(rm.relative_pose[4:7]) > 5.0
    np.testing.assert_allclose(rm.relative_pose[0:4], [1, 0, 0, 0])
    # beyond the sync slop -> dropped
    assert adapters.gps_relative_measurement(
        10.0, (10.0, *fix1[1:]), (10.2, *fix2[1:]), 1, odom) is None


_WORLD = """
<sdf version='1.6'><world name='default'>
  <model name='unit_box_0'>
    <pose>4.0 -2.0 0.5 0 0 0</pose>
    <link name='link'><collision name='c'><geometry>
      <box><size>1.0 2.0 1.0</size></box>
    </geometry></collision></link>
  </model>
  <model name='ground_plane'><pose>0 0 0 0 0 0</pose></model>
  <model name='unit_box_1'>
    <pose>-3.0 6.0 1.0 0 0 1.5708</pose>
    <link name='link'><collision name='c'><geometry>
      <box><size>2.0 1.0 2.0</size></box>
    </geometry></collision></link>
  </model>
</world></sdf>
"""


def test_parse_gazebo_world():
    boxes = adapters.parse_gazebo_world(_WORLD)
    assert [b.name for b in boxes] == ["unit_box_0", "unit_box_1"]
    np.testing.assert_allclose(boxes[0].pose[4:7], [4.0, -2.0, 0.5])
    np.testing.assert_allclose(boxes[0].size, [1.0, 2.0, 1.0])
    assert abs(se3.yaw_of(boxes[1].pose) - 1.5708) < 1e-4


def test_sim_cuboid_detections_in_body_frame():
    boxes = adapters.parse_gazebo_world(_WORLD)
    rng = np.random.default_rng(1)
    robot = np.asarray(se3.from_xyz_yaw(1.0, 0.0, 0.0, np.pi / 2))
    obs = adapters.sim_cuboid_detections(boxes, robot, rng,
                                         std_t_per_m=0.0, std_r_per_m=0.0,
                                         std_s_per_m=0.0)
    assert obs["cub_pose"].shape == (2, 7)
    # world (4,-2) seen from (1,0) facing +y: body x = dy = -2, body y = -dx = -3
    np.testing.assert_allclose(obs["cub_pose"][0, 4:7], [-2.0, -3.0, 0.5],
                               atol=1e-5)
    np.testing.assert_allclose(obs["cub_scale"], [b.size for b in boxes],
                               atol=1e-6)
    assert list(obs["cub_label"]) == [5, 5]
    # range gate
    obs2 = adapters.sim_cuboid_detections(boxes, robot, rng, max_range=4.0)
    assert obs2["cub_pose"].shape == (1, 7)


def test_sim_relative_measurement_noise_scales_with_range():
    rng = np.random.default_rng(2)
    a = se3.identity()
    b = np.asarray(se3.from_xyz_yaw(10.0, 0.0, 0.0, 0.5))
    errs = []
    for _ in range(200):
        rm = adapters.sim_relative_measurement(0.0, a, b, 1, a, rng)
        errs.append(rm.relative_pose[4:7] - b[4:7])
    std = np.stack(errs).std()
    assert 0.2 < std < 0.4   # 0.03 / m * 10 m
