"""Native C++ runtime core: scheduler parity vs the python reference
implementation, and wire-codec round trips."""
from collections import deque

import numpy as np
import pytest

from slide_slam_tpu import native
from slide_slam_tpu.comm.database import packet_from_obs
from slide_slam_tpu.geometry import se3np
from slide_slam_tpu.runtime import scheduler as sch

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def pose(x=0.0):
    return se3np.from_xyz_yaw(x, 0.0, 0.0, 0.0)


class TestNativeScheduler:
    def _mk(self):
        return native.NativeQueues()

    def test_empty(self):
        q = self._mk()
        kind, *_ = q.pick_next(1000.0, 3.0, 0.5)
        assert kind == 0

    def test_odom_pick_and_pop_semantics(self):
        q = self._mk()
        for i in range(100):
            q.push_odom(float(i), pose(1.0))
        q.set_latest_odom(0.0, pose(0.0))
        kind, stamp, p, _ = q.pick_next(76.0, 3.0, 0.5)
        assert kind == 1
        assert stamp == 73.0
        assert q.sizes()[0] == 27
        # not moved enough
        kind, *_ = q.pick_next(76.0, 3.0, 1.5)
        assert kind == 0
        assert q.sizes()[0] == 27

    def test_obs_vs_rel_ordering(self):
        q = self._mk()
        q.push_observation(1.0, pose(), {"id": "obs"})
        q.push_relative(10.0, pose(), {"id": "rel"}, 1, False)
        kind, stamp, p, obj = q.pick_next(1000.0, 3.0, 0.5)
        assert kind == 2 and obj["id"] == "obs"
        q.pop(2)
        kind, stamp, p, obj = q.pick_next(1000.0, 3.0, 0.5)
        assert kind == 3 and obj["id"] == "rel"

    def test_matches_python_reference_randomized(self):
        rng = np.random.default_rng(0)
        q = self._mk()
        odom_q, obs_q, rel_q = deque(), deque(), deque()
        t = 0.0
        latest = sch.StampedPose(stamp=0.0, pose=pose(0.0))
        q.set_latest_odom(0.0, pose(0.0))
        for trial in range(200):
            t += rng.uniform(0.1, 0.6)
            kind_event = rng.integers(0, 3)
            x = rng.uniform(0, 5)
            if kind_event == 0:
                q.push_odom(t, pose(x))
                odom_q.append(sch.StampedPose(stamp=t, pose=pose(x)))
            elif kind_event == 1:
                q.push_observation(t, pose(x), None)
                obs_q.append(sch.Observation(
                    stamped_pose=sch.StampedPose(stamp=t, pose=pose(x))))
            else:
                rel_q.append(sch.RelativeMeas(
                    stamp=t, relative_pose=pose(), robot_index=1,
                    odom_pose=pose(x)))
                q.push_relative(t, pose(x), None, 1, False)
            now = t + rng.uniform(0, 5)
            got = q.pick_next(now, 3.0, 0.5)[0]
            want = sch.pick_next_measurement(odom_q, obs_q, rel_q, latest,
                                             now, 3.0, 0.5)
            assert got == want, (trial, got, want)
            # consume whatever was selected in both implementations
            if want == 1:
                odom_q.popleft()
            elif want == 2:
                obs_q.popleft()
            elif want == 3:
                rel_q.popleft()
            if want != 0:
                q.pop(want)


class TestWireCodec:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        obs = {
            "cyl_root": rng.normal(size=(3, 3)).astype(np.float32),
            "cyl_ray": rng.normal(size=(3, 3)).astype(np.float32),
            "cyl_radius": rng.uniform(0.1, 0.5, 3).astype(np.float32),
            "cyl_label": np.array([8, 8, 9], np.int32),
            "cub_pose": rng.normal(size=(2, 7)).astype(np.float32),
            "cub_scale": rng.uniform(1, 3, (2, 3)).astype(np.float32),
            "cub_label": np.array([5, 5], np.int32),
            "ell_pose": rng.normal(size=(1, 7)).astype(np.float32),
            "ell_scale": rng.uniform(0.2, 1, (1, 3)).astype(np.float32),
            "ell_label": np.array([2], np.int32),
        }
        p = packet_from_obs(1234.5678, pose(3.0), pose(0.1), obs)
        data = native.encode_packet(p)
        q = native.decode_packet(data)
        assert abs(q.stamp - p.stamp) < 1e-9
        np.testing.assert_allclose(q.key_pose, p.key_pose)
        np.testing.assert_allclose(q.cyl_root, p.cyl_root)
        np.testing.assert_allclose(q.cyl_radius, p.cyl_radius)
        np.testing.assert_array_equal(q.cyl_label, p.cyl_label)
        np.testing.assert_allclose(q.cub_pose, p.cub_pose)
        np.testing.assert_array_equal(q.ell_label, p.ell_label)

    def test_empty_packet(self):
        p = packet_from_obs(1.0, pose(), pose(), {})
        q = native.decode_packet(native.encode_packet(p))
        assert len(q.cyl_radius) == 0 and len(q.cub_label) == 0
