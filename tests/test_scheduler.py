"""Scheduler + stamp-matching tests — direct ports of the reference's
input_test.cpp:86-150 and sloam_test.cpp:20-205 scenarios."""
from collections import deque

import numpy as np
import pytest

from slide_slam_tpu.geometry import se3
from slide_slam_tpu.runtime import scheduler as sch


def sp(stamp, x=0.0):
    pose = np.asarray(se3.from_xyz_yaw(x, 0.0, 0.0, 0.0), np.float32)
    return sch.StampedPose(stamp=stamp, pose=pose)


def obs(stamp, x=0.0):
    return sch.Observation(stamped_pose=sp(stamp, x))


def rel(stamp, robot=1, only_odom=False):
    ident = np.asarray(se3.identity(), np.float32)
    return sch.RelativeMeas(stamp=stamp, relative_pose=ident, robot_index=robot,
                            odom_pose=ident, only_use_odom=only_odom)


class TestPickNextMeasurement:
    def test_all_empty(self):
        o, ob, r = deque(), deque(), deque()
        assert sch.pick_next_measurement(o, ob, r, sp(0.0), 1000.0, 3.0, 0.5) == 0

    def test_odom_only(self):
        o = deque([sp(1.0, x=1.0)])
        assert sch.pick_next_measurement(o, deque(), deque(), sp(0.0),
                                         1000.0, 3.0, 0.5) == 1

    def test_observation_only(self):
        ob = deque([obs(1.0)])
        assert sch.pick_next_measurement(deque(), ob, deque(), sp(0.0),
                                         1000.0, 3.0, 0.5) == 2

    def test_relative_only(self):
        r = deque([rel(1.0)])
        assert sch.pick_next_measurement(deque(), deque(), r, sp(0.0),
                                         1000.0, 3.0, 0.5) == 3

    def test_earliest_of_obs_and_rel(self):
        assert sch.pick_next_measurement(
            deque(), deque([obs(1.0)]), deque([rel(10.0)]), sp(0.0),
            1000.0, 3.0, 0.5) == 2
        assert sch.pick_next_measurement(
            deque(), deque([obs(10.0)]), deque([rel(1.0)]), sp(0.0),
            1000.0, 3.0, 0.5) == 3

    def test_large_odom_queue_pops(self):
        big = deque(sp(float(i), x=1.0) for i in range(100))
        assert sch.pick_next_measurement(big, deque(), deque(), sp(0.0),
                                         76.0, 3.0, 0.5) == 1
        assert len(big) == 27
        assert big[0].stamp == 73.0
        # not moved enough -> 0, queue untouched
        assert sch.pick_next_measurement(big, deque(), deque(), sp(0.0),
                                         76.0, 3.0, 1.5) == 0
        assert len(big) == 27
        assert big[0].stamp == 73.0

    def test_msg_delay_tolerance(self):
        assert sch.pick_next_measurement(
            deque([sp(1.0, x=1.0)]), deque([obs(10.0)]), deque([rel(10.0)]),
            sp(0.0), 10.0, 8.0, 0.5) == 1
        assert sch.pick_next_measurement(
            deque([sp(1.0, x=1.0)]), deque([obs(1.0)]), deque([rel(10.0)]),
            sp(0.0), 10.0, 8.0, 0.5) == 2
        assert sch.pick_next_measurement(
            deque([sp(1.0, x=1.0)]), deque([obs(10.0)]), deque([rel(1.0)]),
            sp(0.0), 10.0, 8.0, 0.5) == 3

    def test_pops_entries_before_last_factor(self):
        o = deque(sp(float(i), x=1.0) for i in range(12))
        ob = deque(obs(float(i), x=1.0) for i in range(12))
        r = deque(rel(float(i)) for i in range(12))
        latest = sp(10.0)  # identity pose at t=10
        assert sch.pick_next_measurement(o, ob, r, latest, 12.0, 3.0, 0.5) == 0
        assert len(o) == 2 and len(ob) == 2 and len(r) == 2
        assert o[0].stamp == 10.0


class TestIndexClosestStamp:
    def test_empty(self):
        idx, dt = sch.index_closest_stamp([], 10.0)
        assert idx == -1 and dt == np.inf

    def test_single(self):
        idx, dt = sch.index_closest_stamp([5.0], 10.0)
        assert idx == 0 and dt == 5.0

    def test_multiple_and_ties(self):
        stamps = [5.0, 15.0, 12.0]
        idx, dt = sch.index_closest_stamp(stamps, 11.0)
        assert idx == 2 and abs(dt - 1.0) < 1e-12
        idx, dt = sch.index_closest_stamp(stamps, 13.5)
        assert idx == 1 and abs(dt - 1.5) < 1e-12   # first index wins ties
        idx, dt = sch.index_closest_stamp(stamps, 13.4)
        assert idx == 2 and abs(dt - 1.4) < 1e-9


class TestFindRelativeMeasurementMatch:
    def test_empty(self):
        matches = sch.find_relative_measurement_matches([], [0, 0], {}, 0)
        assert matches == []

    def test_same_robot_raises(self):
        with pytest.raises(ValueError):
            sch.find_relative_measurement_matches(
                [rel(1.0, robot=0)], [0, 0], {0: [], 1: []}, 0)

    def test_only_use_odom_raises(self):
        with pytest.raises(ValueError):
            sch.find_relative_measurement_matches(
                [rel(1.0, robot=1, only_odom=True)], [0, 0], {0: [], 1: []}, 0)

    def test_no_matching_poses(self):
        feas = [rel(5.0)]
        matches = sch.find_relative_measurement_matches(
            feas, [0, 0], {0: [], 1: []}, 0)
        assert matches == []

    def test_single_match(self):
        feas = [rel(5.0)]
        matches = sch.find_relative_measurement_matches(
            feas, [1, 1], {0: [5.0], 1: [5.0]}, 0)
        assert len(matches) == 1
        assert matches[0].index_host == 0 and matches[0].index_other == 0
        assert feas == []

    def test_multiple_matches(self):
        feas = [rel(5.0), rel(7.000001)]
        matches = sch.find_relative_measurement_matches(
            feas, [2, 2], {0: [5.0, 7.0], 1: [5.0, 7.0]}, 0)
        assert len(matches) == 2
        assert (matches[0].index_host, matches[0].index_other) == (0, 0)
        assert (matches[1].index_host, matches[1].index_other) == (1, 1)
        assert feas == []

    def test_exceeds_1ms_threshold(self):
        feas = [rel(10.0)]
        matches = sch.find_relative_measurement_matches(
            feas, [3, 3], {0: [5.0, 7.0, 9.008], 1: [5.0, 7.0, 10.002]}, 0)
        assert matches == []
        assert len(feas) == 1   # not prunable yet (host hasn't passed stamp)

    def test_stale_pruning(self):
        feas = [rel(2.0)]
        matches = sch.find_relative_measurement_matches(
            feas, [1, 1], {0: [4.0], 1: [4.0]}, 0)
        assert matches == []
        assert feas == []       # both robots past the stamp -> pruned
