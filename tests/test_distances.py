"""Object distance kernel tests (cube.cpp:22-82 parity)."""
import jax.numpy as jnp
import numpy as np

from slide_slam_tpu.geometry import se3
from slide_slam_tpu.objects import Cuboids
from slide_slam_tpu.ops import distances


def boxes(centers, scales, labels):
    n = len(centers)
    pose = np.tile(np.asarray([1, 0, 0, 0, 0, 0, 0], np.float32), (n, 1))
    pose[:, 4:7] = np.asarray(centers, np.float32)
    return Cuboids(pose=jnp.asarray(pose),
                   scale=jnp.asarray(np.asarray(scales, np.float32)),
                   label=jnp.asarray(np.asarray(labels, np.int32)),
                   valid=jnp.ones((n,), bool))


def test_weighted_distance_matches_reference_formula():
    """cube.cpp:46-58: (1-w)*|dp| + w*|dscale|/3, 1000 on label mismatch."""
    a = boxes([[0, 0, 0]], [[4, 2, 1]], [5])
    b = boxes([[3, 4, 0], [3, 4, 0]], [[4, 2, 1], [1, 2, 4]], [5, 7])
    d = np.asarray(distances.cuboid_weighted_pairwise(a, b, dim_weight=0.5))
    assert np.isclose(d[0, 0], 0.5 * 5.0)              # pos 5, scale diff 0
    assert d[0, 1] == distances.BIG                    # label gate
    d2 = np.asarray(distances.cuboid_weighted_pairwise(
        boxes([[0, 0, 0]], [[4, 2, 1]], [7]), b, dim_weight=0.25))
    want = 0.75 * 5.0 + 0.25 * np.linalg.norm([3, 0, -3]) / 3.0
    assert np.isclose(d2[0, 1], want, atol=1e-5)


def test_iou_matches_reference_formula():
    """cube.cpp:60-82: axis-aligned volume IoU on centroid +- scale/2."""
    a = boxes([[0, 0, 0]], [[2, 2, 2]], [5])
    same = boxes([[0, 0, 0]], [[2, 2, 2]], [5])
    far = boxes([[10, 0, 0]], [[2, 2, 2]], [5])
    half = boxes([[1, 0, 0]], [[2, 2, 2]], [5])   # overlap vol 4, union 12
    assert np.isclose(float(distances.cuboid_iou_pairwise(a, same)[0, 0]), 1.0)
    assert float(distances.cuboid_iou_pairwise(a, far)[0, 0]) == 0.0
    assert np.isclose(float(distances.cuboid_iou_pairwise(a, half)[0, 0]),
                      4.0 / 12.0, atol=1e-6)


def test_iou_invalid_entries_zero():
    a = boxes([[0, 0, 0]], [[2, 2, 2]], [5])
    b = a._replace(valid=jnp.zeros((1,), bool))
    assert float(distances.cuboid_iou_pairwise(a, b)[0, 0]) == 0.0
