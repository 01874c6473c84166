"""Pallas DBSCAN (interpret mode on CPU) vs the XLA reference kernel."""
import jax.numpy as jnp
import numpy as np

from slide_slam_tpu.frontend import clustering
from slide_slam_tpu.frontend.clustering_pallas import dbscan_pallas


def test_pallas_matches_xla_dbscan():
    rng = np.random.default_rng(0)
    blobs = np.concatenate([
        rng.normal([0, 0, 0], 0.2, (40, 3)),
        rng.normal([5, 5, 0], 0.2, (40, 3)),
        rng.normal([10, 0, 0], 0.2, (30, 3)),
        rng.uniform(-20, 20, (10, 3)),
    ]).astype(np.float32)
    n = 128
    pad = np.zeros((n, 3), np.float32)
    pad[:len(blobs)] = blobs
    mask = np.zeros(n, bool)
    mask[:len(blobs)] = True

    ref = np.asarray(clustering.dbscan(jnp.asarray(pad), jnp.asarray(mask),
                                       eps=0.8, min_samples=5))
    got = np.asarray(dbscan_pallas(jnp.asarray(pad), jnp.asarray(mask),
                                   eps=0.8, min_samples=5, interpret=True))
    k = len(blobs)
    assert np.array_equal(got[:k] == -1, ref[:k] == -1)
    # same partitions (both use lowest-index labels, so exact equality)
    np.testing.assert_array_equal(got[:k], ref[:k])
