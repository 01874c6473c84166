"""Scatter variants + chunked-cumsum precision, timed correctly."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/slide_slam_xla_cache")

F = 26624 * 2
NV = 1536

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, NV, F), jnp.int32)
perm = jnp.argsort(idx)
sidx = jnp.sort(idx)
starts = jnp.searchsorted(sidx, jnp.arange(NV, dtype=jnp.int32))
ends = jnp.searchsorted(sidx, jnp.arange(NV, dtype=jnp.int32), side="right")

y_real = np.abs(rng.standard_normal((F, 9))) * 50
y_real[rng.integers(0, F, 64)] *= 2e4
y_real = jnp.asarray(y_real, jnp.float32)

x0 = jnp.zeros((4,), jnp.float32)
_ = jax.device_get(x0[0])
t0 = time.perf_counter()
for _ in range(5):
    _ = jax.device_get(x0[0])
FLOOR = (time.perf_counter() - t0) / 5
print(f"floor {FLOOR*1e3:.1f} ms")


def timeit(fn, n=30):
    o = fn(y_real)
    _ = jax.device_get(o.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(y_real)
    _ = jax.device_get(o.ravel()[0])
    return (time.perf_counter() - t0 - FLOOR) / n * 1e3


@jax.jit
def scat(y):
    return jnp.zeros((NV, 9), jnp.float32).at[idx].add(y)


@jax.jit
def scat_sorted(y):
    return jnp.zeros((NV, 9), jnp.float32).at[sidx].add(
        y[perm], indices_are_sorted=True)


@jax.jit
def cumsum_chunked(y):
    """Two-level: per-chunk f32 cumsum (short runs) + exact per-variable
    chunk-partial scatter... simplest robust hybrid: segment sum within
    chunks via cumsum, then scatter-add the per-(chunk,var) partials.
    Chunk partials: C=512 rows/chunk -> 104 chunks; boundary diff inside
    chunk is exact-ish; scatter volume drops 512x -> cheap."""
    C = 512
    ys = y[perm].reshape(F // C, C, 9)
    c = jnp.cumsum(ys, axis=1)
    c = jnp.concatenate([jnp.zeros((F // C, 1, 9), jnp.float32), c], axis=1)
    # for each (chunk, var) present: value = c[chunk, min(end, C)] - c[chunk, max(start,0)]
    # implement via per-chunk var boundaries: clip global starts/ends into chunk
    b = jnp.arange(F // C)[:, None] * C
    s_in = jnp.clip(starts[None, :] - b, 0, C)
    e_in = jnp.clip(ends[None, :] - b, 0, C)
    part = jnp.take_along_axis(c, e_in[:, :, None], axis=1) - \
        jnp.take_along_axis(c, s_in[:, :, None], axis=1)   # [B, NV, 9]
    return jnp.sum(part, axis=0)


ref = np.zeros((NV, 9), np.float64)
np.add.at(ref, np.asarray(idx), np.asarray(y_real, np.float64))
for name, fn in [("scatter", scat), ("scatter_sorted", scat_sorted),
                 ("cumsum_chunked", cumsum_chunked)]:
    got = np.asarray(jax.device_get(fn(y_real)), np.float64)
    rel = (np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)).max()
    print(f"{name:16s} {timeit(fn):7.3f} ms  maxrel {rel:.2e}")
