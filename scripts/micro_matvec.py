"""Honest per-iteration cost of the full PCG matvec, in a fori_loop with
data dependencies, at mission shape. Variants: scatter vs segsum reduction,
and J in f32 vs bf16."""
import sys, os; sys.path.insert(0, os.getcwd())
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/slide_slam_xla_cache")

F = 26624
NV = 1536

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, NV, (F, 2)), jnp.int32)
J = jnp.asarray(rng.standard_normal((F, 2, 9, 9)), jnp.float32)
flat = idx.reshape(-1)
perm = jnp.argsort(flat)
sidx = flat[perm]
starts = jnp.searchsorted(sidx, jnp.arange(NV, dtype=jnp.int32)).astype(jnp.int32)
ends = jnp.searchsorted(sidx, jnp.arange(NV, dtype=jnp.int32),
                        side="right").astype(jnp.int32)
x0 = jnp.asarray(rng.standard_normal((NV, 9)), jnp.float32)

xh = jnp.zeros((4,), jnp.float32)
_ = jax.device_get(xh[0])
t0 = time.perf_counter()
for _ in range(5):
    _ = jax.device_get(xh[0])
FLOOR = (time.perf_counter() - t0) / 5
print(f"floor {FLOOR*1e3:.1f} ms")


def matvec_scatter(J, x):
    zg = x[idx]
    Jv = jnp.einsum("fsij,fsj->fi", J, zg)
    y = jnp.einsum("fsij,fi->fsj", J, Jv)
    return jnp.zeros((NV, 9), jnp.float32).at[idx].add(y)


def matvec_segsum(J, x):
    zg = x[idx]
    Jv = jnp.einsum("fsij,fsj->fi", J, zg)
    y = jnp.einsum("fsij,fi->fsj", J, Jv)
    ys = y.reshape(2 * F, 9)[perm]
    c = jnp.cumsum(ys, axis=0)
    c = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), c], axis=0)
    return c[ends] - c[starts]


def matvec_segsum_bf16(J, x):
    zg = x[idx].astype(jnp.bfloat16)
    Jb = J.astype(jnp.bfloat16)
    Jv = jnp.einsum("fsij,fsj->fi", Jb, zg, preferred_element_type=jnp.float32)
    y = jnp.einsum("fsij,fi->fsj", Jb, Jv.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    ys = y.reshape(2 * F, 9)[perm]
    c = jnp.cumsum(ys, axis=0)
    c = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), c], axis=0)
    return c[ends] - c[starts]


def matvec_einsum_only(J, x):
    zg = x[idx]
    Jv = jnp.einsum("fsij,fsj->fi", J, zg)
    y = jnp.einsum("fsij,fi->fsj", J, Jv)
    return y[:NV, 0]          # no reduction at all (lower bound)


def bench(mv, label):
    @jax.jit
    def run(x, n):
        def body(_, x):
            v = mv(J, x)
            return x * 0.9999 + v * 1e-7
        return jax.lax.fori_loop(0, n, body, x)

    _ = jax.device_get(run(x0, 2).ravel()[0])
    t0 = time.perf_counter()
    _ = jax.device_get(run(x0, 8).ravel()[0])
    t8 = time.perf_counter() - t0 - FLOOR
    t0 = time.perf_counter()
    _ = jax.device_get(run(x0, 72).ravel()[0])
    t72 = time.perf_counter() - t0 - FLOOR
    print(f"{label:22s} {(t72 - t8) / 64 * 1e3:7.3f} ms/iter")


bench(matvec_scatter, "scatter")
bench(matvec_segsum, "segsum")
bench(matvec_segsum_bf16, "segsum_bf16")
bench(matvec_einsum_only, "einsum_only(no-red)")
