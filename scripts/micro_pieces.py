"""Decompose in-loop matvec cost piece by piece (fori_loop, data deps)."""
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


def p_gather(x):
    zg = x[idx]                                     # [F,2,9]
    return jnp.sum(zg, axis=(0, 1))[None, :] + x[:NV]


def p_einsum1(x):
    zg = x[idx]
    Jv = jnp.einsum("fsij,fsj->fi", J, zg)          # [F,9]
    return jnp.sum(Jv, axis=0)[None, :] + x[:NV]


def p_einsum2(x):
    zg = x[idx]
    Jv = jnp.einsum("fsij,fsj->fi", J, zg)
    y = jnp.einsum("fsij,fi->fsj", J, Jv)           # [F,2,9]
    return jnp.sum(y, axis=(0, 1))[None, :] + x[:NV]


def p_permute(x):
    zg = x[idx]
    Jv = jnp.einsum("fsij,fsj->fi", J, zg)
    y = jnp.einsum("fsij,fi->fsj", J, Jv)
    ys = y.reshape(2 * F, 9)[perm]
    return jnp.sum(ys, axis=0)[None, :] + x[:NV]


def p_full(x):
    zg = x[idx]
    Jv = jnp.einsum("fsij,fsj->fi", J, zg)
    y = jnp.einsum("fsij,fi->fsj", J, Jv)
    ys = y.reshape(2 * F, 9)[perm]
    c = jnp.cumsum(ys, axis=0)
    c = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), c], axis=0)
    return c[ends] - c[starts]


def p_jread(x):
    # pure J stream: how fast can we even READ J once per iter?
    s = jnp.einsum("fsij->j", J)
    return s[None, :] + x[:NV] * 0.999


def bench(fn, label):
    @jax.jit
    def run(x, n):
        def body(_, x):
            return x * 0.9999 + fn(x) * 1e-7
        return jax.lax.fori_loop(0, n, body, x)

    _ = jax.device_get(run(x0, 2).ravel()[0])
    t0 = time.perf_counter()
    _ = jax.device_get(run(x0, 8).ravel()[0])
    t8 = time.perf_counter() - t0 - FLOOR
    t0 = time.perf_counter()
    _ = jax.device_get(run(x0, 72).ravel()[0])
    t72 = time.perf_counter() - t0 - FLOOR
    print(f"{label:12s} {(t72 - t8) / 64 * 1e3:7.3f} ms/iter")


bench(p_jread, "jread")
bench(p_gather, "gather")
bench(p_einsum1, "einsum1")
bench(p_einsum2, "einsum2")
bench(p_permute, "permute")
bench(p_full, "full")
