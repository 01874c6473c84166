"""SoA (factor-last) matvec layouts vs AoS, honest fori_loop timing."""
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
Jt = jnp.transpose(J, (1, 2, 3, 0))          # [2, 9, 9, F]
Jtb = Jt.astype(jnp.bfloat16)
flat = idx.reshape(-1)
perm = jnp.argsort(flat)
sidx = flat[perm]
starts = jnp.searchsorted(sidx, jnp.arange(NV, dtype=jnp.int32)).astype(jnp.int32)
ends = jnp.searchsorted(sidx, jnp.arange(NV, dtype=jnp.int32),
                        side="right").astype(jnp.int32)
idx_t = idx.T                                 # [2, F]
x0 = jnp.asarray(rng.standard_normal((NV, 9)), jnp.float32)

xh = jnp.zeros((4,), jnp.float32)
_ = jax.device_get(xh[0])
t0 = time.perf_counter()
for _ in range(5):
    _ = jax.device_get(xh[0])
FLOOR = (time.perf_counter() - t0) / 5
print(f"floor {FLOOR*1e3:.1f} ms")


def mv_soa(x):
    xg = x[idx_t]                              # [2, F, 9]
    xgt = jnp.transpose(xg, (0, 2, 1))         # [2, 9, F]
    Jv = jnp.einsum("sijf,sjf->if", Jt, xgt)   # [9, F]
    y = jnp.einsum("sijf,if->sjf", Jt, Jv)     # [2, 9, F]
    ys = jnp.transpose(y, (0, 2, 1)).reshape(2 * F, 9)
    c = jnp.cumsum(ys[perm], axis=0)
    c = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), c], axis=0)
    return c[ends] - c[starts]


def mv_soa_bf16(x):
    xg = x[idx_t].astype(jnp.bfloat16)
    xgt = jnp.transpose(xg, (0, 2, 1))
    Jv = jnp.einsum("sijf,sjf->if", Jtb, xgt,
                    preferred_element_type=jnp.float32)
    y = jnp.einsum("sijf,if->sjf", Jtb, Jv.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    ys = jnp.transpose(y, (0, 2, 1)).reshape(2 * F, 9)
    c = jnp.cumsum(ys[perm], axis=0)
    c = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), c], axis=0)
    return c[ends] - c[starts]


def mv_aos(x):
    zg = x[idx]
    Jv = jnp.einsum("fsij,fsj->fi", J, zg)
    y = jnp.einsum("fsij,fi->fsj", J, Jv)
    ys = y.reshape(2 * F, 9)[perm]
    c = jnp.cumsum(ys, axis=0)
    c = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), c], axis=0)
    return c[ends] - c[starts]


def bench(mv, label):
    @jax.jit
    def run(x, n):
        def body(_, x):
            return x * 0.9999 + mv(x) * 1e-7
        return jax.lax.fori_loop(0, n, body, x)

    _ = jax.device_get(run(x0, 2).ravel()[0])
    t0 = time.perf_counter()
    _ = jax.device_get(run(x0, 8).ravel()[0])
    t8 = time.perf_counter() - t0 - FLOOR
    t0 = time.perf_counter()
    _ = jax.device_get(run(x0, 72).ravel()[0])
    t72 = time.perf_counter() - t0 - FLOOR
    print(f"{label:16s} {(t72 - t8) / 64 * 1e3:7.3f} ms/iter")


bench(mv_aos, "aos_f32")
bench(mv_soa, "soa_f32")
bench(mv_soa_bf16, "soa_bf16")

ref = np.asarray(mv_aos(x0), np.float64)
for n, f in [("soa", mv_soa), ("soa_bf16", mv_soa_bf16)]:
    got = np.asarray(f(x0), np.float64)
    rel = (np.abs(got - ref) / np.maximum(np.abs(ref), 1e-3)).max()
    print(f"{n} maxrel vs aos {rel:.2e}")
