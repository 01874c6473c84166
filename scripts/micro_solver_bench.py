"""Microbench: candidate segment-reduction patterns for the PCG matvec.

Run on the real TPU (cwd=/root/repo, no PYTHONPATH):
    timeout 900 python scripts/micro_solver_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/slide_slam_xla_cache")

F = 26624 * 2          # flattened factor sides at mission scale
NV = 1536
NP = 768
NL9 = (512 + 128 + 128) * 9   # 6912


def fetch_floor():
    x = jnp.zeros((4,), jnp.float32)
    _ = jax.device_get(x[0])
    t0 = time.perf_counter()
    for _ in range(5):
        _ = jax.device_get(x[0])
    return (time.perf_counter() - t0) / 5


def timed(fn, arg, n=20):
    out = fn(arg)
    _ = jax.device_get(jnp.sum(out) if isinstance(out, jnp.ndarray) else out[0].sum())
    t0 = time.perf_counter()
    o = arg
    for _ in range(n):
        o = fn(o if o.shape == arg.shape else arg)
    s = jnp.sum(o) if isinstance(o, jnp.ndarray) else o[0].sum()
    _ = jax.device_get(s)
    return (time.perf_counter() - t0 - FLOOR) / n * 1e3


rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, NV, F), jnp.int32)
y = jnp.asarray(rng.standard_normal((F, 9)), jnp.float32)
sidx = jnp.sort(idx)
perm = jnp.argsort(idx)
starts = jnp.searchsorted(sidx, jnp.arange(NV, dtype=jnp.int32))
ends = jnp.searchsorted(sidx, jnp.arange(NV, dtype=jnp.int32), side="right")

FLOOR = fetch_floor()
print(f"fetch floor {FLOOR*1e3:.1f} ms")


@jax.jit
def scatter_add(y):
    return jnp.zeros((NV, 9), jnp.float32).at[idx].add(y)


@jax.jit
def seg_cumsum(y):
    ys = y[perm]
    c = jnp.cumsum(ys, axis=0)
    c = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), c], axis=0)
    return c[ends] - c[starts]


@jax.jit
def seg_cumsum_presorted(y):
    c = jnp.cumsum(y, axis=0)
    c = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), c], axis=0)
    return c[ends] - c[starts]


onehot = jax.jit(lambda: (idx[:, None] == jnp.arange(NV)[None, :]).astype(jnp.bfloat16))()
_ = jax.device_get(onehot[0, 0])


@jax.jit
def seg_onehot(y):
    return jnp.einsum("fv,fj->vj", onehot, y.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


@jax.jit
def sort_only(y):
    return y[perm]


@jax.jit
def argsort_op(y):
    p = jnp.argsort(idx)
    return y[p]


print(f"scatter_add      {timed(scatter_add, y):8.3f} ms")
print(f"seg_cumsum       {timed(seg_cumsum, y):8.3f} ms")
print(f"seg_cumsum_pre   {timed(seg_cumsum_presorted, y):8.3f} ms")
print(f"seg_onehot       {timed(seg_onehot, y):8.3f} ms")
print(f"permute_gather   {timed(sort_only, y):8.3f} ms")
print(f"argsort+gather   {timed(argsort_op, y):8.3f} ms")

# correctness
ref = np.zeros((NV, 9), np.float32)
np.add.at(ref, np.asarray(idx), np.asarray(y))
for name, fn in [("cumsum", seg_cumsum), ("onehot", seg_onehot)]:
    got = np.asarray(jax.device_get(fn(y)), np.float32)
    print(f"{name} max err {np.abs(got - ref).max():.2e}")

# ---- dense Schur building blocks -----------------------------------------
Hpl = jnp.asarray(rng.standard_normal((NP * 6, NL9)), jnp.float32)
Hll = jnp.asarray(rng.standard_normal((NL9 // 9, 9, 9)), jnp.float32)
Hll = jnp.einsum("lij,lkj->lik", Hll, Hll) + 1e-2 * jnp.eye(9)


@jax.jit
def schur_f32(Hpl):
    M = jnp.einsum("pLk,Lkj->pLj", Hpl.reshape(NP * 6, NL9 // 9, 9), jnp.linalg.inv(Hll))
    S = jnp.einsum("pK,qK->pq", M.reshape(NP * 6, NL9), Hpl)
    return jnp.linalg.cholesky(S + 1e3 * jnp.eye(NP * 6))


@jax.jit
def schur_bf16(Hpl):
    Minv = jnp.linalg.inv(Hll)
    M = jnp.einsum("pLk,Lkj->pLj", Hpl.reshape(NP * 6, NL9 // 9, 9), Minv)
    S = jnp.einsum("pK,qK->pq", M.reshape(NP * 6, NL9).astype(jnp.bfloat16),
                   Hpl.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.linalg.cholesky(S + 1e3 * jnp.eye(NP * 6))


@jax.jit
def batched_inv(_):
    return jnp.linalg.inv(Hll)


@jax.jit
def batched_chol_solve(_):
    c = jax.scipy.linalg.cho_factor(Hll)
    z = jnp.ones((NL9 // 9, 9), jnp.float32)
    return jax.scipy.linalg.cho_solve(c, z)


def timed2(fn, arg, n=10, label=""):
    t0 = time.perf_counter()
    out = fn(arg)
    _ = jax.device_get(out.ravel()[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(arg)
    _ = jax.device_get(out.ravel()[0])
    dt = (time.perf_counter() - t0 - FLOOR) / n * 1e3
    print(f"{label:20s} {dt:8.3f} ms   (first call incl compile {tc:.1f} s)")


timed2(batched_inv, y, label="batched_inv_768x9x9")
timed2(batched_chol_solve, y, label="batched_chosolve")
timed2(schur_f32, Hpl, label="dense_schur_f32")
timed2(schur_bf16, Hpl, label="dense_schur_bf16")

# pure dense cholesky at reduced size
Sd = jnp.einsum("ij,kj->ik", Hpl[:, : NP * 6], Hpl[:, : NP * 6]) + 1e2 * jnp.eye(NP * 6)
timed2(jax.jit(jnp.linalg.cholesky), Sd, label="chol_4608")


@jax.jit
def tri_solve(Sd):
    L = jnp.linalg.cholesky(Sd)
    b = jnp.ones((NP * 6,), jnp.float32)
    z = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, z, lower=False)


timed2(tri_solve, Sd, label="chol+2trisolve_4608")


# ---- precision/speed follow-ups ------------------------------------------
# realistic magnitudes: mostly O(1..100) rows with a few 1e6 rows (closure
# weight^2 products), the round-3 failure mode
y_real = np.abs(rng.standard_normal((F, 9))) * 50
hot = rng.integers(0, F, 64)
y_real[hot] *= 2e4
y_real = jnp.asarray(y_real, jnp.float32)

ref64 = np.zeros((NV, 9), np.float64)
np.add.at(ref64, np.asarray(idx), np.asarray(y_real, np.float64))


@jax.jit
def seg_cumsum64(y):
    ys = y[perm].astype(jnp.float64)
    c = jnp.cumsum(ys, axis=0)
    c = jnp.concatenate([jnp.zeros((1, 9), c.dtype), c], axis=0)
    return (c[ends] - c[starts]).astype(jnp.float32)


@jax.jit
def sorted_scatter(y):
    ys = y[perm]
    si = jnp.sort(idx)
    return jnp.zeros((NV, 9), jnp.float32).at[si].add(
        ys, indices_are_sorted=True, unique_indices=False)


for name, fn in [("cumsum_f32", seg_cumsum), ("cumsum_f64", seg_cumsum64),
                 ("scatter", scatter_add), ("sorted_scatter", sorted_scatter)]:
    got = np.asarray(jax.device_get(fn(y_real)), np.float64)
    err = np.abs(got - ref64)
    rel = err / np.maximum(np.abs(ref64), 1.0)
    print(f"{name:16s} maxabs {err.max():10.4f}  maxrel {rel.max():.2e}  "
          f"time {timed(fn, y_real):7.3f} ms")
