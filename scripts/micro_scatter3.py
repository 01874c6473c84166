"""Reduction microbench with TRUE data dependencies between iterations:
each call's input derives from the previous call's output, so the tunnel
cannot dedupe/pipeline-skip anything."""
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

y0 = np.abs(rng.standard_normal((F, 9))).astype(np.float32) * 50
y0[rng.integers(0, F, 64)] *= 2e4
y0 = jnp.asarray(y0)

x0 = jnp.zeros((4,), jnp.float32)
_ = jax.device_get(x0[0])
t0 = time.perf_counter()
for _ in range(5):
    _ = jax.device_get(x0[0])
FLOOR = (time.perf_counter() - t0) / 5
print(f"floor {FLOOR*1e3:.1f} ms")

onehot_bf = (idx[:, None] == jnp.arange(NV)[None, :]).astype(jnp.bfloat16)
onehot_f32 = onehot_bf.astype(jnp.float32)


def make_loop(reduce_fn):
    """y -> reduce -> broadcast back to y' (data-dependent chain), n times
    inside ONE jit via fori_loop, so per-iteration cost is honest."""
    @jax.jit
    def run(y, n):
        def body(_, y):
            v = reduce_fn(y)                # [NV, 9]
            return y * 0.999 + v[idx] * 1e-6
        return jax.lax.fori_loop(0, n, body, y)
    return run


VARIANTS = {
    "scatter": lambda y: jnp.zeros((NV, 9), jnp.float32).at[idx].add(y),
    "cumsum": lambda y: (lambda c: c[ends] - c[starts])(
        jnp.concatenate([jnp.zeros((1, 9), jnp.float32),
                         jnp.cumsum(y[perm], axis=0)], axis=0)),
    "onehot_bf16": lambda y: jnp.einsum(
        "fv,fj->vj", onehot_bf, y.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32),
    "onehot_f32": lambda y: jnp.einsum("fv,fj->vj", onehot_f32, y),
    "onehot_mixed": lambda y: jnp.einsum(
        "fv,fj->vj", onehot_bf.astype(jnp.float32), y),
}

ref = np.zeros((NV, 9), np.float64)
np.add.at(ref, np.asarray(idx), np.asarray(y0, np.float64))

for name, red in VARIANTS.items():
    run = make_loop(red)
    _ = jax.device_get(run(y0, 2).ravel()[0])       # compile
    for n in (8, 40):
        t0 = time.perf_counter()
        out = run(y0, n)
        _ = jax.device_get(out.ravel()[0])
        dt = time.perf_counter() - t0 - FLOOR
        if n == 8:
            t8 = dt
        else:
            per = (dt - t8) / 32 * 1e3
    got = np.asarray(jax.device_get(red(y0)), np.float64)
    rel = (np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)).max()
    print(f"{name:14s} {per:7.3f} ms/iter   maxrel {rel:.2e}")
