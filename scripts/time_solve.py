"""Time solve_incremental at the three bench shapes on the real TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/slide_slam_xla_cache")

import sys; sys.path.insert(0, "."); import importlib; bench = importlib.import_module("bench")
from slide_slam_tpu.config import (SlamConfig, demo_scale_capacity,
                                   mission_capacity)
from slide_slam_tpu.runtime import engine

rng = np.random.default_rng(2)

x = jnp.zeros((4,), jnp.float32)
_ = jax.device_get(x[0])
t0 = time.perf_counter()
for _ in range(5):
    _ = jax.device_get(x[0])
floor = (time.perf_counter() - t0) / 5
print(f"floor {floor*1e3:.1f} ms")

for name, cfg in [
    ("default", SlamConfig(number_of_robots=1)),
    ("mission", SlamConfig(number_of_robots=3, capacity=mission_capacity(150))),
    ("demo_scale", SlamConfig(number_of_robots=1, capacity=demo_scale_capacity())),
]:
    s0 = bench._fill_state(cfg, rng)
    t0 = time.perf_counter()
    s0 = engine.solve_incremental(cfg, s0)
    _ = jax.device_get(s0.pose_count[0])
    tc = time.perf_counter() - t0
    n = 10
    t0 = time.perf_counter()
    st = s0
    for _ in range(n):
        st = engine.solve_incremental(cfg, st)
    _ = jax.device_get(st.pose_count[0])
    dt = (time.perf_counter() - t0 - floor) / n
    print(f"{name:12s} {dt*1e3:7.2f} ms/solve   (compile+first {tc:.1f} s)")
