"""Profile one mission-shape solve_incremental; print top device ops."""
import sys, os; sys.path.insert(0, os.getcwd())
import glob
import gzip
import json
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/slide_slam_xla_cache")
import importlib
bench = importlib.import_module("bench")
from slide_slam_tpu.config import SlamConfig, mission_capacity
from slide_slam_tpu.runtime import engine

rng = np.random.default_rng(2)
cfg = SlamConfig(number_of_robots=3, capacity=mission_capacity(150))
s0 = bench._fill_state(cfg, rng)
s0 = engine.solve_incremental(cfg, s0)
_ = jax.device_get(s0.pose_count[0])

tdir = "/tmp/slide_slam_trace_r4"
os.system(f"rm -rf {tdir}")
n = 5
with jax.profiler.trace(tdir):
    st = s0
    for _ in range(n):
        st = engine.solve_incremental(cfg, st)
    _ = jax.device_get(st.pose_count[0])

paths = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))
tr = json.loads(gzip.open(paths[-1]).read())
by_name = defaultdict(float)
total = 0.0
for e in tr["traceEvents"]:
    if e.get("ph") == "X" and "dur" in e:
        pid_name = e.get("pid")
        name = e.get("name", "")
        # keep XLA op events (device lanes)
        if any(k in name for k in ("fusion", "copy", "while", "sort",
                                   "scatter", "gather", "reduce", "cumsum",
                                   "dot", "convert", "dynamic", "select",
                                   "iota", "broadcast", "transpose", "concatenate")):
            by_name[name] += e["dur"]
            total += e["dur"]
top = sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
print(f"total matched device us over {n} solves: {total:.0f} "
      f"({total/n/1e3:.2f} ms/solve)")
for name, us in top:
    print(f"{us/n/1e3:9.3f} ms/solve  {name[:100]}")
