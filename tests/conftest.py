"""Test harness config: force a virtual 8-device CPU mesh.

The image's sitecustomize registers the TPU tunnel backend and pins
jax_platforms to it; unit tests must run on local CPU (fast, hermetic), so we
override the config *before any backend is initialized*. Real-TPU
benchmarking happens in bench.py, which keeps the default platform.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite's wall time is dominated by
# repeated XLA compiles of the solver/engine at each test's capacity preset;
# caching compiled executables on disk makes re-runs start warm.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
