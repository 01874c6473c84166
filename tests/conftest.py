"""Test harness config: force a virtual 8-device CPU mesh.

The image's sitecustomize registers the TPU tunnel backend and pins
jax_platforms to it; unit tests must run on local CPU (fast, hermetic), so we
override the config *before any backend is initialized*. Real-TPU
benchmarking happens in bench.py, which keeps the default platform.
"""
import os

# The axon image routes XLA compiles to a REMOTE host
# (PALLAS_AXON_REMOTE_COMPILE=1). For the TPU that is required; for the
# XLA:CPU executables the unit tests use it produces binaries tuned for the
# remote machine's CPU features ("Loading XLA:CPU AOT result ... could lead
# to execution errors such as SIGILL") — observed r4 as nondeterministic
# segfaults inside backend_compile_and_load. Force LOCAL CPU compiles.
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: OPT-IN only (SLIDE_SLAM_TEST_CACHE=1).
# XLA:CPU AOT executables are machine-specific; a cache populated on one
# host loads on another with "could lead to execution errors such as
# SIGILL" and has been observed (r4 judge run) to segfault the suite both
# when loading stale entries and inside put_executable_and_time when
# writing new ones. A fresh checkout must complete the suite anywhere, so
# the default is no persistent cache; developers who want warm re-runs on
# a single machine can opt in, and the cache dir is keyed by the host name
# so entries never migrate between machines (the dir is gitignored).
if os.environ.get("SLIDE_SLAM_TEST_CACHE"):
    import platform
    cache_dir = os.path.join(
        os.path.dirname(__file__), ".jax_cache",
        f"{platform.node()}-{platform.machine()}")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
