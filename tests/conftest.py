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
# Persistent compilation cache: the suite's wall time is dominated by
# repeated XLA compiles of the solver/engine at each test's capacity preset;
# caching compiled executables on disk makes re-runs start warm.
# EXCEPT under the axon image's remote-compile mode: XLA:CPU executables
# then compile on a remote host whose CPU features differ from this
# machine, and loading/serializing the mismatched AOT results SIGILLs/
# segfaults (observed r4: crash in compilation_cache.put_executable).
if not os.environ.get("PALLAS_AXON_REMOTE_COMPILE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
