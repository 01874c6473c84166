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
