"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; unit tests validate numerics and
multi-chip sharding on the host platform (SURVEY.md §7 test strategy).
"""
import os

# NOTE: this environment's jax build IGNORES the JAX_PLATFORMS env var (the
# axon TPU plugin wins regardless); only jax.config.update("jax_platforms")
# or JAX_PLATFORM_NAME actually select the backend.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
