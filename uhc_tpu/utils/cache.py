"""Persistent XLA compilation cache for all CLI entry points.

Large jitted programs (the fused Pallas control-step kernel, the full
training epoch, the batched eval scan) cost minutes of remote compile the
first time; the on-disk cache makes every later process start instantly.
"""
from __future__ import annotations

import os

import jax


def enable_compilation_cache(path: str | None = None) -> str:
    # UHC_TPU_CPU=1: force the host backend. This jax build IGNORES the
    # JAX_PLATFORMS env var (the axon TPU plugin registers regardless);
    # only jax.config.update("jax_platforms") works — same note as
    # tests/conftest.py:8. Every CLI calls enable_compilation_cache()
    # before touching jax, so this is the one switch CPU queue legs need
    # to actually stay off the chip.
    if os.environ.get("UHC_TPU_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    path = path or os.environ.get(
        "UHC_TPU_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache_tpu"))
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
