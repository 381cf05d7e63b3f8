"""Persistent XLA compilation cache for all CLI entry points.

Large jitted programs (the fused Pallas control-step kernel, the full
training epoch, the batched eval scan) cost minutes of remote compile the
first time; the on-disk cache makes every later process start instantly.
"""
from __future__ import annotations

import os

import jax


def enable_compilation_cache(path: str | None = None) -> str:
    path = path or os.environ.get(
        "UHC_TPU_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache_tpu"))
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
