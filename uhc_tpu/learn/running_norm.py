"""On-device running observation normalization (ZFilter twin).

Reference: uhc/khrylib/utils/zfilter.py — Welford running mean/var with
clipping, updated per observation during sampling and pickled into
checkpoints. Here the statistics are a small pytree updated with *batched*
Welford merges inside the rollout scan (Chan et al. parallel update), so
normalization stays on device and is bitwise deterministic under jit.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RunningStats:
    n: Any      # float64-ish count (f32 scalar)
    mean: Any   # (D,)
    m2: Any     # (D,) sum of squared deviations


def init(dim: int, dtype=jnp.float32) -> RunningStats:
    return RunningStats(n=jnp.zeros((), dtype),
                        mean=jnp.zeros((dim,), dtype),
                        m2=jnp.zeros((dim,), dtype))


def update_batch(rs: RunningStats, x: jnp.ndarray, mask=None) -> RunningStats:
    """Merge a (B, D) batch (optionally row-masked) into the stats."""
    if mask is None:
        bn = jnp.asarray(x.shape[0], x.dtype)
        bmean = jnp.mean(x, axis=0)
        bm2 = jnp.sum((x - bmean) ** 2, axis=0)
    else:
        m = mask.astype(x.dtype)[:, None]
        bn = jnp.maximum(jnp.sum(m), 1e-8)
        bmean = jnp.sum(x * m, axis=0) / bn
        bm2 = jnp.sum(((x - bmean) ** 2) * m, axis=0)
    n = rs.n + bn
    delta = bmean - rs.mean
    mean = rs.mean + delta * bn / n
    m2 = rs.m2 + bm2 + delta**2 * rs.n * bn / n
    return RunningStats(n=n, mean=mean, m2=m2)


def std(rs: RunningStats) -> jnp.ndarray:
    var = jnp.where(rs.n > 1, rs.m2 / jnp.maximum(rs.n - 1, 1.0), rs.mean**2)
    return jnp.sqrt(jnp.maximum(var, 0.0))


def normalize(rs: RunningStats, x: jnp.ndarray, clip: float = 5.0) -> jnp.ndarray:
    """(x - mean)/(std + 1e-8), clipped (ZFilter.__call__ with the clip=5
    used by AgentCopycat)."""
    y = (x - rs.mean) / (std(rs) + 1e-8)
    return jnp.clip(y, -clip, clip)
