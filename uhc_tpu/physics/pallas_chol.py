"""Fused batched SPD factor+solve as a single Pallas TPU kernel.

The stable-PD and forward-dynamics solves need, per humanoid per 450 Hz
substep, a Cholesky factorization of a (75..80)² SPD matrix plus one
triangular solve pair. Expressed in XLA ops (even blocked, see linalg.py)
that is ~200 small sequential kernels per substep — launch/latency bound.

Here the whole factor+solve runs inside ONE Pallas kernel per batch tile:
the matrix tile lives in VMEM, the right-looking factorization's rank-1
updates and both substitution sweeps are VPU work on (TILE, N, N) blocks,
and HBM sees exactly one read of A/b and one write of x.

API: `chol_solve(A, b)` — A (G, n, n) SPD (n ≤ 128), b (G, n) -> x (G, n).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 80        # padded matrix size (matches linalg.py padding)
TILE = 32     # matrices per kernel program


def _kernel(a_ref, b_ref, x_ref, As, bs):
    """Factor A = UᵀU (U upper) then solve — row access only (dynamic
    indexing stays on the sublane dim; lane-dim selects use iota masks)."""
    As[:] = a_ref[:]
    bs[:] = b_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)   # (1, N) lane ids

    def fact_step(j, _):
        row = As[:, j, :]                                   # (TILE, N)
        ujj = jnp.sum(jnp.where(iota == j, row, 0.0), axis=1)
        inv_d = jax.lax.rsqrt(jnp.maximum(ujj, 1e-12))
        u = jnp.where(iota >= j, row, 0.0) * inv_d[:, None]  # U[j, :]
        As[:, j, :] = u
        # trailing update: A[i, k] -= u[i]·u[k] for rows i > j
        ui = jnp.where(iota > j, u, 0.0)                     # zero rows ≤ j
        As[:] = As[:] - ui[:, :, None] * u[:, None, :]
        return 0

    jax.lax.fori_loop(0, N, fact_step, 0)

    # forward solve Uᵀ y = b (saxpy form, row access)
    def fwd_step(j, _):
        row = As[:, j, :]
        ujj = jnp.sum(jnp.where(iota == j, row, 0.0), axis=1)
        bj = jnp.sum(jnp.where(iota == j, bs[:], 0.0), axis=1)
        yj = bj / ujj
        upd = jnp.where(iota > j, row, 0.0) * yj[:, None]
        bs[:] = jnp.where(iota == j, yj[:, None], bs[:] - upd)
        return 0

    jax.lax.fori_loop(0, N, fwd_step, 0)

    # backward solve U x = y
    x_ref[:] = jnp.zeros_like(bs)

    def bwd_step(jj, _):
        j = N - 1 - jj
        row = As[:, j, :]
        ujj = jnp.sum(jnp.where(iota == j, row, 0.0), axis=1)
        yj = jnp.sum(jnp.where(iota == j, bs[:], 0.0), axis=1)
        s = jnp.sum(jnp.where(iota > j, row, 0.0) * x_ref[:], axis=1)
        xj = (yj - s) / ujj
        x_ref[:] = jnp.where(iota == j, xj[:, None], x_ref[:])
        return 0

    jax.lax.fori_loop(0, N, bwd_step, 0)


@functools.partial(jax.jit, static_argnames=())
def chol_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD A x = b, batched. A (G, n, n), b (G, n); n ≤ N."""
    G, n = b.shape
    if n < N:
        A = jnp.pad(A, ((0, 0), (0, N - n), (0, N - n)))
        tail = jnp.zeros((N,), A.dtype).at[n:].set(1.0)
        A = A + jnp.diag(tail)[None]
        b = jnp.pad(b, ((0, 0), (0, N - n)))
    pad_g = (-G) % TILE
    if pad_g:
        A = jnp.concatenate([A, jnp.tile(jnp.eye(N, dtype=A.dtype)[None],
                                         (pad_g, 1, 1))], 0)
        b = jnp.pad(b, ((0, pad_g), (0, 0)))
    Gp = A.shape[0]

    x = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Gp, N), A.dtype),
        grid=(Gp // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE, N, N), jnp.float32),
            pltpu.VMEM((TILE, N), jnp.float32),
        ],
    )(A, b)
    return x[:G, :n]
