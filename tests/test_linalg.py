"""Blocked batched Cholesky vs numpy reference."""
import numpy as np

import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.physics import linalg as LA


def rand_spd(rng, b, n):
    X = rng.normal(size=(b, n, n)).astype(np.float32)
    A = X @ X.transpose(0, 2, 1) + 3 * np.eye(n, dtype=np.float32)
    return A


def test_blocked_cholesky_solve():
    rng = np.random.default_rng(0)
    for n in (75, 80, 16, 33):
        A = rand_spd(rng, 4, n)
        b = rng.normal(size=(4, n)).astype(np.float32)
        x = jax.jit(LA.spd_solve)(jnp.asarray(A), jnp.asarray(b))
        want = np.linalg.solve(A.astype(np.float64),
                               b.astype(np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), want, rtol=2e-2, atol=6e-3)


@pytest.mark.slow
def test_blocked_cholesky_matrix_rhs():
    rng = np.random.default_rng(1)
    A = rand_spd(rng, 2, 75)
    B = rng.normal(size=(2, 75, 3)).astype(np.float32)
    LL = LA.blocked_cholesky(jnp.asarray(A))
    X = LA.blocked_cho_solve(LL, jnp.asarray(B))
    want = np.linalg.solve(A.astype(np.float64), B.astype(np.float64))
    np.testing.assert_allclose(np.asarray(X), want, rtol=2e-2, atol=6e-3)


@pytest.mark.slow
def test_blocked_cholesky_factor_matches():
    rng = np.random.default_rng(2)
    A = rand_spd(rng, 3, 80)
    L, Linv = LA.blocked_cholesky(jnp.asarray(A))
    # reassemble the full dense L from the block layout
    Lb = np.asarray(L)  # (3, nb, nb, BS, BS)
    nb = Lb.shape[1]
    full = Lb.transpose(0, 1, 3, 2, 4).reshape(3, nb * 16, nb * 16)
    want = np.linalg.cholesky(A.astype(np.float64))
    np.testing.assert_allclose(full, want, rtol=2e-3, atol=2e-3)
    # Linv blocks are the inverses of the diagonal blocks
    for k in range(nb):
        blk = full[:, k * 16:(k + 1) * 16, k * 16:(k + 1) * 16]
        np.testing.assert_allclose(
            np.asarray(Linv)[:, k] @ blk, np.tile(np.eye(16), (3, 1, 1)),
            atol=2e-3)
