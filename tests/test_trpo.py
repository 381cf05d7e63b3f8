"""TRPO update test (agent_trpo.py twin)."""
import numpy as np

import jax
import jax.numpy as jnp

from uhc_tpu.learn import nets
from uhc_tpu.learn.trpo import conjugate_gradients, make_trpo_update


def test_conjugate_gradients_solves_spd():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(8, 8))
    A = jnp.asarray(A @ A.T + 8 * np.eye(8), jnp.float32)
    b = jnp.asarray(rng.normal(size=8), jnp.float32)
    x = conjugate_gradients(lambda v: A @ v, b, nsteps=30)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-3)


def test_trpo_update_improves_surrogate():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    S, A_DIM = 12, 4
    pp = nets.policy_gaussian_init(k1, S, A_DIM, (16, 16), -1.0)
    log_std = pp.pop("log_std")
    vp = nets.value_init(k2, S, (16, 16))
    mean_fn = lambda p, x: nets.policy_gaussian_mean(p, x, "tanh")
    value_fn = lambda p, x: nets.value_apply(p, x, "tanh")

    N = 256
    s = jax.random.normal(k3, (N, S))
    a = mean_fn(pp, s) + 0.3 * jax.random.normal(k2, (N, A_DIM))
    batch = {"states": s, "actions": a,
             "advantages": jax.random.normal(k1, (N,)),
             "returns": jax.random.normal(k2, (N,)),
             "exps": jnp.ones((N,))}
    update = make_trpo_update(mean_fn, value_fn)
    pp2, vp2, stats = jax.jit(update)(pp, vp, log_std, batch)
    assert bool(stats["trpo_accepted"])
    assert np.isfinite(float(stats["surr_loss"]))
    # accepted step => surrogate strictly improved at the chosen point
    changed = jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))),
                           pp, pp2)
    assert max(jax.tree.leaves(changed)) > 0
