"""TRPO update — uhc/khrylib/rl/agents/agent_trpo.py twin.

Natural-gradient policy step: conjugate-gradient solve of F·x = -g against
the KL Hessian (Fvp_direct, agent_trpo.py:113 — the FIM variant :91 is the
same operator for a Gaussian head), scaled to the max_kl trust region, then
a backtracking line search; value function fit by damped least squares
(replacing the reference's scipy L-BFGS host round-trip).

TPU design: parameters are flattened once with jax.flatten_util, the
Hessian-vector product is a jvp-of-grad (no graph surgery), CG is a
`lax.while_loop`, and the line search a `lax.scan` over backtrack fractions
— the whole update jits. Unused by the release configs (they use PPO), kept
for API parity with the reference agent registry.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from uhc_tpu.learn.nets import gaussian_log_prob


def conjugate_gradients(avp: Callable, b: jnp.ndarray, nsteps: int = 10,
                        rdotr_tol: float = 1e-10) -> jnp.ndarray:
    """agent_trpo.py:6 — CG on the (damped) curvature operator."""
    def cond(c):
        i, x, r, p, rdotr = c
        return (i < nsteps) & (rdotr > rdotr_tol)

    def body(c):
        i, x, r, p, rdotr = c
        ap = avp(p)
        alpha = rdotr / jnp.dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        new_rdotr = jnp.dot(r, r)
        p = r + (new_rdotr / rdotr) * p
        return i + 1, x, r, p, new_rdotr

    x0 = jnp.zeros_like(b)
    _, x, _, _, _ = jax.lax.while_loop(
        cond, body, (0, x0, b, b, jnp.dot(b, b)))
    return x


def make_trpo_update(policy_mean_fn: Callable, value_fn: Callable,
                     max_kl: float = 1e-2, damping: float = 1e-2,
                     max_backtracks: int = 10, accept_ratio: float = 0.1,
                     value_iters: int = 25, value_lr: float = 1e-2,
                     value_weight_decay: float = 1e-3):
    """Returns update(policy_params, value_params, log_std, batch) ->
    (policy_params', value_params', stats). batch holds states/actions/
    advantages/returns/exps as flat (N, ·) arrays."""
    from jax.flatten_util import ravel_pytree

    def update(policy_params, value_params, log_std, batch):
        s, a = batch["states"], batch["actions"]
        adv, ret, exps = batch["advantages"], batch["returns"], batch["exps"]
        w = exps / jnp.maximum(jnp.sum(exps), 1.0)

        # -- value fit (L-BFGS in the reference; damped GD here) -------------
        def vloss(vp):
            v = value_fn(vp, s)
            reg = sum(jnp.sum(x ** 2) for x in jax.tree.leaves(vp))
            return jnp.mean((v - ret) ** 2) + value_weight_decay * reg

        def vstep(vp, _):
            g = jax.grad(vloss)(vp)
            return jax.tree.map(lambda p, gg: p - value_lr * gg, vp, g), None

        value_params, _ = jax.lax.scan(vstep, value_params, None,
                                       length=value_iters)

        flat0, unravel = ravel_pytree(policy_params)
        fixed_mean = policy_mean_fn(policy_params, s)
        fixed_lp = gaussian_log_prob(fixed_mean, log_std, a)

        def surrogate(flat):
            p = unravel(flat)
            lp = gaussian_log_prob(policy_mean_fn(p, s), log_std, a)
            return jnp.sum(-adv * jnp.exp(lp - fixed_lp) * w)

        # KL(old ‖ new) for a fixed-std Gaussian head: ‖Δμ‖²/(2σ²) mean
        inv_var = jnp.exp(-2.0 * log_std)

        def mean_kl(flat):
            p = unravel(flat)
            mu = policy_mean_fn(p, s)
            return 0.5 * jnp.mean(
                jnp.sum((mu - fixed_mean) ** 2 * inv_var, axis=-1))

        def fvp(v):
            # Hessian-vector product of the KL via jvp of grad
            return jax.jvp(jax.grad(mean_kl), (flat0,), (v,))[1] \
                + damping * v

        loss0, loss_grad = jax.value_and_grad(surrogate)(flat0)
        stepdir = conjugate_gradients(fvp, -loss_grad)
        shs = 0.5 * jnp.dot(stepdir, fvp(stepdir))
        lm = jnp.sqrt(max_kl / jnp.maximum(shs, 1e-12))
        fullstep = stepdir * lm
        expected_improve = -jnp.dot(loss_grad, fullstep)

        # backtracking line search (agent_trpo.py:27): first fraction whose
        # actual/expected improvement beats accept_ratio wins
        fracs = 0.5 ** jnp.arange(max_backtracks)

        def try_frac(best, frac):
            found, x_best = best
            x_new = flat0 + frac * fullstep
            improve = loss0 - surrogate(x_new)
            ok = (improve / jnp.maximum(expected_improve * frac, 1e-12)
                  > accept_ratio) & ~found
            x_best = jnp.where(ok, x_new, x_best)
            return (found | ok, x_best), None

        (success, new_flat), _ = jax.lax.scan(
            try_frac, (jnp.zeros((), bool), flat0), fracs)
        stats = {"surr_loss": loss0, "trpo_accepted": success,
                 "value_loss": vloss(value_params)}
        return unravel(new_flat), value_params, stats

    return update
