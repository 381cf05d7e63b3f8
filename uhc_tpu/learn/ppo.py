"""PPO update — clipped surrogate + value regression, fully jitted.

Reference semantics (uhc/khrylib/rl/agents/agent_ppo.py:16 update_policy):
  * fixed log-probs snapshotted before optimization,
  * `num_optim_epoch` passes with a fresh shuffle each pass,
  * minibatches of `mini_batch_size` (remainder dropped, agent_ppo.py:31),
  * the policy loss only sees rows with exps=1 (stochastic actions),
  * value net fit by MSE on returns each minibatch (agent_pg.py:18),
  * separate Adam optimizers / learning rates for policy and value.

The whole update is one jitted `lax.scan` over (epoch × minibatch); under a
device mesh the batch arrives sharded and gradients are averaged by XLA's
collectives automatically.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from uhc_tpu.learn.nets import gaussian_log_prob


class PPOState(NamedTuple):
    policy_params: any
    value_params: any
    policy_opt: any
    value_opt: any
    # optimizer state for the trainable log_std (fix_std=False); None when
    # the std is fixed/scheduled
    log_std_opt: any = None


def make_ppo_update(policy_mean_fn: Callable, value_fn: Callable,
                    policy_optimizer, value_optimizer,
                    clip_epsilon: float, num_epochs: int,
                    minibatch_size: int, fix_std: bool = True,
                    policy_grad_clip: float | None = 40.0,
                    log_std_optimizer=None):
    """Returns update(ppo_state, log_std, batch_dict, rng) ->
    (ppo_state', log_std', stats)."""
    if not fix_std and log_std_optimizer is None:
        raise ValueError("fix_std=False requires a log_std_optimizer "
                         "(the exploration std is a trainable parameter)")

    def policy_loss(policy_params, log_std, s, a, adv, flp, exps):
        mean = policy_mean_fn(policy_params, s)
        lp = gaussian_log_prob(mean, log_std, a)
        ratio = jnp.exp(lp - flp)
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - clip_epsilon, 1.0 + clip_epsilon) * adv
        # mean over exps rows only (agent_ppo.py:44 ind = exps.nonzero())
        w = exps
        return -jnp.sum(jnp.minimum(surr1, surr2) * w) / jnp.maximum(jnp.sum(w), 1.0)

    def value_loss(value_params, s, ret):
        v = value_fn(value_params, s)
        return jnp.mean((v - ret) ** 2)

    def update(ppo: PPOState, log_std, batch, rng):
        s, a = batch["states"], batch["actions"]
        adv, ret, exps = batch["advantages"], batch["returns"], batch["exps"]
        N = s.shape[0]
        n_mb = max(N // minibatch_size, 1)
        mb = minibatch_size if N >= minibatch_size else N

        flp = gaussian_log_prob(policy_mean_fn(ppo.policy_params, s), log_std, a)

        def epoch_body(carry, key):
            ppo, log_std = carry
            perm = jax.random.permutation(key, N)

            def mb_body(carry, i):
                ppo, log_std = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                sb, ab = s[idx], a[idx]
                advb, retb, flpb, expb = adv[idx], ret[idx], flp[idx], exps[idx]
                # value step first (agent_ppo.py:37-38 order)
                vg = jax.grad(value_loss)(ppo.value_params, sb, retb)
                vup, vopt = value_optimizer.update(vg, ppo.value_opt, ppo.value_params)
                vparams = optax.apply_updates(ppo.value_params, vup)
                if fix_std:
                    pg = jax.grad(policy_loss)(ppo.policy_params, log_std,
                                               sb, ab, advb, flpb, expb)
                    new_log_std, lsopt = log_std, ppo.log_std_opt
                else:
                    # action_log_std is a trainable policy parameter in the
                    # reference (khrylib/rl/core/policy_gaussian.py:8); the
                    # grad-norm clip covers policy params AND log_std jointly
                    # (torch clip_grad_norm_ over policy_net.parameters()).
                    pg, lg = jax.grad(policy_loss, argnums=(0, 1))(
                        ppo.policy_params, log_std, sb, ab, advb, flpb, expb)
                    if policy_grad_clip is not None:
                        gnorm = optax.global_norm((pg, lg))
                        scale = jnp.minimum(
                            1.0, policy_grad_clip / (gnorm + 1e-8))
                        pg = jax.tree.map(lambda g: g * scale, pg)
                        lg = lg * scale
                    lup, lsopt = log_std_optimizer.update(
                        lg, ppo.log_std_opt, log_std)
                    new_log_std = optax.apply_updates(log_std, lup)
                if fix_std and policy_grad_clip is not None:
                    gnorm = optax.global_norm(pg)
                    scale = jnp.minimum(1.0, policy_grad_clip / (gnorm + 1e-8))
                    pg = jax.tree.map(lambda g: g * scale, pg)
                pup, popt = policy_optimizer.update(pg, ppo.policy_opt, ppo.policy_params)
                pparams = optax.apply_updates(ppo.policy_params, pup)
                return (PPOState(pparams, vparams, popt, vopt, lsopt),
                        new_log_std), None

            (ppo, log_std), _ = jax.lax.scan(
                mb_body, (ppo, log_std), jnp.arange(n_mb))
            return (ppo, log_std), None

        keys = jax.random.split(rng, num_epochs)
        (ppo, log_std), _ = jax.lax.scan(epoch_body, (ppo, log_std), keys)

        stats = {
            "value_loss": value_loss(ppo.value_params, s, ret),
            "policy_loss": policy_loss(ppo.policy_params, log_std, s, a, adv,
                                       flp, exps),
        }
        return ppo, log_std, stats

    return update
