"""On-device batched rollout.

Replaces the reference's 30-40 fork()ed CPU samplers pushing pickled
transitions through multiprocessing.Queue (uhc/khrylib/rl/agents/agent.py:107
sample / agent_copycat.py:496 sample_worker) with a single
`lax.scan(vmap(env_step))`: B humanoids advance lock-step for T control
steps; episodes auto-reset in place (fresh expert sequence drawn from a
device-resident categorical over the motion library — the hard-example
mining distribution is just that categorical's logits).

Per-step policy-noise semantics match agent.py:59-61: with prob
(1 - noise_rate) a step uses the mean action and is excluded from the policy
gradient via exps=0.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from uhc_tpu.config.config import EnvConfig
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.learn import running_norm as RN
from uhc_tpu.physics.model import Model, Topology


class TrajBatch(NamedTuple):
    """(T, B, ...) stacked transitions — TrajBatch twin
    (khrylib/rl/core/trajbatch.py:4)."""
    states: Any      # normalized observations fed to the policy
    actions: Any
    rewards: Any     # reward stored for GAE (includes the end_reward bonus)
    c_rewards: Any   # raw custom reward (LoggerRL avg_c_reward semantics)
    masks: Any       # 1 - done
    exps: Any        # 1 if stochastic action (policy-gradient rows)
    reward_terms: Any
    dones: Any
    percents: Any    # episode progress at termination (freq_dict telemetry)
    seq_idx: Any
    fails: Any
    start_inds: Any  # episode window start (freq_dict [percent, fr_start])


def make_rollout_fn(
    topo: Topology,
    cfg: EnvConfig,
    policy_mean_fn: Callable,
    horizon: int,
    clip_obs: float = 5.0,
    use_fast_solver: bool = True,
    fused_model: Model = None,
):
    """Build rollout(model, expert_lib, aux, params, log_std, rs, env_state,
    rng, noise_rate, rfc_rate, seq_logits) -> (env_state', rs', TrajBatch,
    last_obs_norm).

    Pass `fused_model` (the static Model the rollout will simulate) to run
    the physics through the fused Pallas control-step kernel when the config
    allows it (humanoid_im.fused_compatible); incompatible configs and
    per-sequence (batched) model libraries fall back to the XLA solver."""
    env_step_batched = H.make_env_step_batched(topo, cfg, use_fast_solver,
                                               fused_model=fused_model)

    def reset_like(model, expert_lib, aux, state: H.EnvState, rng, seq_logits,
                   fail_pool=None, precision_freq=0.0):
        rng, k1, k2 = jax.random.split(rng, 3)
        seq_idx = jax.random.categorical(k1, seq_logits)
        start_ind = None
        if fail_pool is not None:
            # precision_mode (dataset_amass_single.py:222-230, enabled by
            # fit_uhc.py:111): with prob precision_freq restart near a
            # previously FAILED window start — fr_start ~ U[max(c-20-t_min,
            # 0), min(c+20, len-t_min)) around a recorded failure start c.
            # fail_pool is (S, P) int32 with -1 padding for empty pools.
            rng, k3, k4, k5, k6 = jax.random.split(rng, 5)
            P = fail_pool.shape[1]
            cand = fail_pool[seq_idx, jax.random.randint(k3, (), 0, P)]
            length = expert_lib["len"][seq_idx]
            hi = jnp.maximum(length - cfg.t_min, 1)
            lo_p = jnp.maximum(cand - 20 - cfg.t_min, 0)
            hi_p = jnp.clip(cand + 20, lo_p + 1, hi)
            prec = jax.random.randint(k4, (), lo_p, hi_p)
            uni = jax.random.randint(k5, (), 0, hi)
            use_prec = jax.random.bernoulli(k6, precision_freq) & (cand >= 0)
            start_ind = jnp.where(use_prec, prec, uni)
        return H.env_reset(topo, model, cfg, k2, seq_idx, expert_lib,
                           aux["neutral_qpos"], aux["neutral_qvel"],
                           start_ind=start_ind, train=True)

    def rollout(model, expert_lib, aux, params, log_std, rs, env_state, rng,
                noise_rate, rfc_rate, seq_logits, end_reward=0.0,
                fail_pool=None, precision_freq=0.0):
        jpos_diffw = aux["jpos_diffw"]
        body_diffw = aux["body_diffw"]

        def step(carry, _):
            state, rs, rng = carry
            B = state.qpos.shape[0]
            rng, k_reset, k_noise, k_act = jax.random.split(rng, 4)
            # auto-reset finished episodes with a freshly sampled sequence
            reset_keys = jax.random.split(k_reset, B)
            new_states = jax.vmap(
                lambda k: reset_like(model, expert_lib, aux,
                                     None, k, seq_logits,
                                     fail_pool, precision_freq))(reset_keys)
            state = jax.tree.map(
                lambda n, o: jnp.where(
                    jnp.reshape(state.done, (B,) + (1,) * (o.ndim - 1)), n, o),
                new_states, state)

            obs = H.get_obs_batched(topo, model, cfg, state, expert_lib)
            rs = RN.update_batch(rs, obs)
            nobs = RN.normalize(rs, obs, clip_obs)

            mean = policy_mean_fn(params, nobs)
            noise = jnp.exp(log_std) * jax.random.normal(k_act, mean.shape, mean.dtype)
            use_mean = jax.random.bernoulli(k_noise, 1.0 - noise_rate, (B,))
            action = jnp.where(use_mean[:, None], mean, mean + noise)
            exps = 1.0 - use_mean.astype(mean.dtype)

            state2, _, reward, terms, done = env_step_batched(
                model, state, action, expert_lib, jpos_diffw, body_diffw,
                rfc_rate, train=True)
            # end_reward bonus at episode ends (agent.py:75-76: reward +=
            # env.end_reward when info end; env.end_reward =
            # avg_c_reward·γ/(1-γ), agent_copycat.py:334)
            aug_reward = reward + end_reward * state2.end.astype(reward.dtype)
            out = TrajBatch(
                states=nobs, actions=action, rewards=aug_reward,
                c_rewards=reward,
                masks=1.0 - done.astype(mean.dtype), exps=exps,
                reward_terms=terms, dones=done, percents=state2.percent,
                seq_idx=state2.seq_idx, fails=state2.fail,
                start_inds=state2.start_ind)
            return (state2, rs, rng), out

        (env_state, rs, rng), traj = jax.lax.scan(
            step, (env_state, rs, rng), None, length=horizon)
        # bootstrap observation for truncated episodes
        last_obs = H.get_obs_batched(topo, model, cfg, env_state, expert_lib)
        last_obs = RN.normalize(rs, last_obs, clip_obs)
        return env_state, rs, traj, last_obs

    return rollout


def init_env_states(topo: Topology, cfg: EnvConfig, model: Model, expert_lib,
                    aux, rng, batch: int) -> H.EnvState:
    keys = jax.random.split(rng, batch)
    states = jax.vmap(
        lambda k: H.env_reset(topo, model, cfg, k, jnp.zeros((), jnp.int32),
                              expert_lib, aux["neutral_qpos"],
                              aux["neutral_qvel"], train=True))(keys)
    # mark done so the first rollout step resamples sequences properly
    return dataclasses.replace(
        states, done=jnp.ones((batch,), bool))
