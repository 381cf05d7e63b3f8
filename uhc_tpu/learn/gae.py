"""Generalized advantage estimation over scanned rollouts.

Reference: uhc/khrylib/rl/core/common.py:5 estimate_advantages — a reversed
python loop on CPU over a flat (N,1) batch. Here the rollout is (T, B) and
GAE is a `lax.scan` over the time axis (reverse=True), fully on device.
Masks are 1 within an episode, 0 at its last step — identical semantics:
values/advantages never flow across episode boundaries.

One deliberate improvement over the reference: rollout windows can truncate
an episode mid-flight (fixed-T scan), so the final step bootstraps from
V(s_{T+1}) instead of assuming episode end. `bootstrap_value` of zeros
recovers reference behavior exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def estimate_advantages(rewards, masks, values, bootstrap_value, gamma, tau):
    """rewards/masks/values: (T, B); bootstrap_value: (B,).

    Returns (advantages, returns), both (T, B), with advantages whitened
    over the full batch (common.py:22-23)."""

    def step(carry, xs):
        prev_value, prev_adv = carry
        r, m, v = xs
        delta = r + gamma * prev_value * m - v
        adv = delta + gamma * tau * prev_adv * m
        return (v, adv), adv

    (_, _), advantages = jax.lax.scan(
        step, (bootstrap_value, jnp.zeros_like(bootstrap_value)),
        (rewards, masks, values), reverse=True)
    returns = values + advantages
    adv_mean = jnp.mean(advantages)
    adv_std = jnp.std(advantages) + 1e-8
    advantages = (advantages - adv_mean) / adv_std
    return advantages, returns
