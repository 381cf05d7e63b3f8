"""precision_mode — failure-frame-targeted window restarts.

Reference semantics: agent_copycat.py:103 reads precision_mode,
fit_uhc.py:111 switches it on for the per-sequence fit protocol, and
dataset_amass_single.py:222-230 resamples fr_start uniformly in
[max(c - 20 - t_min, 0), min(c + 20, len - t_min)) around a recorded
failure start c, at rate sampling_freq (freq_dict stores
[percent, fr_start] pairs, agent_copycat.py:561).

Here the pool of recorded failure starts is a device array consumed by
the auto-reset inside the rollout scan (rollout.reset_like), and the
telemetry flows back through TrajBatch.start_inds.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.data.sampling import FailureFrequencySampler
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.learn import running_norm as RN
from uhc_tpu.learn.rollout import init_env_states, make_rollout_fn


def test_sampler_records_failure_starts():
    s = FailureFrequencySampler(num_seqs=2)
    seq_idx = np.array([0, 0, 1, 1, 0])
    dones = np.array([1, 1, 1, 0, 1])
    percents = np.array([1.0, 0.4, 0.7, 0.2, 1.0])
    starts = np.array([3, 17, 90, 5, 41])
    s.update_from_rollout(seq_idx, dones, percents, starts)
    # failures only, done rows only
    assert s.fail_starts[0] == [17]
    assert s.fail_starts[1] == [90]
    pool = s.fail_start_pool(pool_size=4)
    assert pool.shape == (2, 4)
    assert (pool[0] == 17).all() and (pool[1] == 90).all()
    # a sequence with no failures yields an all--1 row (uniform fallback)
    s2 = FailureFrequencySampler(num_seqs=1)
    assert (s2.fail_start_pool(4) == -1).all()
    # state_dict round-trip keeps the pools; legacy dicts load clean
    s3 = FailureFrequencySampler(num_seqs=2)
    s3.load_state_dict(s.state_dict())
    assert s3.fail_starts == s.fail_starts
    s4 = FailureFrequencySampler(num_seqs=2)
    s4.load_state_dict({"records": [[1.0], []]})
    assert s4.fail_starts == [[], []]


@pytest.mark.slow
def test_precision_restarts_target_pool(humanoid_setup):
    topo, model, cfg, lib, aux = humanoid_setup
    # deterministic short episodes so every env resets within the horizon
    cfg = dataclasses.replace(cfg, env_episode_len=2, env_init_noise=0.0,
                              reactive_v=0)
    obs_dim = H.obs_dim(topo, cfg)
    ndof, vf, meta = H.action_dims(topo, cfg)
    act_dim = ndof + vf + meta
    params = {"w": jnp.zeros((obs_dim, act_dim))}
    mean_fn = lambda p, x: x @ p["w"]
    roll = make_rollout_fn(topo, cfg, mean_fn, horizon=8)
    key = jax.random.PRNGKey(0)
    states = init_env_states(topo, cfg, model, lib, aux, key, 8)
    rs = RN.init(obs_dim)

    target = 20   # library is truncated to 40 frames in the fixture
    pool = jnp.full((1, 8), target, jnp.int32)
    out = roll(model, lib, aux, params, jnp.zeros(act_dim) - 10.0, rs,
               states, key, 0.0, 1.0, jnp.zeros(1), 0.0,
               pool, jnp.asarray(1.0, jnp.float32))
    traj = out[2]
    starts = np.asarray(traj.start_inds)
    dones = np.asarray(traj.dones)
    # every restart after the first done must start inside the reference
    # window [max(target-20-t_min, 0), min(target+20, len-t_min))
    L = int(lib["len"][0])
    lo = max(target - 20 - cfg.t_min, 0)
    hi = min(target + 20, max(L - cfg.t_min, 1))
    restarted = starts[1:][dones[:-1] > 0]
    assert restarted.size > 0
    assert (restarted >= lo).all() and (restarted < hi).all(), (
        restarted, lo, hi)
    # with an empty pool (-1) and freq 1.0, falls back to uniform sampling
    # without error
    out2 = roll(model, lib, aux, params, jnp.zeros(act_dim) - 10.0, rs,
                states, key, 0.0, 1.0, jnp.zeros(1), 0.0,
                jnp.full((1, 8), -1, jnp.int32),
                jnp.asarray(1.0, jnp.float32))
    s2 = np.asarray(out2[2].start_inds)
    assert (s2 >= 0).all() and (s2 < L).all()
