"""Policy evaluation — eval_policy/eval_seq twin, batched on device.

Reference (uhc/agents/agent_copycat.py:354 eval_policy / :435 eval_seq):
20 multiprocessing jobs roll each test sequence deterministically, with a
fail-safe that teleports the sim back onto the expert trajectory on
failure and marks the sequence unsuccessful (humanoid_im.py:902 fail_safe;
succ = not fail_safe and percent == 1, smpl_eval.py:101).

Here all sequences evaluate simultaneously: vmap over the library, scan over
the max length, with per-sequence active masks. The collected (gt, pred)
trajectories feed `uhc_tpu.learn.metrics.compute_metrics` on host.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from uhc_tpu.config.config import EnvConfig
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.learn import running_norm as RN
from uhc_tpu.learn.metrics import compute_metrics
from uhc_tpu.physics import engine as E
from uhc_tpu.physics.model import Model, Topology


def make_eval_fn(topo: Topology, cfg: EnvConfig, policy_mean_fn,
                 max_steps: int, clip_obs: float = 5.0):
    # evaluation ignores the training window cap and runs the full clip
    eval_cfg = dataclasses.replace(cfg, t_max=10**9, env_episode_len=10**9)

    def eval_one(model, expert_lib, aux, params, rs, seq_idx):
        from uhc_tpu.physics.model import model_gather, model_is_batched

        # shape-conditioned eval: pick this sequence's per-beta model
        # (reference eval_seq reloads the robot per key, agent_copycat.py:447)
        if model_is_batched(model):
            model = model_gather(model, seq_idx)
        state = H.env_reset(topo, model, eval_cfg, jax.random.PRNGKey(0),
                            seq_idx, expert_lib, aux["neutral_qpos"],
                            aux["neutral_qvel"], start_ind=0, train=False)
        length = expert_lib["len"][seq_idx]

        def body(carry, t):
            state, fail_safe = carry
            active = t < (length - 1)
            obs = H.get_obs(topo, model, eval_cfg, state, expert_lib)
            nobs = RN.normalize(rs, obs, clip_obs)
            action = policy_mean_fn(params, nobs[None])[0]
            state2, _, _, _, _ = H.env_step(
                topo, model, eval_cfg, state, action, expert_lib,
                aux["jpos_diffw"], aux["body_diffw"], train=False)
            # fail-safe teleport (humanoid_im.py:902): on failure mid-clip,
            # reset onto the expert and keep going, flagging the sequence.
            exp = H.expert_at(expert_lib, seq_idx, state2.cur_t)
            tele = state2.fail & active
            qpos = jnp.where(tele, exp["qpos"], state2.qpos)
            qvel = jnp.where(tele, exp["qvel"], state2.qvel)
            state2 = dataclasses.replace(
                state2, qpos=qpos, qvel=qvel,
                done=jnp.zeros((), bool), fail=jnp.zeros((), bool))
            fail_safe = fail_safe | tele
            # only advance while the clip is active
            state2 = jax.tree.map(
                lambda new, old: jnp.where(active, new, old), state2, state)
            kin = E.fk(topo, model, state2.qpos)
            out = {"pred_qpos": state2.qpos,
                   "pred_jpos": kin["xpos"].reshape(-1),
                   "active": active}
            return (state2, fail_safe), out

        (state, fail_safe), traj = jax.lax.scan(
            body, (state, jnp.zeros((), bool)), jnp.arange(max_steps))
        return traj, fail_safe, state.percent

    def eval_all(model, expert_lib, aux, params, rs):
        S = expert_lib["len"].shape[0]
        return jax.vmap(lambda i: eval_one(model, expert_lib, aux, params,
                                           rs, i))(jnp.arange(S))

    return jax.jit(eval_all)


def summarize(traj, fail_safe, percent, expert_lib, seq_keys) -> Dict:
    """Host-side: per-sequence compute_metrics + coverage aggregate
    (agent_copycat.py:379-406)."""
    traj = jax.device_get(traj)
    fail_safe = np.asarray(jax.device_get(fail_safe))
    percent = np.asarray(jax.device_get(percent))
    lens = np.asarray(jax.device_get(expert_lib["len"]))
    gt_qpos = np.asarray(jax.device_get(expert_lib["qpos"]))
    gt_jpos = np.asarray(jax.device_get(expert_lib["wbpos"]))

    results = {}
    agg = {}
    for s, key in enumerate(seq_keys):
        T = int(lens[s]) - 1
        pred_q = traj["pred_qpos"][s][:T]
        pred_j = traj["pred_jpos"][s][:T]
        m = compute_metrics(pred_q, gt_qpos[s][1:T + 1], pred_j,
                            gt_jpos[s][1:T + 1], bool(fail_safe[s]),
                            float(percent[s]))
        results[key] = m
        for k, v in m.items():
            agg.setdefault(k, []).append(v)
    summary = {k: float(np.mean(v)) for k, v in agg.items()}
    summary["coverage"] = int(sum(m["succ"] for m in results.values()))
    summary["num_seqs"] = len(seq_keys)
    return {"per_seq": results, "summary": summary}
