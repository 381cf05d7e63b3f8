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
                 max_steps: int, clip_obs: float = 5.0,
                 fused_model: Model = None, use_fast_solver: bool = True,
                 per_seq_params: bool = False):
    """All test sequences advance lock-step through one batched env step
    (scan over time of the same `make_env_step_batched` the trainer uses),
    so evaluation rides the fused Pallas control-step kernel whenever the
    config allows it (`fused_model`)."""
    # evaluation ignores the training window cap and runs the full clip;
    # when the training cfg already covers the longest clip, reuse it
    # verbatim — the identical EnvConfig hash lets the persistent
    # compilation cache share the (expensive) fused-kernel lowering with
    # the training step instead of compiling a second instance
    if cfg.t_max >= max_steps and cfg.env_episode_len >= max_steps:
        eval_cfg = cfg
    else:
        eval_cfg = dataclasses.replace(cfg, t_max=10**9,
                                       env_episode_len=10**9)
    env_step_batched = H.make_env_step_batched(topo, eval_cfg,
                                               use_fast_solver,
                                               fused_model=fused_model)

    def eval_all(model, expert_lib, aux, params, rs):
        from uhc_tpu.physics.model import (model_batch_axes, model_gather,
                                           model_is_batched)

        S = expert_lib["len"].shape[0]
        seq_idx = jnp.arange(S)
        lengths = expert_lib["len"][seq_idx]
        # shape-conditioned eval: pick each sequence's per-beta model
        # (reference eval_seq reloads the robot per key, agent_copycat.py:447)
        if model_is_batched(model):
            m = model_gather(model, seq_idx)
            maxes = model_batch_axes(m)
        else:
            m, maxes = model, None
        states = jax.vmap(lambda i: H.env_reset(
            topo, model, eval_cfg, jax.random.PRNGKey(0), i, expert_lib,
            aux["neutral_qpos"], aux["neutral_qvel"], start_ind=0,
            train=False))(seq_idx)

        def body(carry, t):
            states, fail_safe = carry
            active = t < (lengths - 1)
            obs = H.get_obs_batched(topo, model, eval_cfg, states, expert_lib)
            if per_seq_params:
                # fit_uhc.py protocol: each sequence runs under its own
                # fine-tuned policy + ZFilter (params/rs leaves carry a
                # leading S axis, assembled host-side from _singles/*.p)
                nobs = jax.vmap(
                    lambda r, o: RN.normalize(r, o, clip_obs))(rs, obs)
                # nets expect a batch axis — run each policy on its own
                # singleton batch
                actions = jax.vmap(
                    lambda p, o: policy_mean_fn(p, o[None])[0])(params, nobs)
            else:
                nobs = RN.normalize(rs, obs, clip_obs)
                actions = policy_mean_fn(params, nobs)
            states2, _, _, _, _ = env_step_batched(
                model, states, actions, expert_lib,
                aux["jpos_diffw"], aux["body_diffw"], train=False)
            # fail-safe teleport (humanoid_im.py:902): on failure mid-clip,
            # reset onto the expert and keep going, flagging the sequence.
            exp = jax.vmap(lambda i, ct: H.expert_at(expert_lib, i, ct))(
                seq_idx, states2.cur_t)
            tele = states2.fail & active
            qpos = jnp.where(tele[:, None], exp["qpos"], states2.qpos)
            qvel = jnp.where(tele[:, None], exp["qvel"], states2.qvel)
            states2 = dataclasses.replace(
                states2, qpos=qpos, qvel=qvel,
                done=jnp.zeros((S,), bool), fail=jnp.zeros((S,), bool))
            fail_safe = fail_safe | tele
            # only advance while the clip is active
            states2 = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(active, (S,) + (1,) * (old.ndim - 1)),
                    new, old),
                states2, states)
            kin = jax.vmap(lambda mm, qp: E.fk(topo, mm, qp),
                           in_axes=(maxes, 0))(m, states2.qpos)
            out = {"pred_qpos": states2.qpos,
                   "pred_jpos": kin["xpos"].reshape(S, -1),
                   "active": active}
            return (states2, fail_safe), out

        (states, fail_safe), traj = jax.lax.scan(
            body, (states, jnp.zeros((S,), bool)), jnp.arange(max_steps))
        # (T, S, ...) -> (S, T, ...) to keep the per-sequence layout
        traj = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), traj)
        return traj, fail_safe, states.percent

    return jax.jit(eval_all)


def summarize(traj, fail_safe, percent, expert_lib, seq_keys,
              smpl_data=None, root_offset=None) -> Dict:
    """Host-side: per-sequence compute_metrics + coverage aggregate
    (agent_copycat.py:379-406).

    With `smpl_data` (+ `root_offset`, the Pelvis zero-pose offset), each
    sequence also gets vertex-based penetration/skate from the LBS mesh of
    the predicted poses (smpl_eval.py:125,138; betas from the library when
    the shape path recorded them, zeros otherwise)."""
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
        if smpl_data is not None and root_offset is not None:
            from uhc_tpu.learn.metrics import (
                compute_penetration_skate_vertices, vertices_from_qpos)
            if "beta" in expert_lib:
                beta = np.asarray(jax.device_get(expert_lib["beta"]))[s]
            else:
                beta = np.zeros(16, np.float32)
            ro = np.asarray(root_offset)
            ro = ro[s] if ro.ndim == 2 else ro   # per-seq shaped pelvis
            verts = vertices_from_qpos(pred_q, smpl_data, beta, ro)
            m.update(compute_penetration_skate_vertices(verts))
        results[key] = m
        for k, v in m.items():
            agg.setdefault(k, []).append(v)
    summary = {k: float(np.mean(v)) for k, v in agg.items()}
    summary["coverage"] = int(sum(m["succ"] for m in results.values()))
    summary["num_seqs"] = len(seq_keys)
    return {"per_seq": results, "summary": summary}
