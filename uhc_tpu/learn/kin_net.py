"""Autoregressive kinematic network — uhc/models/kin_net.py twin.

KinNet predicts, per frame, a kinematic action (80 = 74 qpos-style dims + 6
root velocities) from an obs_v1-style comparison of its *own integrated
state* against the next GT frame; the action is integrated by the same
`step_ar` rule the HumanoidKinEnv uses (kin_net.py:407-441 ==
humanoid_kin_v1.py:260-295), so a trained KinNet drives the hierarchical
env directly.

TPU design: the autoregressive rollout is a single `lax.scan` over time with
the GRU hidden state and integrator (qpos, qvel) as carry; scheduled
sampling enters as a precomputed Bernoulli mask (one draw per frame, as in
kin_net.py:204-208) so the scan stays branch-free. The whole forward +
supervised loss jits and vmaps over the batch.

KinPolicy (uhc/models/kin_policy.py:32) wraps the same parameters as an RL
policy: mean = KinNet action, fixed log_std head; its RNN state is part of
the rollout carry instead of hidden module state.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from uhc_tpu.envs.expert import qpos_fk_frame
from uhc_tpu.envs.humanoid_kin import KIN_POSE_START, KIN_QPOS_LM, KinConfig, step_ar
from uhc_tpu.learn import losses as L
from uhc_tpu.learn.nets import (
    _linear_init,
    gru_apply,
    gru_init,
    mlp_apply,
    mlp_init,
)
from uhc_tpu.maths import (
    de_heading,
    heading_angle,
    heading_quat,
    quat_inv,
    quat_mul,
    qvel_fd,
    transform_vec,
    wrap_to_pi,
)
from uhc_tpu.physics import engine as E
from uhc_tpu.physics.model import Model, Topology


@dataclasses.dataclass(frozen=True)
class KinNetSpecs:
    """model_specs subset KinNet reads (kin_net.py:75-80)."""

    mlp_htype: str = "relu"
    mlp_hsize: Tuple[int, ...] = (1024, 512)
    rnn_hdim: int = 512
    model_v: int = 1          # 1: GRU+MLP; 2: MLP only
    pose_delta: bool = False
    remove_base: bool = False
    base_rot: Tuple[float, ...] = (0.7071, 0.7071, 0.0, 0.0)
    log_std: float = -2.3     # KinPolicy fixed-std head
    # env_obs=True: supervised rollouts build the observation with the
    # ENV's own feature function (humanoid_kin.ar_obs_from) and target the
    # NEXT GT frame — the layout the net sees at RL/eval time. The default
    # False keeps the reference KinNet.get_obs conventions (kin_net.py:285:
    # current-frame target, body-major jpos ravel), which deviate from the
    # reference's own env and cap supervised->rollout transfer.
    env_obs: bool = False


def kin_obs_dim(topo: Topology, obs_vel: str = "full") -> int:
    nb, nq, nv = topo.nbody, topo.nq, topo.nv
    vel = nv if obs_vel == "full" else 6
    return 4 + 3 * (nq - 2) + vel + 3 + 3 * nb * 2 + 4 * nb * 2


def kin_action_dim() -> int:
    return KIN_QPOS_LM + 6


def kin_net_init(key, topo: Topology, specs: KinNetSpecs, dtype=jnp.float32):
    state_dim = kin_obs_dim(topo)
    action_dim = kin_action_dim()
    k1, k2, k3 = jax.random.split(key, 3)
    params: Dict[str, Any] = {}
    if specs.model_v in (0, 1):
        params["action_rnn"] = gru_init(k1, state_dim, specs.rnn_hdim, dtype)
        mlp_in = specs.rnn_hdim + state_dim
    else:
        mlp_in = state_dim
    params["action_mlp"] = mlp_init(k2, mlp_in, specs.mlp_hsize, dtype)
    params["action_fc"] = _linear_init(k3, specs.mlp_hsize[-1], action_dim,
                                       dtype=dtype)
    params["log_std"] = jnp.full((action_dim,), specs.log_std, dtype)
    return params


def kin_net_obs(topo: Topology, model: Model, specs: KinNetSpecs, qpos, qvel,
                gt_qpos, obs_vel: str = "full") -> jnp.ndarray:
    """Per-frame observation (kin_net.py:285-405 get_obs): the integrator
    state (qpos, qvel) vs the GT frame `gt_qpos`, single humanoid."""
    base_rot = jnp.asarray(specs.base_rot, qpos.dtype)
    obs = []

    curr_root_quat = quat_mul(qpos[3:7], quat_inv(base_rot))
    hq = heading_quat(curr_root_quat)
    obs.append(hq)

    target_qpos = gt_qpos
    target_root_quat = quat_mul(target_qpos[3:7], quat_inv(base_rot))

    qpos_dh = qpos.at[3:7].set(de_heading(curr_root_quat))
    diff_qpos = target_qpos
    diff_qpos = diff_qpos.at[2].add(-qpos_dh[2])
    diff_qpos = diff_qpos.at[7:].add(-qpos_dh[7:])
    diff_qpos = diff_qpos.at[3:7].set(
        quat_mul(target_root_quat, quat_inv(curr_root_quat)))
    obs += [target_qpos[2:], qpos_dh[2:], diff_qpos[2:]]

    # the reference's double linear-velocity transform (kin_net.py:321-325,
    # flagged "ZL: This looks pretty wrong to me" but shipped)
    v = transform_vec(qvel[:3], qpos_dh[3:7], "root")
    v = transform_vec(v, curr_root_quat, "root")
    qvel_o = qvel.at[:3].set(v)
    obs.append(qvel_o if obs_vel == "full" else qvel_o[:6])

    rel_h = wrap_to_pi(heading_angle(target_root_quat)
                       - heading_angle(curr_root_quat))
    obs.append(rel_h[None])
    # target_root_quat[:3] read kept for parity (kin_net.py:340)
    rel_pos = target_root_quat[:3] - qpos_dh[:3]
    rel_pos = transform_vec(rel_pos, curr_root_quat, "root")
    obs.append(rel_pos[:2])

    pred_fk = qpos_fk_frame(topo, model, qpos)
    tgt_fk = qpos_fk_frame(topo, model, target_qpos)
    pred_jpos = pred_fk["wbpos"].reshape(-1, 3)
    # body-major here (per-body appends, kin_net.py:360-372), unlike the
    # env's component-major ravel
    r_jpos = transform_vec(pred_jpos - pred_jpos[0:1],
                           curr_root_quat[None], "root")
    obs.append(r_jpos.reshape(-1))
    diff_jpos = transform_vec(tgt_fk["wbpos"].reshape(-1, 3) - pred_jpos,
                              curr_root_quat[None], "root")
    obs.append(diff_jpos.reshape(-1))

    pred_wbquat = pred_fk["wbquat"].reshape(-1, 4)
    tgt_wbquat = tgt_fk["wbquat"].reshape(-1, 4)
    obs.append(quat_mul(quat_inv(hq)[None], pred_wbquat).reshape(-1))
    obs.append(quat_mul(quat_inv(pred_wbquat), tgt_wbquat).reshape(-1))
    return jnp.concatenate(obs)


def kin_net_action(params, specs: KinNetSpecs, state, h):
    """(state_dim,), (H,) -> (action, h') (kin_net.py:443-453)."""
    if specs.model_v in (0, 1):
        h = gru_apply(params["action_rnn"], state, h)
        x = jnp.concatenate([state, h], axis=-1)
    else:
        x = state
    x = mlp_apply(params["action_mlp"], x, specs.mlp_htype)
    action = x @ params["action_fc"]["w"] + params["action_fc"]["b"]
    return action, h


def kin_net_step(specs: KinNetSpecs, qpos, qvel, action, dt=1.0 / 30.0):
    """Integrate an action: step_ar + fd qvel (kin_net.py:407-441)."""
    kc = KinConfig(pose_delta=specs.pose_delta, remove_base=specs.remove_base,
                   base_rot=specs.base_rot)
    next_qpos = step_ar(kc, qpos, action, dt)
    next_qvel = qvel_fd(qpos, next_qpos, dt)
    return next_qpos, next_qvel


def kin_net_rollout(params, topo: Topology, model: Model, specs: KinNetSpecs,
                    gt_qpos_seq, gt_qvel_seq, ss_mask=None):
    """Autoregressive forward over one sequence (kin_net.py:176-232
    forward): returns dict with pred qpos/qvel/wbpos/action per frame.

    gt_qpos_seq: (T, nq); ss_mask: optional (T,) bool — frames where
    scheduled sampling resets the integrator to GT (draws precomputed by the
    caller so the scan stays pure)."""
    T = gt_qpos_seq.shape[0]
    if ss_mask is None:
        ss_mask = jnp.zeros((T,), bool)
    h0 = jnp.zeros((specs.rnn_hdim,), gt_qpos_seq.dtype)
    qpos0, qvel0 = gt_qpos_seq[0], gt_qvel_seq[0]   # init_states (ref :264)

    if specs.env_obs:
        from uhc_tpu.config.config import EnvConfig
        from uhc_tpu.envs.humanoid_kin import ar_obs_from
        cc_cfg = EnvConfig(base_rot=specs.base_rot)

    def scan_fn(carry, inp):
        qpos, qvel, h = carry
        gt_qpos_t, gt_qpos_next, gt_qvel_next, use_gt = inp
        if specs.env_obs:
            # env layout + NEXT-frame target: what get_ar_obs_v1 feeds the
            # net in the hierarchical rollout
            state = ar_obs_from(topo, model, cc_cfg, qpos, qvel,
                                gt_qpos_next)
        else:
            state = kin_net_obs(topo, model, specs, qpos, qvel, gt_qpos_t)
        action, h = kin_net_action(params, specs, state, h)
        nqpos, nqvel = kin_net_step(specs, qpos, qvel, action)
        # scheduled sampling: reset integrator to GT with prob gt_rate
        nqpos = jnp.where(use_gt, gt_qpos_next, nqpos)
        nqvel = jnp.where(use_gt, gt_qvel_next, nqvel)
        out = {"qpos": qpos, "qvel": qvel, "action": action}
        return (nqpos, nqvel, h), out

    inps = (gt_qpos_seq[:-1], gt_qpos_seq[1:], gt_qvel_seq[1:],
            ss_mask[1:])
    (qposT, qvelT, _), outs = jax.lax.scan(
        scan_fn, (qpos0, qvel0, h0), inps)
    pred_qpos = jnp.concatenate([outs["qpos"], qposT[None]], axis=0)
    pred_qvel = jnp.concatenate([outs["qvel"], qvelT[None]], axis=0)
    wb = jax.vmap(lambda q: qpos_fk_frame(topo, model, q)["wbpos"])(pred_qpos)
    return {"qpos": pred_qpos, "qvel": pred_qvel, "wbpos": wb,
            "action": outs["action"]}


def kin_net_loss(pred, gt_qpos, gt_qvel, gt_wbpos, weights: Dict[str, float]):
    """Supervised sequence loss (kin_net.py:735-779 compute_loss_seq):
    weighted sum over {r_pos_loss, r_rot_loss, p_rot_loss, vl_loss, va_loss,
    ee_loss} with the reference's one-step-ahead qvel alignment."""
    terms = {
        "r_pos_loss": jnp.mean(L.root_pos_loss(gt_qpos, pred["qpos"])),
        "r_rot_loss": jnp.mean(
            L.root_orientation_loss(gt_qpos, pred["qpos"])),
        "p_rot_loss": jnp.mean(L.pose_rot_loss(gt_qpos, pred["qpos"])),
        "vl_loss": jnp.mean(
            L.linear_velocity_loss(gt_qvel[1:], pred["qvel"][:-1])),
        "va_loss": jnp.mean(
            L.angular_velocity_loss(gt_qvel[1:], pred["qvel"][:-1])),
        "ee_loss": jnp.mean(L.end_effector_pos_loss(
            gt_wbpos.reshape(gt_wbpos.shape[0], -1),
            pred["wbpos"].reshape(pred["wbpos"].shape[0], -1))),
    }
    total = sum(weights.get(k, 0.0) * v for k, v in terms.items())
    return total, terms


# -- KinPolicy (RL wrapper, uhc/models/kin_policy.py:32) ----------------------


def kin_policy_mean(params, specs: KinNetSpecs, state, h):
    """select_action mean path; h is threaded by the caller (replaces the
    reference's hidden RNN state + recrete_eps machinery)."""
    return kin_net_action(params, specs, state, h)


# -- SuperNet (uhc/models/super_net.py:64) -------------------------------------


def super_net_specs(ms: Dict[str, Any]) -> KinNetSpecs:
    """SuperNet = the MLP-only (model_v=2) variant with pose_delta and
    remove_base forced on (super_net.py:80-82)."""
    return KinNetSpecs(
        mlp_htype=ms.get("mlp_htype", "relu"),
        mlp_hsize=tuple(ms.get("mlp_hsize", (1024, 512))),
        model_v=2, pose_delta=True, remove_base=True)


def super_net_init(key, state_dim: int, specs: KinNetSpecs,
                   dtype=jnp.float32):
    """MLP + 80-dim action head. (The reference's forward returns the raw
    MLP features, super_net.py:116 — an apparent loose end; the head here
    makes the module usable while keeping the documented action_dim=80.)"""
    k1, k2 = jax.random.split(key)
    return {
        "model_mlp": mlp_init(k1, state_dim, specs.mlp_hsize, dtype),
        "head": _linear_init(k2, specs.mlp_hsize[-1], kin_action_dim(),
                             dtype=dtype),
    }


def super_net_apply(params, specs: KinNetSpecs, state):
    h = mlp_apply(params["model_mlp"], state, specs.mlp_htype)
    return h @ params["head"]["w"] + params["head"]["b"]
