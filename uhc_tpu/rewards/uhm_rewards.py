"""Kinematic-policy (UHM) rewards — uhc/losses/uhm_rewards.py twin.

dynamic_supervision_v1..v6 (reference :8-377; registry :438-446) score the
simulated body against (a) the kin policy's own integrated target
(state.target_qpos), (b) the GT context motion, and (c) the GT head pose —
the training signals for the kinematic stack (kin_poly / UHM lineage).

All are pure functions
    fn(topo, model, kin_cfg, cc_cfg, state, context_lib) -> (reward, terms)
evaluated at the post-step KinEnvState. v2 is dead code in the reference
(its body is fully commented out and would NameError if called) and is
registered as an alias of v3 here.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.envs.expert import qpos_fk_frame
from uhc_tpu.smpl.constants import head_index
from uhc_tpu.envs.humanoid_kin import context_at, head_pose_of
from uhc_tpu.maths import angvel_fd, multi_quat_diff, multi_quat_norm_v2
from uhc_tpu.physics import engine as E


def _cur_feats(topo, model, state):
    kin = E.fk(topo, model, state.qpos)
    cur_bquat = H.get_body_quat(state.qpos)
    cur_wbpos = kin["xpos"]
    hi = head_index(topo)
    cur_hpos = jnp.concatenate([kin["xpos"][hi], kin["xquat"][hi]])
    return cur_bquat, cur_wbpos, cur_hpos


def _target_terms(topo, model, kin_cfg, state, cur_bquat, cur_wbpos):
    """p/jp rewards vs the policy's own integrated target
    (uhm_rewards.py:21-30)."""
    k_p, k_jp = kin_cfg.rw("k_p", 1.0), kin_cfg.rw("k_jp", 0.1)
    tgt = qpos_fk_frame(topo, model, state.target_qpos)
    pose_quat_diff = jnp.mean(
        multi_quat_norm_v2(multi_quat_diff(cur_bquat, tgt["bquat"])))
    pose_pos_diff = jnp.mean(jnp.linalg.norm(
        cur_wbpos - tgt["wbpos"].reshape(-1, 3), axis=1))
    p_reward = jnp.exp(-k_p * pose_quat_diff**2)
    jp_reward = jnp.exp(-k_jp * pose_pos_diff**2)
    return p_reward, jp_reward, tgt


def dynamic_supervision_v1(topo, model, kin_cfg, cc_cfg, state, context_lib):
    """uhm_rewards.py:8 — additive target-pose + GT-pose + GT-velocity."""
    dt = cc_cfg.ctrl_dt
    w_p, w_jp = kin_cfg.rw("w_p", 1.0), kin_cfg.rw("w_jp", 1.0)
    w_act_p, w_act_v = kin_cfg.rw("w_act_p", 1.0), kin_cfg.rw("w_act_v", 1.0)
    k_act_p, k_act_v = kin_cfg.rw("k_act_p", 0.1), kin_cfg.rw("k_act_v", 0.1)

    cur_bquat, cur_wbpos, _ = _cur_feats(topo, model, state)
    p_reward, jp_reward, _ = _target_terms(topo, model, kin_cfg, state,
                                           cur_bquat, cur_wbpos)
    ind = state.start_ind + state.cur_t
    gt = context_at(context_lib, state.seq_idx, ind)
    gt_prev = context_at(context_lib, state.seq_idx, ind - 1)
    pose_gt_diff = jnp.mean(
        multi_quat_norm_v2(multi_quat_diff(gt["bquat"], cur_bquat)))
    gt_p_reward = jnp.exp(-k_act_p * pose_gt_diff)   # not squared (ref :49)

    cur_bangvel = angvel_fd(state.prev_bquat, cur_bquat, dt)
    tgt_bangvel = angvel_fd(gt_prev["bquat"], gt["bquat"], dt)
    vel_dist = jnp.linalg.norm(cur_bangvel - tgt_bangvel)
    act_v_reward = jnp.exp(-k_act_v * vel_dist**2)

    reward = (w_p * p_reward + w_jp * jp_reward + w_act_p * gt_p_reward
              + w_act_v * act_v_reward)
    return reward, jnp.stack([p_reward, jp_reward, gt_p_reward,
                              act_v_reward])


def dynamic_supervision_v3(topo, model, kin_cfg, cc_cfg, state, context_lib):
    """uhm_rewards.py:132 — multiplicative head + target + ARNet-action
    terms."""
    dt = cc_cfg.ctrl_dt
    k_hp, k_hq = kin_cfg.rw("k_hp", 1.0), kin_cfg.rw("k_hq", 1.0)
    k_rp, k_rq = kin_cfg.rw("k_rp", 0.1), kin_cfg.rw("k_rq", 0.1)
    k_act_p, k_act_v = kin_cfg.rw("k_act_p", 0.1), kin_cfg.rw("k_act_v", 0.1)

    cur_bquat, cur_wbpos, cur_hpos = _cur_feats(topo, model, state)
    ind = state.start_ind + state.cur_t
    tgt_hpose = head_pose_of(context_lib, state.seq_idx, ind)
    hp_dist = jnp.linalg.norm(cur_hpos[:3] - tgt_hpose[:3])
    hp_reward = jnp.exp(-k_hp * hp_dist**2)
    hq_dist = jnp.mean(
        multi_quat_norm_v2(multi_quat_diff(cur_hpos[3:], tgt_hpose[3:])))
    hq_reward = jnp.exp(-k_hq * hq_dist**2)

    p_reward, jp_reward, tgt = _target_terms(topo, model, kin_cfg, state,
                                             cur_bquat, cur_wbpos)

    gt = context_at(context_lib, state.seq_idx, ind)
    gt_prev = context_at(context_lib, state.seq_idx, ind - 1)
    rp_dist = jnp.linalg.norm(gt["ar_qpos"][:3] - tgt["qpos"][:3])
    rq_dist = jnp.mean(multi_quat_norm_v2(
        multi_quat_diff(gt["ar_qpos"][3:7], tgt["qpos"][3:7])))
    pose_action_diff = jnp.mean(multi_quat_norm_v2(
        multi_quat_diff(gt["ar_bquat"], tgt["bquat"])))

    cur_bangvel = angvel_fd(state.prev_bquat, cur_bquat, dt)
    tgt_bangvel = angvel_fd(gt_prev["ar_bquat"], gt["ar_bquat"], dt)
    vel_dist = jnp.linalg.norm(cur_bangvel - tgt_bangvel)
    act_v_reward = jnp.exp(-k_act_v * vel_dist**2)

    rq_reward = jnp.exp(-k_rq * rq_dist**2)
    rp_reward = jnp.exp(-k_rp * rp_dist**2)
    act_p_reward = jnp.exp(-k_act_p * pose_action_diff)

    reward = (hp_reward * hq_reward * p_reward * jp_reward * rp_reward
              * rq_reward * act_p_reward)
    return reward, jnp.stack([hp_reward, hq_reward, p_reward, jp_reward,
                              rp_reward, rq_reward, act_p_reward,
                              act_v_reward])


def _head_target_terms(topo, model, kin_cfg, cc_cfg, state, context_lib):
    k_hp, k_hq = kin_cfg.rw("k_hp", 1.0), kin_cfg.rw("k_hq", 1.0)
    cur_bquat, cur_wbpos, cur_hpos = _cur_feats(topo, model, state)
    ind = state.start_ind + state.cur_t
    tgt_hpose = head_pose_of(context_lib, state.seq_idx, ind)
    hp_dist = jnp.linalg.norm(cur_hpos[:3] - tgt_hpose[:3])
    hp_reward = jnp.exp(-k_hp * hp_dist**2)
    hq_dist = jnp.mean(
        multi_quat_norm_v2(multi_quat_diff(cur_hpos[3:], tgt_hpose[3:])))
    hq_reward = jnp.exp(-k_hq * hq_dist**2)
    p_reward, jp_reward, _ = _target_terms(topo, model, kin_cfg, state,
                                           cur_bquat, cur_wbpos)
    return hp_reward, hq_reward, p_reward, jp_reward, cur_bquat


def dynamic_supervision_v4(topo, model, kin_cfg, cc_cfg, state, context_lib):
    """uhm_rewards.py:193 — additive head + target terms (hv term is a
    constant 0 in the reference)."""
    w_hp, w_hq = kin_cfg.rw("w_hp", 1.0), kin_cfg.rw("w_hq", 1.0)
    w_hv = kin_cfg.rw("w_hv", 0.05)
    w_p, w_jp = kin_cfg.rw("w_p", 1.0), kin_cfg.rw("w_jp", 1.0)
    hp, hq, p, jp, _ = _head_target_terms(topo, model, kin_cfg, cc_cfg,
                                          state, context_lib)
    hv = jnp.zeros((), hp.dtype)
    reward = w_hp * hp + w_hq * hq + w_hv * hv + w_p * p + w_jp * jp
    return reward, jnp.stack([hp, hq, hv, p, jp])


def dynamic_supervision_v5(topo, model, kin_cfg, cc_cfg, state, context_lib):
    """uhm_rewards.py:265 — multiplicative head + target terms."""
    hp, hq, p, jp, _ = _head_target_terms(topo, model, kin_cfg, cc_cfg,
                                          state, context_lib)
    hv = jnp.zeros((), hp.dtype)
    return hp * hq * p * jp, jnp.stack([hp, hq, hv, p, jp])


def dynamic_supervision_v6(topo, model, kin_cfg, cc_cfg, state, context_lib):
    """uhm_rewards.py:311 — additive head + target + ARNet angular-velocity
    terms."""
    dt = cc_cfg.ctrl_dt
    w_hp, w_hq = kin_cfg.rw("w_hp", 1.0), kin_cfg.rw("w_hq", 1.0)
    w_p, w_jp = kin_cfg.rw("w_p", 1.0), kin_cfg.rw("w_jp", 1.0)
    w_act_v = kin_cfg.rw("w_act_v", 1.0)
    k_act_v = kin_cfg.rw("k_act_v", 0.1)
    hp, hq, p, jp, cur_bquat = _head_target_terms(topo, model, kin_cfg,
                                                  cc_cfg, state, context_lib)
    ind = state.start_ind + state.cur_t
    gt = context_at(context_lib, state.seq_idx, ind)
    gt_prev = context_at(context_lib, state.seq_idx, ind - 1)
    cur_bangvel = angvel_fd(state.prev_bquat, cur_bquat, dt)
    tgt_bangvel = angvel_fd(gt_prev["ar_bquat"], gt["ar_bquat"], dt)
    vel_dist = jnp.linalg.norm(cur_bangvel - tgt_bangvel)
    act_v = jnp.exp(-k_act_v * vel_dist**2)
    reward = w_hp * hp + w_hq * hq + w_p * p + w_jp * jp + w_act_v * act_v
    return reward, jnp.stack([hp, hq, p, jp, act_v])


def constant_reward(topo, model, kin_cfg, cc_cfg, state, context_lib):
    """uhm_rewards.py:380."""
    one = jnp.ones((), state.qpos.dtype)
    return one, jnp.zeros((1,), state.qpos.dtype)


def forward_v1(topo, model, kin_cfg, cc_cfg, state, context_lib):
    """uhm_rewards.py:386 — locomotion-to-a-point test reward."""
    k_rp = kin_cfg.rw("k_rp", 1.0)
    target_pos = jnp.asarray([10.0, 10.0, 0.9], state.qpos.dtype)
    rp_dist = jnp.linalg.norm(state.qpos[:3] - target_pos)
    rp_reward = jnp.exp(-k_rp * rp_dist**2)
    return rp_reward, jnp.stack([rp_reward])


uhm_reward_func: Dict[str, callable] = {
    "dynamic_supervision_v1": dynamic_supervision_v1,
    "dynamic_supervision_v2": dynamic_supervision_v3,  # dead code in ref
    "dynamic_supervision_v3": dynamic_supervision_v3,
    "dynamic_supervision_v4": dynamic_supervision_v4,
    "dynamic_supervision_v5": dynamic_supervision_v5,
    "dynamic_supervision_v6": dynamic_supervision_v6,
    "constant": constant_reward,
    "forward_v1": forward_v1,
}


def get_uhm_reward_fn(reward_id: str):
    return uhm_reward_func[reward_id]
