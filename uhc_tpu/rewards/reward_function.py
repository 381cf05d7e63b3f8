"""Imitation reward registry — uhc/losses/reward_function.py twin.

Each reward is a pure function
    reward_fn(topo, model, cfg, state, action, expert_lib, aux) ->
        (scalar reward, (5,) per-term vector)
evaluated at the post-step state (env.cur_t already advanced), reading the
expert at index start_ind + cur_t exactly like the reference (the policy is
judged against the frame it was steered toward).

Implemented (registry at reference reward_function.py:823-833):
  world_rfc_implicit        (:12)   weighted sum of pose/vel/ee/com/vf terms
  world_rfc_implicit_quat   (:92)   same math (the reference bodies differ
                                     only in dead code)
  world_rfc_implicit_v1_mul (:174)  multiplicative composition
  world_rfc_explicit        (:253)  per-body residual-force magnitude term
  world_rfc_explicit_mul    (:346)  multiplicative version
  local_rfc_implicit        (:433)  root-relative terms (fd qvel, de-headed
                                     root quat, local ee) + root pose/vel
  local_rfc_explicit        (:534)  + per-body force/contact-point penalties
  world_rfc_implicit_v2     (:643)  multiplicative mean-squared world terms
  world_rfc_implicit_v3     (:726)  additive (unnormalized) version of v2
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.maths import (angvel_fd, de_heading, multi_quat_diff,
                           multi_quat_norm, qvel_fd, transform_vec)
from uhc_tpu.physics import engine as E
from uhc_tpu.smpl.constants import ee_indices


def _terms(topo, model, cfg, state, action, expert_lib, aux):
    """Shared pose/vel/ee/com terms of the world_rfc family."""
    exp = H.expert_at(expert_lib, state.seq_idx, state.start_ind + state.cur_t)
    kin = E.fk(topo, model, state.qpos)
    dt = cfg.ctrl_dt
    jpos_diffw, body_diffw = aux["jpos_diffw"], aux["body_diffw"]

    cur_ee = kin["xpos"][ee_indices(topo)].reshape(-1)
    cur_bquat = H.get_body_quat(state.qpos)
    cur_bangvel = angvel_fd(state.prev_bquat, cur_bquat, dt)
    cur_com = kin["xipos"][0]

    pose_diff = multi_quat_norm(multi_quat_diff(cur_bquat, exp["bquat"]))
    pose_diff = pose_diff * jnp.concatenate(
        [jnp.ones(1, pose_diff.dtype), body_diffw])
    pose_reward = jnp.exp(-cfg.k_p * jnp.sum(pose_diff**2))

    w = jpos_diffw[:, None]
    vel_dist = jnp.linalg.norm(
        (cur_bangvel.reshape(-1, 3) * w
         - exp["bangvel"].reshape(-1, 3) * w).reshape(-1))
    vel_reward = jnp.exp(-cfg.k_v * vel_dist**2)

    ee_reward = jnp.exp(-cfg.k_e * jnp.sum((cur_ee - exp["ee_wpos"])**2))
    com_reward = jnp.exp(-cfg.k_c * jnp.sum((cur_com - exp["com"])**2))
    return pose_reward, vel_reward, ee_reward, com_reward


def _vf_implicit(topo, cfg, action):
    ndof, vf_dim, _ = H.action_dims(topo, cfg)
    if cfg.residual_force and vf_dim:
        vf = action[ndof:ndof + vf_dim]
        return jnp.exp(-cfg.k_vf * jnp.sum(vf**2))
    return jnp.zeros((), action.dtype)


def _vf_explicit(topo, cfg, action):
    """Sum of squared force parts over bodies (reward_function.py:320-328)."""
    ndof, vf_dim, _ = H.action_dims(topo, cfg)
    if not (cfg.residual_force and vf_dim):
        return jnp.zeros((), action.dtype)
    bvd = H.body_vf_dim(cfg)
    vf = action[ndof:ndof + vf_dim].reshape(-1, bvd)
    return jnp.exp(-cfg.k_vf * jnp.sum(vf[:, 3:]**2))


def world_rfc_implicit(topo, model, cfg, state, action, expert_lib, aux):
    p, v, e, c = _terms(topo, model, cfg, state, action, expert_lib, aux)
    vf = _vf_implicit(topo, cfg, action)
    ws = jnp.asarray([cfg.w_p, cfg.w_v, cfg.w_e, cfg.w_c, cfg.w_vf])
    terms = jnp.stack([p, v, e, c, vf])
    return jnp.sum(ws * terms) / jnp.sum(ws), terms


def world_rfc_implicit_v1_mul(topo, model, cfg, state, action, expert_lib, aux):
    p, v, e, c = _terms(topo, model, cfg, state, action, expert_lib, aux)
    vf = _vf_implicit(topo, cfg, action)
    terms = jnp.stack([p, v, e, c, vf])
    reward = p * v * e * c * (vf if cfg.w_vf != 0.0 else 1.0)
    return reward, terms


def _explicit_terms(topo, model, cfg, state, action, expert_lib, aux):
    """world_rfc_explicit terms (reward_function.py:253-345). Differs from
    the implicit `_terms`: the velocity distance is NOT jpos_diffw-weighted
    (:311), the expert bangvel is zeroed past the sequence end (:303-304),
    and the norm order v_ord is honored (:310-311).

    The cyclic-expert re-anchoring branch (:291-301) is structurally dead in
    the reference's own env path — uhc/envs/humanoid_im.py:183 hardcodes
    `expert_meta = {"cyclic": False, ...}` — so it is deliberately not
    carried over."""
    exp = H.expert_at(expert_lib, state.seq_idx, state.start_ind + state.cur_t)
    kin = E.fk(topo, model, state.qpos)
    dt = cfg.ctrl_dt
    body_diffw = aux["body_diffw"]

    cur_ee = kin["xpos"][ee_indices(topo)].reshape(-1)
    cur_bquat = H.get_body_quat(state.qpos)
    cur_bangvel = angvel_fd(state.prev_bquat, cur_bquat, dt)
    cur_com = kin["xipos"][0]

    pose_diff = multi_quat_norm(multi_quat_diff(cur_bquat, exp["bquat"]))
    pose_diff = pose_diff * jnp.concatenate(
        [jnp.ones(1, pose_diff.dtype), body_diffw])
    pose_reward = jnp.exp(-cfg.k_p * jnp.sum(pose_diff**2))

    # zero the expert bangvel past the end of a (non-cyclic) sequence
    past_end = (state.start_ind + state.cur_t) >= exp["len"]
    e_bangvel = jnp.where(past_end, 0.0, exp["bangvel"])
    v_ord = cfg.rw("v_ord", 2)
    d = cur_bangvel - e_bangvel
    if v_ord == 2:
        vel_dist = jnp.linalg.norm(d)
    else:
        vel_dist = jnp.sum(jnp.abs(d) ** v_ord) ** (1.0 / v_ord)
    vel_reward = jnp.exp(-cfg.k_v * vel_dist**2)

    ee_reward = jnp.exp(-cfg.k_e * jnp.sum((cur_ee - exp["ee_wpos"])**2))
    com_reward = jnp.exp(-cfg.k_c * jnp.sum((cur_com - exp["com"])**2))
    return pose_reward, vel_reward, ee_reward, com_reward


def world_rfc_explicit(topo, model, cfg, state, action, expert_lib, aux):
    p, v, e, c = _explicit_terms(topo, model, cfg, state, action, expert_lib,
                                 aux)
    vf = _vf_explicit(topo, cfg, action)
    ws = jnp.asarray([cfg.w_p, cfg.w_v, cfg.w_e, cfg.w_c, cfg.w_vf])
    terms = jnp.stack([p, v, e, c, vf])
    return jnp.sum(ws * terms) / jnp.sum(ws), terms


def world_rfc_explicit_mul(topo, model, cfg, state, action, expert_lib, aux):
    p, v, e, c = _explicit_terms(topo, model, cfg, state, action, expert_lib,
                                 aux)
    vf = _vf_explicit(topo, cfg, action)
    terms = jnp.stack([p, v, e, c, vf])
    return p * v * e * c * vf, terms


def _local_terms(topo, model, cfg, state, expert_lib, aux):
    """Shared root-relative terms of the local_rfc family
    (reward_function.py:459-532)."""
    exp = H.expert_at(expert_lib, state.seq_idx, state.start_ind + state.cur_t)
    kin = E.fk(topo, model, state.qpos)
    dt = cfg.ctrl_dt
    body_diffw = aux["body_diffw"]

    k_p = cfg.rw("k_p", 2.0)
    k_v = cfg.rw("k_v", 0.005)
    k_e = cfg.rw("k_e", 20.0)
    k_rh = cfg.rw("k_rh", 300.0)
    k_rq = cfg.rw("k_rq", 300.0)
    k_rl = cfg.rw("k_rl", 5.0)
    k_ra = cfg.rw("k_ra", 0.5)

    qpos = state.qpos
    # fd generalized velocity across the control step, linear part in
    # obs_coord frame of the *previous* root (get_qvel_fd_new semantics:
    # both rv and the transformed v use the first argument's root quat)
    cur_qvel = qvel_fd(state.prev_qpos, qpos, dt)
    cur_rlinv_local = transform_vec(cur_qvel[:3], state.prev_qpos[3:7],
                                    cfg.obs_coord)
    cur_rangv = cur_qvel[3:6]
    cur_rq_rmh = de_heading(qpos[3:7])
    root_pos, root_quat = qpos[:3], qpos[3:7]
    cur_ee = transform_vec(kin["xpos"][ee_indices(topo)] - root_pos,
                           root_quat[None], cfg.obs_coord).reshape(-1)
    cur_bquat = H.get_body_quat(qpos)
    cur_bangvel = angvel_fd(state.prev_bquat, cur_bquat, dt)

    # pose (root quat excluded, weighted by b_diffw)
    pose_diff = multi_quat_norm(
        multi_quat_diff(cur_bquat[4:], exp["bquat"][4:])) * body_diffw
    pose_reward = jnp.exp(-k_p * jnp.sum(pose_diff**2))
    # velocity (root angvel excluded)
    vel_dist = jnp.linalg.norm(cur_bangvel[3:] - exp["bangvel"][3:])
    vel_reward = jnp.exp(-k_v * vel_dist**2)
    # end effectors in local frame
    ee_reward = jnp.exp(-k_e * jnp.sum((cur_ee - exp["ee_pos"])**2))
    # root pose: height + heading-removed orientation
    e_rq_rmh = de_heading(exp["qpos"][3:7])
    root_height_dist = qpos[2] - exp["qpos"][2]
    root_quat_dist = multi_quat_norm(
        multi_quat_diff(cur_rq_rmh, e_rq_rmh))[0]
    root_pose_reward = jnp.exp(-k_rh * root_height_dist**2
                               - k_rq * root_quat_dist**2)
    # root velocity
    root_linv_dist = jnp.linalg.norm(cur_rlinv_local - exp["rlinv_local"])
    root_angv_dist = jnp.linalg.norm(cur_rangv - exp["rangv"])
    root_vel_reward = jnp.exp(-k_rl * root_linv_dist**2
                              - k_ra * root_angv_dist**2)
    return pose_reward, vel_reward, ee_reward, root_pose_reward, \
        root_vel_reward


def local_rfc_implicit(topo, model, cfg, state, action, expert_lib, aux):
    """reward_function.py:433 local_rfc_implicit_reward."""
    p, v, e, rp, rv = _local_terms(topo, model, cfg, state, expert_lib, aux)
    w_p, w_v, w_e = cfg.rw("w_p", 0.5), cfg.rw("w_v", 0.0), cfg.rw("w_e", 0.2)
    w_rp, w_rv, w_vf = cfg.rw("w_rp", 0.1), cfg.rw("w_rv", 0.1), \
        cfg.rw("w_vf", 0.1)
    k_vf = cfg.rw("k_vf", 1.0)
    ndof, vf_dim, _ = H.action_dims(topo, cfg)
    if w_vf > 0.0 and vf_dim:
        vf = action[ndof:ndof + vf_dim]
        vf_reward = jnp.exp(-k_vf * jnp.sum(vf**2))
    else:
        vf_reward = jnp.zeros((), action.dtype)
    terms = jnp.stack([p, v, e, rp, rv, vf_reward])
    ws = jnp.asarray([w_p, w_v, w_e, w_rp, w_rv, w_vf])
    return jnp.sum(ws * terms) / jnp.sum(ws), terms


def local_rfc_explicit(topo, model, cfg, state, action, expert_lib, aux):
    """reward_function.py:534 local_rfc_explicit_reward — residual force
    split into per-body force-magnitude and contact-point penalties."""
    p, v, e, rp, rv = _local_terms(topo, model, cfg, state, expert_lib, aux)
    w_p, w_v, w_e = cfg.rw("w_p", 0.4), cfg.rw("w_v", 0.0), cfg.rw("w_e", 0.2)
    w_rp, w_rv = cfg.rw("w_rp", 0.1), cfg.rw("w_rv", 0.1)
    w_vf, w_cp = cfg.rw("w_vf", 0.1), cfg.rw("w_cp", 0.1)
    k_vf, k_cp = cfg.rw("k_vf", 20.0), cfg.rw("k_cp", 10.0)
    ndof, vf_dim, _ = H.action_dims(topo, cfg)
    if vf_dim:
        bvd = H.body_vf_dim(cfg)
        vf = action[ndof:ndof + vf_dim].reshape(-1, bvd)
        vf_reward = jnp.exp(-k_vf * jnp.sum(vf[:, 3:]**2))
        cp_reward = jnp.exp(-k_cp * jnp.sum(vf[:, :3]**2))
    else:
        vf_reward = jnp.ones((), action.dtype)
        cp_reward = jnp.ones((), action.dtype)
    terms = jnp.stack([p, v, e, rp, rv, vf_reward, cp_reward])
    ws = jnp.asarray([w_p, w_v, w_e, w_rp, w_rv, w_vf, w_cp])
    return jnp.sum(ws * terms) / jnp.sum(ws), terms


def _v2_terms(topo, model, cfg, state, action, expert_lib):
    """Shared mean-squared world-frame terms of v2/v3
    (reward_function.py:664-717)."""
    exp = H.expert_at(expert_lib, state.seq_idx, state.start_ind + state.cur_t)
    kin = E.fk(topo, model, state.qpos)
    dt = cfg.ctrl_dt
    nb = topo.nbody
    jw = cfg.rw("jpos_diffw", None)
    jpos_diffw = (jnp.asarray(jw, state.qpos.dtype) if jw is not None
                  else jnp.ones(nb, state.qpos.dtype))

    k_p, k_wp = cfg.rw("k_p", 0.4), cfg.rw("k_wp", 0.4)
    k_v, k_j = cfg.rw("k_v", 0.005), cfg.rw("k_j", 100.0)
    k_c, k_vf = cfg.rw("k_c", 100.0), cfg.rw("k_vf", 1.0)

    cur_bquat = H.get_body_quat(state.qpos)
    cur_wbquat = kin["xquat"].reshape(-1)
    cur_bangvel = angvel_fd(state.prev_bquat, cur_bquat, dt)
    cur_body_com = kin["xipos"]
    cur_wbpos = kin["xpos"]

    pose_diff = multi_quat_norm(
        multi_quat_diff(cur_bquat, exp["bquat"])) * jpos_diffw
    pose_reward = jnp.exp(-k_p * jnp.mean(pose_diff**2))
    wpose_diff = multi_quat_norm(
        multi_quat_diff(cur_wbquat, exp["wbquat"])) * jpos_diffw
    wpose_reward = jnp.exp(-k_wp * jnp.mean(wpose_diff**2))
    vel_reward = jnp.exp(
        -k_v * jnp.mean((cur_bangvel - exp["bangvel"])**2))
    com_diff = (exp["body_com"].reshape(-1, 3) - cur_body_com) \
        * jpos_diffw[:, None]
    com_reward = jnp.exp(
        -k_c * jnp.mean(jnp.sum(com_diff**2, axis=1)))
    jpos_diff = (cur_wbpos - exp["wbpos"].reshape(-1, 3)) \
        * jpos_diffw[:, None]
    jpos_reward = jnp.exp(
        -k_j * jnp.mean(jnp.sum(jpos_diff**2, axis=1)))
    ndof, vf_dim, _ = H.action_dims(topo, cfg)
    if vf_dim:
        vf_reward = jnp.exp(
            -k_vf * jnp.sum(action[ndof:ndof + vf_dim]**2))
    else:
        vf_reward = jnp.ones((), action.dtype)
    return pose_reward, wpose_reward, com_reward, jpos_reward, vel_reward, \
        vf_reward


def world_rfc_implicit_v2(topo, model, cfg, state, action, expert_lib, aux):
    """reward_function.py:643 — multiplicative composition."""
    p, wp, c, j, v, vf = _v2_terms(topo, model, cfg, state, action,
                                   expert_lib)
    terms = jnp.stack([p, wp, c, j, v, vf])
    return p * wp * c * j * v * vf, terms


def world_rfc_implicit_v3(topo, model, cfg, state, action, expert_lib, aux):
    """reward_function.py:726 — weighted additive (the reference does NOT
    normalize by the weight sum here)."""
    p, wp, c, j, v, vf = _v2_terms(topo, model, cfg, state, action,
                                   expert_lib)
    ws = jnp.asarray([cfg.rw("w_p", 0.4), cfg.rw("w_wp", 0.4),
                      cfg.rw("w_c", 100.0), cfg.rw("w_j", 100.0),
                      cfg.rw("w_v", 0.005), cfg.rw("w_vf", 1.0)])
    terms = jnp.stack([p, wp, c, j, v, vf])
    return jnp.sum(ws * terms), terms


reward_func: Dict[str, callable] = {
    "world_rfc_implicit": world_rfc_implicit,
    "world_rfc_implicit_quat": world_rfc_implicit,
    "world_rfc_implicit_v1_mul": world_rfc_implicit_v1_mul,
    "world_rfc_explicit": world_rfc_explicit,
    "world_rfc_explicit_mul": world_rfc_explicit_mul,
    "local_rfc_implicit": local_rfc_implicit,
    "local_rfc_explicit": local_rfc_explicit,
    "world_rfc_implicit_v2": world_rfc_implicit_v2,
    "world_rfc_implicit_v3": world_rfc_implicit_v3,
    "quat": world_rfc_implicit,
}


def get_reward_fn(reward_id: str):
    return reward_func[reward_id]
