"""Functional copycat (motion imitation) environment.

TPU-native re-design of reference uhc/envs/humanoid_im.py HumanoidEnv: the
env is a set of pure functions over an `EnvState` pytree; there is no
object, no XML reload, no host round-trip. An expert *library* (stacked,
padded motion features from `uhc_tpu.envs.expert.qpos_fk`) lives on device
and every per-step expert read is a gather. Episode auto-reset happens
inside the rollout scan, so thousands of envs run lock-step under one jit.

Step semantics follow humanoid_im.py:1192 step / :1145 do_simulation:
15 stable-PD substeps at 450 Hz (with per-substep meta-PD gain scaling and
implicit residual forces), body-diff termination and percent bookkeeping.
Observation v2 follows get_full_obs_v2 (humanoid_im.py:419) including its
published quirks (double velocity transform :425+:451, `target_root_quat[:3]`
rel_pos read :466) for checkpoint-compatibility.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

from uhc_tpu.config.config import EnvConfig
from uhc_tpu.maths import (
    angvel_fd,
    de_heading,
    heading_angle,
    heading_quat,
    multi_quat_diff,
    multi_quat_norm,
    quat_from_euler_zyx,
    quat_inv,
    quat_mul,
    quat_rotate,
    transform_vec,
    wrap_to_pi,
)
from uhc_tpu.physics import engine as E
from uhc_tpu.physics.model import Model, Topology
from uhc_tpu.smpl.constants import head_index


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    qpos: Any          # (nq,)
    qvel: Any          # (nv,)
    prev_qpos: Any     # (nq,) qpos at the previous control step (fd rewards)
    cur_t: Any         # int32 scalar
    start_ind: Any     # int32 scalar
    seq_idx: Any       # int32 scalar — which expert sequence
    prev_bquat: Any    # (nb*4,)
    done: Any          # bool
    fail: Any          # bool
    end: Any           # bool
    percent: Any       # f32
    rng: Any           # PRNG key
    # object-scene track (dataset_smpl_obj.py): per-frame free-joint qpos of
    # the scene objects, kinematic and expert-driven — the reference appends
    # these dofs to the sim state at reset (humanoid_im.py:1285-1292); here
    # they ride EnvState so steps/resets keep them in sync with the clip.
    # None when the motion library carries no objects.
    obj_qpos: Any = None
    # (NO, 6) free-joint velocities when objects are DYNAMIC (cfg/env_step
    # obj_model path); stays None for kinematic playback
    obj_qvel: Any = None


# ---------------------------------------------------------------------------
# Expert library access
# ---------------------------------------------------------------------------

# library keys indexed per sequence only (no time axis)
PER_SEQ_KEYS = ("len", "height_lb", "head_height_lb", "beta", "gender",
                "shape_obs", "weight")


def expert_at(expert_lib: Dict[str, Any], seq_idx, t):
    """Gather expert features of sequence `seq_idx` at frame index
    min(t, len-1) (non-cyclic clamp of humanoid_im.py:1322 get_expert_index)."""
    length = expert_lib["len"][seq_idx]
    ind = jnp.minimum(t, length - 1)
    per_frame = {
        k: v[seq_idx, ind]
        for k, v in expert_lib.items()
        if k not in PER_SEQ_KEYS
    }
    per_frame["len"] = length
    return per_frame


def body_vf_dim(cfg: EnvConfig) -> int:
    """Per-body explicit-RFC slot: contact point (3) + force (3) [+ torque
    (3)] (humanoid_im.py:242)."""
    return 6 + (3 if cfg.residual_force_torque else 0)


def action_dims(topo: Topology, cfg: EnvConfig):
    """ndof / vf_dim / meta_pd_dim layout (humanoid_im.py:226-250).
    Explicit RFC allocates body_vf_dim per body ("all" bodies) × num_each."""
    ndof = topo.ndof
    vf_dim = 0
    if cfg.residual_force:
        if cfg.residual_force_mode == "implicit":
            vf_dim = 6
        else:
            vf_dim = (body_vf_dim(cfg) * topo.nbody
                      * cfg.residual_force_bodies_num)
    meta_dim = 2 * cfg.frame_skip if cfg.meta_pd else (2 * ndof if cfg.meta_pd_joint else 0)
    return ndof, vf_dim, meta_dim


# ---------------------------------------------------------------------------
# Simulation: one 30 Hz control step = frame_skip stable-PD substeps
# ---------------------------------------------------------------------------


def do_simulation(topo: Topology, model: Model, cfg: EnvConfig, qpos, qvel,
                  action, target_base, rfc_rate, obj=None):
    """humanoid_im.py:1145 do_simulation as a lax.scan over substeps.

    `obj` = (ObjModel, obj_qpos (NO,7), obj_qvel (NO,6)) enables dynamic
    scene objects (the reference's free-joint object dofs,
    humanoid_im.py:1284-1287); the object state joins the substep carry and
    the function then returns (qpos, qvel, obj_qpos, obj_qvel)."""
    ndof, vf_dim, meta_dim = action_dims(topo, cfg)
    ctrl_joint = action[:ndof]
    base_rot = jnp.asarray(cfg.base_rot, qpos.dtype)

    if cfg.meta_pd:
        meta = action[ndof + vf_dim: ndof + vf_dim + meta_dim]
        kp_scale = jnp.clip(meta[:cfg.frame_skip] + 1.0, 0.0, 10.0)
        kd_scale = jnp.clip(meta[cfg.frame_skip:] + 1.0, 0.0, 10.0)
    elif cfg.meta_pd_joint:
        meta = action[ndof + vf_dim: ndof + vf_dim + meta_dim]
        kp_scale = jnp.tile(jnp.clip(meta[:ndof] + 1.0, 0.0, 10.0), (cfg.frame_skip, 1))
        kd_scale = jnp.tile(jnp.clip(meta[ndof:] + 1.0, 0.0, 10.0), (cfg.frame_skip, 1))
    else:
        kp_scale = jnp.ones((cfg.frame_skip,), qpos.dtype)
        kd_scale = jnp.ones((cfg.frame_skip,), qpos.dtype)

    def sub(carry, i):
        if obj is None:
            qp, qv = carry
        else:
            qp, qv, obj_qp, obj_qv = carry
        if cfg.action_type == "torque":
            # τ = ctrl·a_scale·100, clipped (humanoid_im.py:1158-1160) —
            # the ball-joint family's control mode; no PD target
            target_pos = jnp.zeros(ndof, qp.dtype)
        elif cfg.action_v == 1:
            # action_v=1: PD target = next expert pose (±π-wrapped to
            # current qpos) + policy offset (humanoid_im.py:1040-1048)
            base = qp[7:] + wrap_to_pi(target_base - qp[7:])
            target_pos = base + ctrl_joint
        else:
            target_pos = jnp.zeros_like(qp[7:]) + ctrl_joint

        if cfg.meta_pd:
            kp = model.jkp * kp_scale[i]
            kd = model.jkd * kd_scale[i]
        elif cfg.meta_pd_joint:
            kp = model.jkp * kp_scale[i]
            kd = model.jkd * kd_scale[i]
        else:
            kp, kd = model.jkp, model.jkd

        qfrc_applied = jnp.zeros(topo.nv, qp.dtype)
        vf_body = None
        if cfg.residual_force and cfg.residual_force_mode == "implicit":
            # rfc_implicit (humanoid_im.py:1136): scale, rotate the linear
            # part into the world by the heading, clip.
            vf = action[ndof:ndof + vf_dim] * (cfg.residual_force_scale * rfc_rate)
            curr_root = quat_mul(qp[3:7], quat_inv(base_rot))
            hq = heading_quat(curr_root)
            vf = jnp.concatenate([quat_rotate(hq, vf[:3]), vf[3:]])
            vf = jnp.clip(vf, -cfg.residual_force_lim, cfg.residual_force_lim)
            qfrc_applied = qfrc_applied.at[:6].set(vf)
        vf_gate = None
        if cfg.residual_force and cfg.residual_force_mode != "implicit":
            # rfc_explicit (humanoid_im.py:1080): per-body [cp, f, τ] in the
            # body frame; force/torque scaled by residual_force_scale;
            # optional hull projection of the contact point (:1107) and
            # contact-only gating (:1089-1105).
            vf_body = E.prep_explicit_vf(model, cfg,
                                         action[ndof:ndof + vf_dim],
                                         topo.nbody)
            if cfg.residual_contact_only:
                vf_gate = ("ground" if cfg.residual_contact_only_ground
                           else "height")

        if cfg.action_type == "torque":
            tau = jnp.clip(ctrl_joint * model.a_scale * 100.0,
                           -model.torque_lim, model.torque_lim)
            qp, qv, tau = E.substep_torque(topo, model, qp, qv, tau,
                                           qfrc_applied, vf_body, vf_gate,
                                           cfg.self_collision)
        elif obj is not None:
            qp, qv, tau, (obj_qp, obj_qv) = E.substep(
                topo, model, qp, qv, target_pos, kp, kd, qfrc_applied,
                vf_body, vf_gate, cfg.self_collision,
                obj=(obj[0], obj_qp, obj_qv))
        else:
            qp, qv, tau = E.substep(topo, model, qp, qv, target_pos, kp, kd,
                                    qfrc_applied, vf_body, vf_gate,
                                    cfg.self_collision)
        if obj is not None:
            return (qp, qv, obj_qp, obj_qv), None
        return (qp, qv), None

    if obj is not None:
        om, obj_qpos, obj_qvel = obj
        qp_shape, qv_shape = obj_qpos.shape, obj_qvel.shape
        (qpos, qvel, obj_qpos, obj_qvel), _ = jax.lax.scan(
            sub, (qpos, qvel, obj_qpos.reshape(-1, 7),
                  obj_qvel.reshape(-1, 6)),
            jnp.arange(cfg.frame_skip))
        return qpos, qvel, obj_qpos.reshape(qp_shape), obj_qvel.reshape(qv_shape)
    (qpos, qvel), _ = jax.lax.scan(sub, (qpos, qvel),
                                   jnp.arange(cfg.frame_skip))
    return qpos, qvel


# ---------------------------------------------------------------------------
# Observations
# ---------------------------------------------------------------------------


def get_body_quat(qpos):
    """Root quat + per-joint local quats, flat (nb*4,)
    (humanoid_im.py:925 get_body_quat; :927 use_quat branch reads the joint
    quaternions straight out of qpos).

    Ball-joint qpos is recognized by its static length (7 + 4·nj is never
    ≡ 7 mod 3 for the 24-body family; ball is only defined there)."""
    n = qpos.shape[0]
    if (n - 7) % 3 != 0:          # ball joints: quats already in qpos
        jq = qpos[7:].reshape(-1, 4)
    else:
        jq = quat_from_euler_zyx(qpos[7:].reshape(-1, 3))
    return jnp.concatenate([qpos[3:7][None], jq], axis=0).reshape(-1)


def obs_v2(topo: Topology, model: Model, cfg: EnvConfig, state: EnvState,
           expert_lib, shape_obs=None, delta_t: int = 0, tgt=None):
    """get_full_obs_v2 (humanoid_im.py:419-503), feature-order exact."""
    qpos = state.qpos
    qvel = state.qvel
    base_rot = jnp.asarray(cfg.base_rot, qpos.dtype)
    if tgt is None:
        tgt = expert_at(expert_lib, state.seq_idx,
                        state.start_ind + state.cur_t + 1 + delta_t)

    kin = E.fk(topo, model, qpos)
    obs = []

    # (the reference transforms the linear velocity twice — :425 then :451;
    # replicated for feature parity)
    qvel = qvel.at[:3].set(transform_vec(qvel[:3], qpos[3:7], cfg.obs_coord))
    curr_root_quat = quat_mul(qpos[3:7], quat_inv(base_rot))
    hq = heading_quat(curr_root_quat)
    obs.append(hq)

    target_qpos = tgt["qpos"]
    target_quat = tgt["wbquat"].reshape(-1, 4)
    target_jpos = tgt["wbpos"].reshape(-1, 3)
    target_root_quat = quat_mul(target_qpos[3:7], quat_inv(base_rot))

    qpos_dh = qpos.at[3:7].set(de_heading(curr_root_quat))
    diff_qpos = target_qpos
    diff_qpos = diff_qpos.at[2].add(-qpos_dh[2])
    diff_qpos = diff_qpos.at[7:].add(-qpos_dh[7:])
    diff_qpos = diff_qpos.at[3:7].set(
        quat_mul(target_root_quat, quat_inv(curr_root_quat)))

    obs += [target_qpos[2:], qpos_dh[2:], diff_qpos[2:]]

    qvel = qvel.at[:3].set(transform_vec(qvel[:3], curr_root_quat, cfg.obs_coord))
    obs.append(qvel if cfg.obs_vel == "full" else qvel[:6])

    rel_h = wrap_to_pi(heading_angle(target_root_quat) - heading_angle(curr_root_quat))
    obs.append(rel_h[None])

    # NOTE: reference reads target_root_quat[:3] here (humanoid_im.py:466) —
    # kept bit-for-bit for checkpoint parity.
    rel_pos = target_root_quat[:3] - qpos_dh[:3]
    rel_pos = transform_vec(rel_pos, curr_root_quat, cfg.obs_coord)
    obs.append(rel_pos[:2])

    # NOTE: the reference's transform_vec_batch returns a transposed (3, N)
    # array and ravels it (math_utils.py:118), so these position blocks are
    # component-major — replicated for exact feature-order parity.
    curr_jpos = kin["xpos"]
    r_jpos = curr_jpos - qpos_dh[None, :3]
    r_jpos = transform_vec(r_jpos, curr_root_quat[None], cfg.obs_coord)
    obs.append(r_jpos.T.reshape(-1))
    diff_jpos = target_jpos - curr_jpos
    diff_jpos = transform_vec(diff_jpos, curr_root_quat[None], cfg.obs_coord)
    obs.append(diff_jpos.T.reshape(-1))

    cur_quat = kin["xquat"]
    obs.append(quat_mul(quat_inv(hq)[None], cur_quat).reshape(-1))
    obs.append(quat_mul(quat_inv(cur_quat), target_quat).reshape(-1))

    if cfg.has_shape and cfg.has_shape_obs and shape_obs is not None:
        obs.append(shape_obs)
    return jnp.concatenate(obs)


def obs_v2_quat(topo: Topology, model: Model, cfg: EnvConfig,
                state: EnvState, expert_lib, shape_obs=None,
                delta_t: int = 0, tgt=None):
    """get_full_obs_v2_quat (humanoid_im.py:668-766) — the ball-joint
    family's observation: joint poses enter as quaternion differences
    q_cur⁻¹ ⊗ q_target over root + all joints, plus z heights, qvel,
    relative heading/xy, body-frame joint positions, and heading-relative /
    relative world body quats. Feature order exact."""
    qpos = state.qpos
    qvel = state.qvel
    nb = topo.nbody
    base_rot = jnp.asarray(cfg.base_rot, qpos.dtype)
    if tgt is None:
        tgt = expert_at(expert_lib, state.seq_idx,
                        state.start_ind + state.cur_t + 1 + delta_t)

    kin = E.fk(topo, model, qpos)
    obs = []

    # (reference transforms the linear velocity twice — :676 then :702;
    # replicated for feature parity)
    qvel = qvel.at[:3].set(transform_vec(qvel[:3], qpos[3:7], cfg.obs_coord))
    curr_root_quat = quat_mul(qpos[3:7], quat_inv(base_rot))
    hq = heading_quat(curr_root_quat)
    obs.append(hq)

    target_qpos = tgt["qpos"]
    target_quat = tgt["wbquat"].reshape(-1, 4)
    target_jpos = tgt["wbpos"].reshape(-1, 3)
    target_root_quat = quat_mul(target_qpos[3:7], quat_inv(base_rot))

    obs += [target_qpos[2:3], qpos[2:3], (target_qpos[2] - qpos[2])[None]]

    # quaternion differences over root + every joint (:697): both sides
    # carry the base-removed root quat in slot 0
    cur_quats = jnp.concatenate(
        [curr_root_quat[None], qpos[7:].reshape(-1, 4)], axis=0)
    tgt_quats = jnp.concatenate(
        [target_root_quat[None], target_qpos[7:].reshape(-1, 4)], axis=0)
    obs.append(quat_mul(quat_inv(cur_quats), tgt_quats).reshape(-1))

    qvel = qvel.at[:3].set(
        transform_vec(qvel[:3], curr_root_quat, cfg.obs_coord))
    obs.append(qvel if cfg.obs_vel == "full" else qvel[:6])

    rel_h = wrap_to_pi(heading_angle(target_root_quat)
                       - heading_angle(curr_root_quat))
    obs.append(rel_h[None])

    # NOTE: reference reads target_root_quat[:3] here (humanoid_im.py:719) —
    # kept bit-for-bit for checkpoint parity.
    rel_pos = target_root_quat[:3] - qpos[:3]
    rel_pos = transform_vec(rel_pos, curr_root_quat, cfg.obs_coord)
    obs.append(rel_pos[:2])

    # component-major position blocks (transform_vec_batch ravel, see obs_v2)
    curr_jpos = kin["xpos"]
    r_jpos = curr_jpos - qpos[None, :3]
    r_jpos = transform_vec(r_jpos, curr_root_quat[None], cfg.obs_coord)
    obs.append(r_jpos.T.reshape(-1))
    diff_jpos = target_jpos - curr_jpos
    diff_jpos = transform_vec(diff_jpos, curr_root_quat[None], cfg.obs_coord)
    obs.append(diff_jpos.T.reshape(-1))

    cur_quat = kin["xquat"]
    obs.append(quat_mul(quat_inv(hq)[None], cur_quat).reshape(-1))
    obs.append(quat_mul(quat_inv(cur_quat), target_quat).reshape(-1))

    if cfg.has_shape and cfg.has_shape_obs and shape_obs is not None:
        obs.append(shape_obs)
    return jnp.concatenate(obs)


def obs_v1(topo: Topology, model: Model, cfg: EnvConfig, state: EnvState,
           expert_lib, shape_obs=None, delta_t: int = 0, tgt=None):
    """get_full_obs_v1 (humanoid_im.py:323-417) — obs_v2 plus body-COM
    target/diff blocks (the release uhc_implicit config uses obs_v=1)."""
    qpos = state.qpos
    qvel = state.qvel
    base_rot = jnp.asarray(cfg.base_rot, qpos.dtype)
    if tgt is None:
        tgt = expert_at(expert_lib, state.seq_idx,
                        state.start_ind + state.cur_t + 1 + delta_t)

    kin = E.fk(topo, model, qpos)
    obs = []

    qvel = qvel.at[:3].set(transform_vec(qvel[:3], qpos[3:7], cfg.obs_coord))
    curr_root_quat = quat_mul(qpos[3:7], quat_inv(base_rot))
    hq = heading_quat(curr_root_quat)
    obs.append(hq)

    target_qpos = tgt["qpos"]
    target_quat = tgt["wbquat"].reshape(-1, 4)
    target_jpos = tgt["wbpos"].reshape(-1, 3)
    target_com = tgt["body_com"].reshape(-1, 3)
    target_root_quat = quat_mul(target_qpos[3:7], quat_inv(base_rot))

    qpos_dh = qpos.at[3:7].set(de_heading(curr_root_quat))
    diff_qpos = target_qpos
    diff_qpos = diff_qpos.at[2].add(-qpos_dh[2])
    diff_qpos = diff_qpos.at[7:].add(-qpos_dh[7:])
    diff_qpos = diff_qpos.at[3:7].set(
        quat_mul(target_root_quat, quat_inv(curr_root_quat)))
    obs += [target_qpos[2:], qpos_dh[2:], diff_qpos[2:]]

    qvel = qvel.at[:3].set(transform_vec(qvel[:3], curr_root_quat, cfg.obs_coord))
    obs.append(qvel if cfg.obs_vel == "full" else qvel[:6])

    rel_h = wrap_to_pi(heading_angle(target_root_quat) - heading_angle(curr_root_quat))
    obs.append(rel_h[None])
    # the same target_root_quat[:3] read as v2 (humanoid_im.py:368)
    rel_pos = target_root_quat[:3] - qpos_dh[:3]
    rel_pos = transform_vec(rel_pos, curr_root_quat, cfg.obs_coord)
    obs.append(rel_pos[:2])

    # (transposed component-major ravel — see obs_v2 note)
    curr_jpos = kin["xpos"]
    r_jpos = transform_vec(curr_jpos - qpos_dh[None, :3],
                           curr_root_quat[None], cfg.obs_coord)
    obs.append(r_jpos.T.reshape(-1))
    diff_jpos = transform_vec(target_jpos - curr_jpos, curr_root_quat[None],
                              cfg.obs_coord)
    obs.append(diff_jpos.T.reshape(-1))

    curr_com = kin["xipos"]
    r_com = transform_vec(curr_com - qpos_dh[None, :3], curr_root_quat[None],
                          cfg.obs_coord)
    obs.append(r_com.T.reshape(-1))
    diff_com = transform_vec(target_com - curr_com, curr_root_quat[None],
                             cfg.obs_coord)
    obs.append(diff_com.T.reshape(-1))

    cur_quat = kin["xquat"]
    obs.append(quat_mul(quat_inv(hq)[None], cur_quat).reshape(-1))
    obs.append(quat_mul(quat_inv(cur_quat), target_quat).reshape(-1))

    if cfg.has_shape and cfg.has_shape_obs and shape_obs is not None:
        obs.append(shape_obs)
    return jnp.concatenate(obs)


def obs_v0(topo: Topology, model: Model, cfg: EnvConfig, state: EnvState,
           expert_lib, shape_obs=None, delta_t: int = 0, tgt=None):
    """get_full_obs (humanoid_im.py:290-318) — the plain v0 layout:
    [heading?] deheaded qpos[2:], qvel, expert kin pose at cur_t, [phase?]."""
    qpos = state.qpos
    qvel = state.qvel
    if tgt is None:
        tgt = expert_at(expert_lib, state.seq_idx,
                        state.start_ind + state.cur_t + delta_t)
    qvel = qvel.at[:3].set(transform_vec(qvel[:3], qpos[3:7], cfg.obs_coord))
    obs = []
    if cfg.obs_heading:
        obs.append(heading_angle(qpos[3:7])[None])
    if cfg.root_deheading:
        qpos = qpos.at[3:7].set(de_heading(qpos[3:7]))
    obs.append(qpos[2:])
    obs.append(qvel if cfg.obs_vel == "full" else qvel[:6])
    obs.append(tgt["qpos"][7:])    # get_expert_kin_pose (humanoid_im.py:1350)
    if cfg.obs_phase:
        phase = state.cur_t.astype(qpos.dtype) / tgt["len"].astype(qpos.dtype)
        obs.append(phase[None])
    return jnp.concatenate(obs)


def obs_v4(topo: Topology, model: Model, cfg: EnvConfig, state: EnvState,
           expert_lib, shape_obs=None, delta_t: int = 0, tgt=None):
    """get_full_obs_v4 (humanoid_im.py:768-863) — global/local split
    flattened as concat([global, local.ravel()]); local rows are per
    non-root body [target pose | cur pose | diff pose | joint qvel | r_jpos |
    diff_jpos | heading-rel quat | rel quat] hstacked (23, 26)."""
    qpos = state.qpos
    qvel = state.qvel
    base_rot = jnp.asarray(cfg.base_rot, qpos.dtype)
    if tgt is None:
        tgt = expert_at(expert_lib, state.seq_idx,
                        state.start_ind + state.cur_t + 1 + delta_t)
    kin = E.fk(topo, model, qpos)
    g, l = [], []

    qvel = qvel.at[:3].set(transform_vec(qvel[:3], qpos[3:7], cfg.obs_coord))
    curr_root_quat = quat_mul(qpos[3:7], quat_inv(base_rot))
    hq = heading_quat(curr_root_quat)
    g.append(hq)

    target_qpos = tgt["qpos"]
    target_quat = tgt["wbquat"].reshape(-1, 4)
    target_jpos = tgt["wbpos"].reshape(-1, 3)
    target_root_quat = quat_mul(target_qpos[3:7], quat_inv(base_rot))

    qpos_dh = qpos.at[3:7].set(de_heading(curr_root_quat))
    diff_qpos = target_qpos
    diff_qpos = diff_qpos.at[2].add(-qpos_dh[2])
    diff_qpos = diff_qpos.at[7:].add(-qpos_dh[7:])
    diff_qpos = diff_qpos.at[3:7].set(
        quat_mul(target_root_quat, quat_inv(curr_root_quat)))

    g += [target_qpos[2:7], qpos_dh[2:7], diff_qpos[2:7]]
    l += [target_qpos[7:].reshape(-1, 3), qpos_dh[7:].reshape(-1, 3),
          diff_qpos[7:].reshape(-1, 3)]

    qvel = qvel.at[:3].set(
        transform_vec(qvel[:3], curr_root_quat, cfg.obs_coord))
    if cfg.obs_vel == "root":
        g.append(qvel[:6])
    else:
        g.append(qvel[:6])
        l.append(qvel[6:].reshape(-1, 3))

    rel_h = wrap_to_pi(heading_angle(target_root_quat)
                       - heading_angle(curr_root_quat))
    g.append(rel_h[None])
    # v4 reads target qpos[:3] here — the corrected rel_pos (:822)
    rel_pos = target_qpos[:3] - qpos_dh[:3]
    rel_pos = transform_vec(rel_pos, curr_root_quat, cfg.obs_coord)
    g.append(rel_pos[:2])

    curr_jpos = kin["xpos"]
    r_jpos = transform_vec(curr_jpos - qpos_dh[None, :3],
                           curr_root_quat[None], cfg.obs_coord)
    l.append(r_jpos[1:])        # root body dropped (row-major here, :832)
    diff_jpos = transform_vec(target_jpos - curr_jpos, curr_root_quat[None],
                              cfg.obs_coord)
    l.append(diff_jpos[1:])

    cur_quat = kin["xquat"]
    l.append(quat_mul(quat_inv(hq)[None], cur_quat)[1:])
    l.append(quat_mul(quat_inv(cur_quat), target_quat)[1:])

    if cfg.has_shape and shape_obs is not None:
        g.append(shape_obs)
    local = jnp.concatenate(l, axis=1)      # (nb-1, 26)
    return jnp.concatenate(g + [local.reshape(-1)])


def obs_v5(topo: Topology, model: Model, cfg: EnvConfig, state: EnvState,
           expert_lib, shape_obs=None, delta_t: int = 0, tgt=None):
    """get_full_obs_v5 (humanoid_im.py:505-594) — the "new heading math"
    ablation: atan2 heading, single velocity transform, correct rel_pos."""
    from uhc_tpu.maths import de_heading_new, heading_angle_new, heading_quat_new

    qpos = state.qpos
    qvel = state.qvel
    base_rot = jnp.asarray(cfg.base_rot, qpos.dtype)
    if tgt is None:
        tgt = expert_at(expert_lib, state.seq_idx,
                        state.start_ind + state.cur_t + 1 + delta_t)
    kin = E.fk(topo, model, qpos)
    obs = []

    target_qpos = tgt["qpos"]
    target_quat = tgt["wbquat"].reshape(-1, 4)
    target_jpos = tgt["wbpos"].reshape(-1, 3)
    curr_root_quat = quat_mul(qpos[3:7], quat_inv(base_rot))
    target_root_quat = quat_mul(target_qpos[3:7], quat_inv(base_rot))
    hq_quat = heading_quat_new(curr_root_quat)

    qpos_dh = qpos.at[3:7].set(de_heading_new(curr_root_quat))
    diff_qpos = target_qpos
    diff_qpos = diff_qpos.at[2].add(-qpos_dh[2])
    diff_qpos = diff_qpos.at[7:].add(-qpos_dh[7:])
    diff_qpos = diff_qpos.at[3:7].set(
        quat_mul(target_root_quat, quat_inv(curr_root_quat)))
    obs += [target_qpos[2:], qpos_dh[2:], diff_qpos[2:]]

    qvel = qvel.at[:3].set(transform_vec(qvel[:3], curr_root_quat, cfg.obs_coord))
    obs.append(qvel if cfg.obs_vel == "full" else qvel[:6])

    rel_h = wrap_to_pi(heading_angle_new(target_root_quat)
                       - heading_angle_new(curr_root_quat))
    obs.append(rel_h[None])
    rel_pos = transform_vec(target_qpos[:3] - qpos_dh[:3], curr_root_quat,
                            cfg.obs_coord)
    obs.append(rel_pos[:2])

    curr_jpos = kin["xpos"]
    r_jpos = transform_vec(curr_jpos - qpos_dh[None, :3],
                           curr_root_quat[None], cfg.obs_coord)
    obs.append(r_jpos.T.reshape(-1))
    diff_jpos = transform_vec(target_jpos - curr_jpos, curr_root_quat[None],
                              cfg.obs_coord)
    obs.append(diff_jpos.T.reshape(-1))

    cur_quat = kin["xquat"]
    obs.append(quat_mul(quat_inv(hq_quat)[None], cur_quat).reshape(-1))
    obs.append(quat_mul(quat_inv(cur_quat), target_quat).reshape(-1))
    if cfg.has_shape and cfg.has_shape_obs and shape_obs is not None:
        obs.append(shape_obs)
    return jnp.concatenate(obs)


def obs_v6(topo: Topology, model: Model, cfg: EnvConfig, state: EnvState,
           expert_lib, shape_obs=None, delta_t: int = 0, tgt=None):
    """get_full_obs_v6 (humanoid_im.py:596-666) — "most concise" variant:
    relative root pos/quat + qvel + heading-frame joint positions + local
    joint quats. The reference's `transform_vec_batch_new(...)[1:]` drops a
    COMPONENT row (3,nb)->(2,nb), not the root body — replicated."""
    from uhc_tpu.maths import heading_angle_new, heading_quat_new

    qpos = state.qpos
    qvel = state.qvel
    base_rot = jnp.asarray(cfg.base_rot, qpos.dtype)
    if tgt is None:
        tgt = expert_at(expert_lib, state.seq_idx,
                        state.start_ind + state.cur_t + 1 + delta_t)
    kin = E.fk(topo, model, qpos)
    obs = []

    curr_root_quat = quat_mul(qpos[3:7], quat_inv(base_rot))
    hq_quat = heading_quat_new(curr_root_quat)
    target_qpos = tgt["qpos"]
    target_jpos = tgt["wbpos"].reshape(-1, 3)
    target_root_quat = quat_mul(target_qpos[3:7], quat_inv(base_rot))

    rel_h = wrap_to_pi(heading_angle_new(target_root_quat)
                       - heading_angle_new(curr_root_quat))
    rel_pos = transform_vec(target_qpos[:3] - qpos[:3], hq_quat)
    obs.append(rel_pos)
    obs.append(rel_h[None])
    obs.append(quat_mul(target_root_quat, quat_inv(curr_root_quat)))

    qvel = qvel.at[:3].set(transform_vec(qvel[:3], hq_quat))
    obs.append(qvel if cfg.obs_vel == "full" else qvel[:6])

    curr_jpos = kin["xpos"]
    r_jpos = transform_vec(curr_jpos - qpos[None, :3], hq_quat[None])
    obs.append(r_jpos.T[1:].reshape(-1))       # (3,nb)[1:] quirk: 2*nb feats
    diff_jpos = transform_vec((target_jpos - curr_jpos)[1:], hq_quat[None])
    obs.append(diff_jpos.T.reshape(-1))

    target_bquat = tgt["bquat"].reshape(-1, 4)[1:]
    cur_bquat = get_body_quat(qpos).reshape(-1, 4)[1:]
    obs.append(cur_bquat.reshape(-1))
    obs.append(quat_mul(quat_inv(cur_bquat), target_bquat).reshape(-1))
    if cfg.has_shape and cfg.has_shape_obs and shape_obs is not None:
        obs.append(shape_obs)
    return jnp.concatenate(obs)


def get_obs(topo: Topology, model: Model, cfg: EnvConfig, state: EnvState,
            expert_lib, shape_obs=None, tgt=None):
    """Observation dispatch (humanoid_im.py:269 get_obs). `tgt` overrides
    the expert frame (used by the kinematic env, whose "expert" is the FK
    of its own integrated target pose, humanoid_kin_v1.py:144-151).

    When the experiment is shape-conditioned (cfg.has_shape), the
    per-sequence shape observation (get_expert_shape_and_gender,
    humanoid_im.py:1390) is gathered from the library; a library built
    without shapes is a hard error, not a silent feature drop."""
    if cfg.has_shape and shape_obs is None:
        if "shape_obs" not in expert_lib:
            raise ValueError(
                "cfg.has_shape=true but the expert library has no "
                "'shape_obs' — build it with data.dataset."
                "build_shaped_library, not build_expert_library")
        shape_obs = expert_lib["shape_obs"][state.seq_idx]
    if cfg.obs_v == 0:
        return obs_v0(topo, model, cfg, state, expert_lib, shape_obs, tgt=tgt)
    if cfg.obs_v == 1:
        return obs_v1(topo, model, cfg, state, expert_lib, shape_obs, tgt=tgt)
    if cfg.obs_v == 2:
        if cfg.robot_ball:
            # use_quat dispatch (humanoid_im.py:276-279)
            return obs_v2_quat(topo, model, cfg, state, expert_lib,
                               shape_obs, tgt=tgt)
        return obs_v2(topo, model, cfg, state, expert_lib, shape_obs, tgt=tgt)
    if cfg.obs_v == 3:
        # stacked future frames (humanoid_im.py:758-762 reads fut_frames and
        # skip from cfg; defaults 10/10)
        return jnp.concatenate([
            obs_v2(topo, model, cfg, state, expert_lib, shape_obs, delta_t=i)
            for i in range(0, cfg.fut_frames * cfg.obs_skip, cfg.obs_skip)])
    if cfg.obs_v == 4:
        return obs_v4(topo, model, cfg, state, expert_lib, shape_obs, tgt=tgt)
    if cfg.obs_v == 5:
        return obs_v5(topo, model, cfg, state, expert_lib, shape_obs, tgt=tgt)
    if cfg.obs_v == 6:
        return obs_v6(topo, model, cfg, state, expert_lib, shape_obs, tgt=tgt)
    raise NotImplementedError(f"obs_v={cfg.obs_v}")


def shape_obs_dim(topo: Topology, cfg: EnvConfig) -> int:
    """Width of get_expert_shape_and_gender (humanoid_im.py:1390-1406):
    beta(16) if has_pca + gender(1) + weight(1)? + bone_length(nb)?."""
    return ((16 if cfg.has_pca else 0) + 1
            + (1 if cfg.has_weight else 0)
            + (topo.nbody if cfg.has_bone_length else 0))


def get_obs_batched(topo: Topology, model: Model, cfg: EnvConfig,
                    states: EnvState, expert_lib):
    """vmap(get_obs) that accepts either a single shared model or a
    per-sequence model library (shape-conditioned experiments)."""
    from uhc_tpu.physics.model import (model_batch_axes, model_gather,
                                       model_is_batched)

    if model_is_batched(model):
        m = model_gather(model, states.seq_idx)
        maxes = model_batch_axes(m)
    else:
        m, maxes = model, None
    return jax.vmap(lambda mm, s: get_obs(topo, mm, cfg, s, expert_lib),
                    in_axes=(maxes, 0))(m, states)


def obs_dim(topo: Topology, cfg: EnvConfig,
            shape_obs_dim_: int | None = None) -> int:
    nb, nq, nv = topo.nbody, topo.nq, topo.nv
    vel = nv if cfg.obs_vel == "full" else 6
    if shape_obs_dim_ is None:
        shape_obs_dim_ = shape_obs_dim(topo, cfg) if cfg.has_shape else 0
    shape = shape_obs_dim_ if (cfg.has_shape and cfg.has_shape_obs) else 0
    if cfg.obs_v == 0:
        return ((1 if cfg.obs_heading else 0) + (nq - 2) + vel
                + topo.ndof + (1 if cfg.obs_phase else 0))
    if cfg.obs_v == 4:
        # global 4+5*3+6+3 (+shape; v4 checks has_shape only, :859) +
        # local (nb-1)*(3*3 + 3 + 3*2 + 4*2)
        return 28 + (shape_obs_dim_ if cfg.has_shape else 0) + (nb - 1) * 26
    if cfg.obs_v == 1:
        return 4 + 3 * (nq - 2) + vel + 1 + 2 + 3 * nb * 4 + 4 * nb * 2 + shape
    if cfg.obs_v == 2:
        if cfg.robot_ball:
            # v2_quat: hq(4) + z's(3) + quat diffs(4nb) + qvel + rel(3)
            # + jpos blocks(6nb) + wbquat blocks(8nb)
            return 4 + 3 + 4 * nb + vel + 3 + 6 * nb + 8 * nb + shape
        return 4 + 3 * (nq - 2) + vel + 1 + 2 + 3 * nb * 2 + 4 * nb * 2 + shape
    if cfg.obs_v == 3:
        return cfg.fut_frames * obs_dim(
            topo, dataclasses.replace(cfg, obs_v=2), shape_obs_dim_)
    if cfg.obs_v == 5:
        return 3 * (nq - 2) + vel + 1 + 2 + 3 * nb * 2 + 4 * nb * 2 + shape
    if cfg.obs_v == 6:
        return (3 + 1 + 4 + vel + 2 * nb + 3 * (nb - 1)
                + 4 * (nb - 1) * 2 + shape)
    raise NotImplementedError(f"obs_v={cfg.obs_v}")


# ---------------------------------------------------------------------------
# Termination + step + reset
# ---------------------------------------------------------------------------


def calc_body_diff(topo: Topology, model: Model, state: EnvState, expert_lib,
                   jpos_diffw):
    """Weighted mean joint-position distance (humanoid_im.py:1408)."""
    exp = expert_at(expert_lib, state.seq_idx, state.start_ind + state.cur_t)
    kin = E.fk(topo, model, state.qpos)
    diff = (kin["xpos"] - exp["wbpos"].reshape(-1, 3)) * jpos_diffw[:, None]
    per_body = jnp.linalg.norm(diff, axis=1)
    mask = (jpos_diffw > 0).astype(per_body.dtype)
    return jnp.sum(per_body * mask) / jnp.sum(mask)


def env_post_step(topo: Topology, model: Model, cfg: EnvConfig,
                  state: EnvState, action, expert_lib, jpos_diffw,
                  body_diffw, train: bool = True):
    """Termination + reward + obs after the physics advanced (state already
    holds the new qpos/qvel/cur_t/prev_bquat)."""
    qpos, qvel, cur_t = state.qpos, state.qvel, state.cur_t
    # episode window: reference slices the expert to
    # [fr_start, min(fr_start+t_max, len)) (dataset_amass_single.py:239) and
    # the env terminates at the window end; here the full sequence stays
    # resident and the window is arithmetic on (start_ind, t_max).
    length = expert_lib["len"][state.seq_idx]
    wlen = jnp.minimum(length - state.start_ind,
                       jnp.asarray(cfg.t_max if cfg.t_max > 0 else 10**9,
                                   jnp.int32))
    body_diff = calc_body_diff(topo, model, state, expert_lib, jpos_diffw)
    thresh = cfg.body_diff_thresh if train else cfg.body_diff_thresh_test
    if cfg.env_term_body == "body":
        fail = body_diff > thresh
    elif cfg.env_term_body == "root":
        fail = state.qpos[2] < expert_lib["height_lb"][state.seq_idx] - 0.1
    else:  # "Head"
        kin = E.fk(topo, model, state.qpos)
        fail = kin["xpos"][head_index(topo), 2] < \
            expert_lib["head_height_lb"][state.seq_idx] - 0.1
    # numerical blow-up counts as failure (the reference catches MuJoCo
    # exceptions, humanoid_im.py:1207-1211)
    blown = ~jnp.all(jnp.isfinite(qpos)) | (jnp.max(jnp.abs(qvel)) > 1e4)
    fail = fail | blown

    end = (cur_t >= cfg.env_episode_len) | \
          (cur_t >= wlen + cfg.env_expert_trail_steps - 1)
    done = fail | end
    percent = cur_t.astype(qpos.dtype) / jnp.maximum(wlen - 1, 1).astype(qpos.dtype)

    state = dataclasses.replace(state, done=done, fail=fail, end=end,
                                percent=percent)
    from uhc_tpu.rewards.reward_function import get_reward_fn

    aux = {"jpos_diffw": jpos_diffw, "body_diffw": body_diffw}
    reward, terms = get_reward_fn(cfg.reward_id)(
        topo, model, cfg, state, action, expert_lib, aux)
    obs = get_obs(topo, model, cfg, state, expert_lib)
    return state, obs, reward, terms, done


def env_step(topo: Topology, model: Model, cfg: EnvConfig, state: EnvState,
             action, expert_lib, jpos_diffw, body_diffw, rfc_rate=1.0,
             train: bool = True, obj_model=None):
    """One 30 Hz control step (humanoid_im.py:1192). Returns
    (state', obs, reward, reward_terms, done).

    With `obj_model` (physics.objects.ObjModel) the scene objects are
    DYNAMIC free bodies stepped inside do_simulation, like the reference's
    free-joint object dofs (humanoid_im.py:1284-1287); otherwise obj_qpos is
    kinematic expert playback."""
    prev_bquat = get_body_quat(state.qpos)
    tgt = expert_at(expert_lib, state.seq_idx,
                    state.start_ind + state.cur_t + 1)
    if obj_model is not None and state.obj_qpos is not None:
        obj_qvel = (state.obj_qvel if state.obj_qvel is not None
                    else jnp.zeros(state.obj_qpos.shape[:-1] + (6,),
                                   state.qpos.dtype))
        qpos, qvel, obj_qpos, obj_qvel = do_simulation(
            topo, model, cfg, state.qpos, state.qvel, action,
            tgt["qpos"][7:], rfc_rate,
            obj=(obj_model, state.obj_qpos, obj_qvel))
        state = dataclasses.replace(
            state, qpos=qpos, qvel=qvel, prev_qpos=state.qpos,
            cur_t=state.cur_t + 1, prev_bquat=prev_bquat,
            obj_qpos=obj_qpos, obj_qvel=obj_qvel)
    else:
        qpos, qvel = do_simulation(topo, model, cfg, state.qpos, state.qvel,
                                   action, tgt["qpos"][7:], rfc_rate)
        state = dataclasses.replace(
            state, qpos=qpos, qvel=qvel, prev_qpos=state.qpos,
            cur_t=state.cur_t + 1, prev_bquat=prev_bquat,
            # kinematic object playback (the reference's
            # obj free-joint dofs, humanoid_im.py:1285)
            obj_qpos=tgt.get("obj_pose", state.obj_qpos))
    return env_post_step(topo, model, cfg, state, action, expert_lib,
                         jpos_diffw, body_diffw, train)


def fused_compatible(cfg: EnvConfig, lane: bool = False) -> bool:
    """Whether a fused Pallas control-step kernel covers this config
    (no torque control; self-collision is supported in-kernel).
    Per-joint meta-PD (`meta_pd_joint`) and explicit RFC are
    lane-kernel-only: the per-dof gain scales ride the same (·, EL)
    operand slots the per-substep scales use, and the per-body [cp|f|t]
    wrenches enter as one (9nb, EL) operand projected in-kernel by
    dot_J6 (pallas_lane); the v2 kernel has slots for neither."""
    return ((not cfg.residual_force
             or cfg.residual_force_mode == "implicit" or lane)
            and (not cfg.meta_pd_joint or lane)
            and cfg.action_type != "torque")


def make_env_step_batched(topo: Topology, cfg: EnvConfig,
                          use_fast_solver: bool = True, pcg_iters: int = 5,
                          fused_model: Model = None,
                          fused_pcg_iters: int = 2):
    """Batch-level control step: the physics substep chain runs at batch
    level (enabling the maintained-inverse solver,
    uhc_tpu.physics.solver.make_do_simulation); obs/reward/termination are
    vmapped per env.

    Pass `fused_model` (the static Model the episode will simulate) to run
    the substep chain through the fused Pallas control-step kernel
    (physics.pallas_substep) when the config allows it — the kernel bakes
    the model, so it must equal the model passed at step time."""
    use_lane = (os.environ.get("UHC_TPU_LANE", "1") == "1"
                and (topo.nbody <= 32
                     or (topo.nbody <= 52
                         and os.environ.get("UHC_TPU_LANE_BIG",
                                            "1") == "1")))
    fused_per_env = False
    if fused_model is not None:
        from uhc_tpu.physics.model import model_batch_axes, model_is_batched
        if not fused_compatible(cfg, lane=use_lane):
            fused_model = None        # incompatible config -> XLA fallback
        elif model_is_batched(fused_model):
            # shape-conditioned model LIBRARY: the lane kernel gathers the
            # per-env shape tables by seq_idx (pallas_lane per_env path);
            # leaves outside its supported set (or the v2 kernel) fall back
            from uhc_tpu.physics.pallas_lane import PE_MODEL_LEAVES
            import dataclasses as _dc
            axes = model_batch_axes(fused_model)
            batched = {f.name for f in _dc.fields(type(fused_model))
                       if getattr(axes, f.name) == 0}
            if (batched <= set(PE_MODEL_LEAVES)
                    and (not cfg.residual_force
                         or cfg.residual_force_mode == "implicit")):
                fused_per_env = True
            else:
                # unsupported leaves, or explicit RFC (the hull-projection
                # tables are per-shape) -> XLA fallback
                fused_model = None
    if cfg.action_type == "torque":
        # torque control (ball family) runs the generic per-env path — the
        # maintained-inverse solver's PD-target algebra assumes euler qpos
        use_fast_solver = False
        fused_model = None
    # Lane-major (v3) kernel by default — measured 437k substeps/s vs
    # 301k for the v2 head/tail split (PERF.md round-3 table). The
    # 24-body SMPL tree gets the full production config (VPU-PCG over
    # EL=128, ET=32). Larger trees (masterfoot 48 / SMPL-H 52, NP=160)
    # drop the deferred VPU-PCG — its two extra (128, NP, NP) staging
    # buffers don't fit the v5e VMEM budget at NP=160 — and solve
    # env-major per ET=8 sub-tile instead. UHC_TPU_LANE=0 forces v2
    # everywhere; UHC_TPU_LANE_BIG=0 forces v2 for >32-body trees only.
    if fused_per_env and not use_lane:
        fused_model = None            # per-env models are lane-only
        fused_per_env = False
    if fused_model is not None:
        if use_lane:
            from uhc_tpu.physics.pallas_lane import \
                make_fused_do_simulation_lane

            big = topo.nbody > 32
            # small trees run the asymmetric PD/FD PCG schedule: the PD
            # solve's error reaches the dynamics scaled by kd·dt (~0.11)
            # and clipped, so PCG-1 suffices there (accuracy:
            # test_lane_kernel_schedule_variants_interpret vs a PCG-8
            # reference; speed: 482.3k vs 446.8k substeps/s symmetric,
            # train_queue_r4e.log). Big trees keep the symmetric count —
            # their measured rows used it.
            iters = ((1, fused_pcg_iters)
                     if not big and isinstance(fused_pcg_iters, int)
                     else fused_pcg_iters)
            fast_sim = make_fused_do_simulation_lane(
                topo, cfg, fused_model, env_tile=128,
                sub_tile=8 if big else 32,
                pcg_iters=iters, pcg_vpu=not big,
                # big trees: the deferred full-EL VPU-PCG's (EL,NP,NP)
                # staging buffers exceed VMEM at NP=160, but the VPU
                # matvec formulation still applies per sub-tile on the
                # locally assembled systems (no extra scratch)
                pcg_vpu_sub=big,
                # merged wrench projections (one masked-ancestor
                # contraction per substep) — bit-identical math, fewer
                # dispatches; opt-in (UHC_TPU_MERGEJ6=1) until the
                # silicon row lands (PERF.md)
                merge_j6=os.environ.get("UHC_TPU_MERGEJ6", "0") == "1")
        else:
            from uhc_tpu.physics.pallas_substep import \
                make_fused_do_simulation

            fast_sim = make_fused_do_simulation(topo, cfg, fused_model,
                                                pcg_iters=fused_pcg_iters,
                                                split=True, tail_tile=16)
        fast_sim_takes_model = False
    elif use_fast_solver:
        from uhc_tpu.physics.solver import make_do_simulation

        fast_sim = make_do_simulation(topo, cfg, pcg_iters)
        fast_sim_takes_model = True
    else:
        fast_sim = None
        fast_sim_takes_model = True

    def step(model: Model, states: EnvState, actions, expert_lib,
             jpos_diffw, body_diffw, rfc_rate=1.0, train: bool = True):
        from uhc_tpu.physics.model import (model_batch_axes, model_gather,
                                           model_is_batched)

        # shape-conditioned training: `model` is a per-sequence library
        # (leading (S,) on shape leaves) — gather each env's model by its
        # current expert sequence (reference reset_robot rebuilds the robot
        # per episode, humanoid_im.py:154-180; here it's a gather)
        if model_is_batched(model):
            m = model_gather(model, states.seq_idx)   # (B,) shape leaves
            maxes = model_batch_axes(m)
        else:
            m, maxes = model, None

        prev_bquat = jax.vmap(get_body_quat)(states.qpos)
        tgt = jax.vmap(lambda s: expert_at(
            expert_lib, s.seq_idx, s.start_ind + s.cur_t + 1))(states)
        target_base = tgt["qpos"][:, 7:]
        if fast_sim is not None and not fast_sim_takes_model:
            if fused_per_env:
                qpos, qvel = fast_sim(states.qpos, states.qvel, actions,
                                      target_base, rfc_rate,
                                      states.seq_idx)
            else:
                qpos, qvel = fast_sim(states.qpos, states.qvel, actions,
                                      target_base, rfc_rate)
        elif fast_sim is not None:
            qpos, qvel = fast_sim(m, states.qpos, states.qvel, actions,
                                  target_base, rfc_rate)
        else:
            qpos, qvel = jax.vmap(
                lambda mm, qp, qv, a, tb: do_simulation(
                    topo, mm, cfg, qp, qv, a, tb, rfc_rate),
                in_axes=(maxes, 0, 0, 0, 0))(
                m, states.qpos, states.qvel, actions, target_base)
        states = dataclasses.replace(
            states, qpos=qpos, qvel=qvel, prev_qpos=states.qpos,
            cur_t=states.cur_t + 1, prev_bquat=prev_bquat,
            obj_qpos=tgt.get("obj_pose", states.obj_qpos))
        return jax.vmap(
            lambda mm, s, a: env_post_step(topo, mm, cfg, s, a, expert_lib,
                                           jpos_diffw, body_diffw, train),
            in_axes=(maxes, 0, 0))(m, states, actions)

    return step


def match_heading_and_pos(qpos_1, qpos_2, base_rot):
    """Align qpos_2's heading+xy to qpos_1 (humanoid_im.py:1312)."""
    base_rot = jnp.asarray(base_rot, qpos_1.dtype)
    q1 = quat_mul(qpos_1[3:7], quat_inv(base_rot))
    heading_1 = heading_quat(q1)
    new_quat = quat_mul(heading_1, de_heading(qpos_2[3:7]))
    out = qpos_2.at[3:7].set(new_quat)
    out = out.at[:2].set(qpos_1[:2])
    return out


def env_reset(topo: Topology, model: Model, cfg: EnvConfig, rng, seq_idx,
              expert_lib, neutral_qpos, neutral_qvel, start_ind=None,
              train: bool = True, dynamic_obj: bool = False):
    """reset_model (humanoid_im.py:1245): expert window-start frame (+ joint
    noise in train), or — reactive_v=1 with prob reactive_rate — the
    standing-neutral pose heading-matched to the expert (fall-recovery
    curriculum). In train mode the window start is sampled uniformly in
    [0, len - t_min) as in dataset_amass_single.py:233."""
    rng, k1, k2, k3 = jax.random.split(rng, 4)
    length = expert_lib["len"][seq_idx]
    if start_ind is None:
        if train:
            hi = jnp.maximum(length - cfg.t_min, 1)
            start_ind = jax.random.randint(k3, (), 0, hi)
        else:
            start_ind = jnp.zeros((), jnp.int32)
    exp0 = expert_at(expert_lib, seq_idx, start_ind)
    init_qpos = exp0["qpos"]
    init_qvel = exp0["qvel"]
    if train and cfg.env_init_noise > 0:
        noise = cfg.env_init_noise * jax.random.normal(
            k1, init_qpos[7:].shape, init_qpos.dtype)
        init_qpos = init_qpos.at[7:].add(noise)
    if cfg.reactive_v == 1 and train:
        use_neutral = jax.random.bernoulli(k2, cfg.reactive_rate)
        neutral = match_heading_and_pos(init_qpos, neutral_qpos, cfg.base_rot)
        init_qpos = jnp.where(use_neutral, neutral, init_qpos)
        init_qvel = jnp.where(use_neutral, neutral_qvel, init_qvel)
    zero = jnp.zeros((), jnp.int32)
    state = EnvState(
        qpos=init_qpos, qvel=init_qvel, prev_qpos=init_qpos, cur_t=zero,
        start_ind=jnp.asarray(start_ind, jnp.int32),
        seq_idx=jnp.asarray(seq_idx, jnp.int32),
        prev_bquat=get_body_quat(init_qpos),
        done=jnp.zeros((), bool), fail=jnp.zeros((), bool),
        end=jnp.zeros((), bool), percent=jnp.zeros((), init_qpos.dtype),
        rng=rng,
        # object free-joint qpos at the start frame (humanoid_im.py:1285);
        # dynamic objects start at rest (reference zeroes the obj qvel slots)
        obj_qpos=exp0.get("obj_pose"),
        obj_qvel=(jnp.zeros(exp0["obj_pose"].shape[:-1] + (6,),
                            init_qpos.dtype)
                  if dynamic_obj and exp0.get("obj_pose") is not None
                  else None),
    )
    return state
