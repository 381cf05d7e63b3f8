"""Hierarchical kinematic-policy environment — HumanoidKinEnv twin
(reference uhc/envs/humanoid_kin_v1.py:25).

A kinematic action (80 = 74 qpos-style dims + 6 root velocities) is
integrated by `step_ar` into the next target qpos; its FK becomes the
"expert" frame fed to a *frozen* pretrained UHC policy (cc_policy,
humanoid_kin_v1.py:99-129), whose mean action drives the simulated body via
the ordinary stable-PD `do_simulation`. The kin policy observes
`get_ar_obs_v1` (humanoid_kin_v1.py:162-258): obs_v1-style features of the
sim state vs the FK of the *ground-truth* next frame.

TPU design: everything is a pure function over a `KinEnvState` pytree; the
frozen controller enters as a closure `cc_policy_fn(cc_obs) -> cc_action`
(params + running-stat normalization baked in), so the whole two-level step
jits and vmaps as one program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from uhc_tpu.config.config import EnvConfig
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.envs.expert import qpos_fk_frame
from uhc_tpu.maths import (
    de_heading,
    heading_angle,
    heading_quat,
    quat_from_rotvec,
    quat_inv,
    quat_mul,
    quat_normalize,
    quat_rotate,
    transform_vec,
    wrap_to_pi,
)
from uhc_tpu.physics import engine as E
from uhc_tpu.physics.model import Model, Topology


@dataclasses.dataclass(frozen=True)
class KinConfig:
    """Static kin-env hyper-parameters (uhm_config.py fields actually read
    by the env)."""

    pose_delta: bool = False          # model_specs.pose_delta
    remove_base: bool = True          # cfg.remove_base (step_ar)
    env_episode_len: int = 100000
    env_term_body: str = "body"
    reward_id: str = "dynamic_supervision_v1"
    reward_weights: Tuple[Tuple[str, Any], ...] = ()
    base_rot: Tuple[float, ...] = (0.7071, 0.7071, 0.0, 0.0)

    def rw(self, name: str, default):
        for k, v in self.reward_weights:
            if k == name:
                return v
        return default


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KinEnvState:
    qpos: Any          # (nq,)
    qvel: Any          # (nv,)
    prev_qpos: Any     # (nq,)
    prev_bquat: Any    # (nb*4,)
    prev_hpos: Any     # (7,) head pos+quat before the step
    target_qpos: Any   # (nq,) the kin policy's current integrated target
    cur_t: Any         # int32
    start_ind: Any     # int32
    seq_idx: Any       # int32 — which context sequence
    done: Any
    fail: Any
    end: Any
    percent: Any
    rng: Any
    # scene objects (kin_poly sit/avoid/push tasks): free-joint pose track;
    # dynamic when kin_env_step gets an obj_model (reference
    # humanoid_kin_v1.py:477 get_obj_qpos appends these dofs to the sim)
    obj_qpos: Any = None
    obj_qvel: Any = None


KIN_QPOS_LM = 74     # humanoid_kin_v1.py:263 qpos_lm
KIN_POSE_START = 7


def kin_action_dim(topo: Topology) -> int:
    """74 qpos-style dims + 6 root velocities (step_ar layout)."""
    return KIN_QPOS_LM + 6


def step_ar(cfg: KinConfig, qpos: jnp.ndarray, a: jnp.ndarray,
            dt: float = 1.0 / 30.0) -> jnp.ndarray:
    """Integrate a kinematic action into the next target qpos
    (humanoid_kin_v1.py:260-295 step_ar).

    Layout: a[0] -> target z, a[1:5] root-quat slots (overwritten by the
    integrated rotation), a[5:74] body pose (absolute, or delta when
    pose_delta), a[74:77] root linear velocity in the heading frame,
    a[77:80] root angular velocity in the root frame."""
    base_rot = jnp.asarray(cfg.base_rot, qpos.dtype)
    curr_pos, curr_rot = qpos[:3], qpos[3:7]
    if cfg.remove_base:
        curr_rot = quat_mul(curr_rot, quat_inv(base_rot))
    curr_heading = heading_quat(curr_rot)

    body_pose = a[KIN_POSE_START - 2:KIN_QPOS_LM]
    if cfg.pose_delta:
        body_pose = wrap_to_pi(body_pose + qpos[KIN_POSE_START:])

    next_qpos = jnp.concatenate(
        [curr_pos[:2], a[:KIN_POSE_START - 2], body_pose])
    root_qvel = a[KIN_QPOS_LM:]
    linv = quat_rotate(curr_heading, root_qvel[:3])
    next_qpos = next_qpos.at[:2].add(linv[:2] * dt)

    angv = quat_rotate(curr_rot, root_qvel[3:6])
    new_rot = quat_mul(quat_from_rotvec(angv * dt), curr_rot)
    if cfg.remove_base:
        new_rot = quat_mul(new_rot, base_rot)
    return next_qpos.at[3:7].set(quat_normalize(new_rot))


def context_at(context_lib: Dict[str, Any], seq_idx, t):
    """Gather the GT context frame (ar_context access). The library is the
    ordinary expert library (envs/expert.py qpos_fk fields); `ar_qpos` /
    `ar_bquat` fall back to the GT fields when no pretrained-ARNet dump is
    loaded (reference loads them from kin_net rollouts)."""
    frame = H.expert_at(context_lib, seq_idx, t)
    frame.setdefault("ar_qpos", frame["qpos"])
    frame.setdefault("ar_bquat", frame["bquat"])
    return frame


def head_pose_of(context_lib, seq_idx, t):
    """(7,) head pos+quat of the GT context at frame t (ar_context
    head_pose). Kin-stack contexts are SMPL-24 (HEAD_INDEX = 13)."""
    from uhc_tpu.smpl.constants import HEAD_INDEX as hidx

    frame = H.expert_at(context_lib, seq_idx, t)
    wbpos = frame["wbpos"].reshape(-1, 3)
    wbquat = frame["wbquat"].reshape(-1, 4)
    return jnp.concatenate([wbpos[hidx], wbquat[hidx]])


def get_ar_obs_v1(topo: Topology, model: Model, cc_cfg: EnvConfig,
                  state: KinEnvState, context_lib) -> jnp.ndarray:
    """Kin-policy observation (humanoid_kin_v1.py:162 get_ar_obs_v1): sim
    state vs the FK of the GT *next* frame. Same 640-dim layout as obs_v2
    minus shape obs."""
    gt = context_at(context_lib, state.seq_idx,
                    state.start_ind + state.cur_t + 1)
    return ar_obs_from(topo, model, cc_cfg, state.qpos, state.qvel,
                       gt["qpos"])


def ar_obs_from(topo: Topology, model: Model, cc_cfg: EnvConfig,
                qpos, qvel, input_qpos) -> jnp.ndarray:
    """The pure feature function behind get_ar_obs_v1: (sim qpos/qvel,
    target GT frame) -> obs. Shared with KinNet's env-layout supervised
    training (kin_net.KinNetSpecs.env_obs) so the net sees IDENTICAL
    features in supervised pretraining, RL, and eval — the reference's
    KinNet.get_obs (kin_net.py:285) uses a different jpos ravel order and
    frame offset than its own env, so supervised progress there only
    partially transfers to the hierarchical rollout."""
    base_rot = jnp.asarray(cc_cfg.base_rot, qpos.dtype)
    target = qpos_fk_frame(topo, model, input_qpos)
    kin = E.fk(topo, model, qpos)
    obs = []

    # the reference's double linear-velocity transform (:169 then :196)
    qvel = qvel.at[:3].set(transform_vec(qvel[:3], qpos[3:7],
                                         cc_cfg.obs_coord))
    curr_root_quat = quat_mul(qpos[3:7], quat_inv(base_rot))
    hq = heading_quat(curr_root_quat)
    obs.append(hq)

    target_qpos = input_qpos
    target_root_quat = quat_mul(target_qpos[3:7], quat_inv(base_rot))

    qpos_dh = qpos.at[3:7].set(de_heading(curr_root_quat))
    diff_qpos = target_qpos
    diff_qpos = diff_qpos.at[2].add(-qpos_dh[2])
    diff_qpos = diff_qpos.at[7:].add(-qpos_dh[7:])
    diff_qpos = diff_qpos.at[3:7].set(
        quat_mul(target_root_quat, quat_inv(curr_root_quat)))
    obs += [target_qpos[2:], qpos_dh[2:], diff_qpos[2:]]

    qvel = qvel.at[:3].set(transform_vec(qvel[:3], curr_root_quat,
                                         cc_cfg.obs_coord))
    obs.append(qvel if cc_cfg.obs_vel == "full" else qvel[:6])

    rel_h = wrap_to_pi(heading_angle(target_root_quat)
                       - heading_angle(curr_root_quat))
    obs.append(rel_h[None])
    # target_root_quat[:3] read kept for parity (humanoid_kin_v1.py:212)
    rel_pos = target_root_quat[:3] - qpos_dh[:3]
    rel_pos = transform_vec(rel_pos, curr_root_quat, cc_cfg.obs_coord)
    obs.append(rel_pos[:2])

    curr_jpos = kin["xpos"]
    r_jpos = transform_vec(curr_jpos - qpos_dh[None, :3],
                           curr_root_quat[None], cc_cfg.obs_coord)
    obs.append(r_jpos.T.reshape(-1))
    target_jpos = target["wbpos"].reshape(-1, 3)
    diff_jpos = transform_vec(target_jpos - curr_jpos, curr_root_quat[None],
                              cc_cfg.obs_coord)
    obs.append(diff_jpos.T.reshape(-1))

    cur_quat = kin["xquat"]
    target_quat = target["wbquat"].reshape(-1, 4)
    obs.append(quat_mul(quat_inv(hq)[None], cur_quat).reshape(-1))
    obs.append(quat_mul(quat_inv(cur_quat), target_quat).reshape(-1))
    return jnp.concatenate(obs)


def ar_obs_dim(topo: Topology, cc_cfg: EnvConfig) -> int:
    nb, nq, nv = topo.nbody, topo.nq, topo.nv
    vel = nv if cc_cfg.obs_vel == "full" else 6
    return 4 + 3 * (nq - 2) + vel + 3 + 3 * nb * 2 + 4 * nb * 2


def calc_body_diff_sum(topo, model, qpos, tgt_wbpos, jpos_diffw):
    """Weighted SUM of per-body distances (humanoid_kin_v1.py:452 — the kin
    env sums where the copycat env means; threshold 10)."""
    kin = E.fk(topo, model, qpos)
    diff = (kin["xpos"] - tgt_wbpos.reshape(-1, 3)) * jpos_diffw[:, None]
    return jnp.sum(jnp.linalg.norm(diff, axis=1))


def kin_env_step(topo: Topology, model: Model, kin_cfg: KinConfig,
                 cc_cfg: EnvConfig, state: KinEnvState, kin_action,
                 context_lib, cc_policy_fn: Callable, jpos_diffw,
                 rfc_rate=1.0, train: bool = True, obj_model=None):
    """One 30 Hz hierarchical step (humanoid_kin_v1.py:297). Returns
    (state', obs, reward, reward_terms, done)."""
    from uhc_tpu.smpl.constants import head_index
    hidx = head_index(topo)
    from uhc_tpu.rewards.uhm_rewards import get_uhm_reward_fn

    prev_qpos, prev_bquat = state.qpos, H.get_body_quat(state.qpos)
    kin0 = E.fk(topo, model, state.qpos)
    prev_hpos = jnp.concatenate([kin0["xpos"][hidx],
                                 kin0["xquat"][hidx]])

    next_qpos = step_ar(kin_cfg, state.qpos, kin_action)
    target = qpos_fk_frame(topo, model, next_qpos)

    cc_obs = H.get_obs(topo, model, cc_cfg, state, context_lib, tgt=target)
    cc_a = cc_policy_fn(cc_obs)

    if obj_model is not None and state.obj_qpos is not None:
        obj_qvel = (state.obj_qvel if state.obj_qvel is not None
                    else jnp.zeros(state.obj_qpos.shape[:-1] + (6,),
                                   state.qpos.dtype))
        qpos, qvel, obj_qpos, obj_qvel = H.do_simulation(
            topo, model, cc_cfg, state.qpos, state.qvel, cc_a,
            next_qpos[7:], rfc_rate,
            obj=(obj_model, state.obj_qpos, obj_qvel))
        state = dataclasses.replace(
            state, qpos=qpos, qvel=qvel, prev_qpos=prev_qpos,
            prev_bquat=prev_bquat, prev_hpos=prev_hpos,
            target_qpos=next_qpos, cur_t=state.cur_t + 1,
            obj_qpos=obj_qpos, obj_qvel=obj_qvel)
    else:
        qpos, qvel = H.do_simulation(topo, model, cc_cfg, state.qpos,
                                     state.qvel, cc_a, next_qpos[7:],
                                     rfc_rate)
        state = dataclasses.replace(
            state, qpos=qpos, qvel=qvel, prev_qpos=prev_qpos,
            prev_bquat=prev_bquat, prev_hpos=prev_hpos,
            target_qpos=next_qpos, cur_t=state.cur_t + 1)

    # termination: body diff vs own target (>10), + vs GT in train
    jw = jnp.asarray(jpos_diffw, qpos.dtype)
    body_diff = calc_body_diff_sum(topo, model, qpos, target["wbpos"], jw)
    fail = body_diff > 10.0
    if train:
        gt = context_at(context_lib, state.seq_idx,
                        state.start_ind + state.cur_t)
        gt_diff = calc_body_diff_sum(topo, model, qpos, gt["wbpos"], jw)
        fail = fail | (gt_diff > 10.0)
    blown = ~jnp.all(jnp.isfinite(qpos)) | (jnp.max(jnp.abs(qvel)) > 1e4)
    fail = fail | blown

    length = context_lib["len"][state.seq_idx] - 1  # ar_context["len"]
    end = (state.cur_t >= cc_cfg.env_episode_len) | \
          (state.cur_t + state.start_ind >= length)
    done = fail | end
    percent = state.cur_t.astype(qpos.dtype) / length.astype(qpos.dtype)
    state = dataclasses.replace(state, done=done, fail=fail, end=end,
                                percent=percent)

    reward, terms = get_uhm_reward_fn(kin_cfg.reward_id)(
        topo, model, kin_cfg, cc_cfg, state, context_lib)
    obs = get_ar_obs_v1(topo, model, cc_cfg, state, context_lib)
    return state, obs, reward, terms, done


def kin_env_reset(topo: Topology, model: Model, kin_cfg: KinConfig, rng,
                  seq_idx, context_lib, use_gt_init: bool = True,
                  dynamic_obj: bool = False):
    """reset_model (humanoid_kin_v1.py:379): start from the context's init
    frame (GT frame 0 unless an ARNet init_qpos was loaded)."""
    zero = jnp.zeros((), jnp.int32)
    frame0 = context_at(context_lib, seq_idx, zero)
    init_qpos = frame0["ar_qpos"] if not use_gt_init else frame0["qpos"]
    init_qvel = frame0["qvel"]
    kin = E.fk(topo, model, init_qpos)
    from uhc_tpu.smpl.constants import head_index
    hidx = head_index(topo)

    hpos = jnp.concatenate([kin["xpos"][hidx],
                            kin["xquat"][hidx]])
    return KinEnvState(
        qpos=init_qpos, qvel=init_qvel, prev_qpos=init_qpos,
        prev_bquat=H.get_body_quat(init_qpos), prev_hpos=hpos,
        target_qpos=init_qpos, cur_t=zero, start_ind=zero,
        seq_idx=jnp.asarray(seq_idx, jnp.int32),
        done=jnp.zeros((), bool), fail=jnp.zeros((), bool),
        end=jnp.zeros((), bool), percent=jnp.zeros((), init_qpos.dtype),
        rng=rng,
        # object free-joint pose at the context start frame
        # (humanoid_kin_v1.py:477 get_obj_qpos)
        obj_qpos=frame0.get("obj_pose"),
        obj_qvel=(jnp.zeros(frame0["obj_pose"].shape[:-1] + (6,),
                            init_qpos.dtype)
                  if dynamic_obj and frame0.get("obj_pose") is not None
                  else None),
    )
