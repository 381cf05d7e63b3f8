"""Expert motion featurization — the `Humanoid.qpos_fk` twin.

Precomputes, per reference-motion frame, every feature the env/reward reads
(reference uhc/smpllib/torch_smpl_humanoid.py:155 qpos_fk return dict):
qpos, qvel (finite-difference, clipped ±10), world body pos/quats, local
body quats, body COMs, root linear/angular velocities, per-body angular
velocities, end-effector positions, COM, and the height lower bound used by
root-height termination.

Runs as one vmapped FK over all frames on device; an entire motion library
becomes a stacked, padded array pytree that rollouts gather from with no
host involvement.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from uhc_tpu.maths import (
    angvel_fd,
    quat_from_euler_zyx,
    qvel_fd,
    qvel_fd_ball,
    transform_vec,
)
from uhc_tpu.physics import engine as E
from uhc_tpu.physics.model import Model, Topology
from uhc_tpu.smpl.constants import ee_indices, head_index


def qpos_fk(topo: Topology, model: Model, qpos_seq: jnp.ndarray, fps: float = 30.0):
    """(T, nq) -> expert feature dict of (T, ...) arrays."""
    qpos_seq = jnp.asarray(qpos_seq)
    T = qpos_seq.shape[0]
    dt = 1.0 / fps

    ee_idx = ee_indices(topo)
    head_idx = head_index(topo)
    kin = jax.vmap(lambda q: E.fk(topo, model, q))(qpos_seq)
    wbpos = kin["xpos"]            # (T, nb, 3)
    wbquat = kin["xquat"]          # (T, nb, 4)
    body_com = kin["xipos"]        # (T, nb, 3)

    ball = topo.joint_kind == "ball"
    if ball:
        joint_quats = qpos_seq[:, 7:].reshape(T, -1, 4)
    else:
        joint_quats = quat_from_euler_zyx(qpos_seq[:, 7:].reshape(T, -1, 3))
    bquat = jnp.concatenate([qpos_seq[:, None, 3:7], joint_quats], axis=1)

    if T > 1:
        fd = qvel_fd_ball if ball else qvel_fd
        qvel = fd(qpos_seq[:-1], qpos_seq[1:], dt)
        qvel = jnp.concatenate([qvel[0:1], qvel], axis=0)
    else:
        qvel = jnp.zeros((1, topo.nv), qpos_seq.dtype)
    qvel = jnp.clip(qvel, -10.0, 10.0)

    if T > 1:
        bang = angvel_fd(bquat[:-1].reshape(T - 1, -1),
                         bquat[1:].reshape(T - 1, -1), dt)
        bang = jnp.concatenate([bang[0:1], bang], axis=0)
    else:
        bang = jnp.zeros((1, topo.nbody * 3), qpos_seq.dtype)

    ee_wpos = wbpos[:, ee_idx]                       # (T, 5, 3)
    root_q = qpos_seq[:, 3:7]
    ee_rel = ee_wpos - wbpos[:, 0:1]
    ee_pos = transform_vec(ee_rel, root_q[:, None], "root")

    rlinv = qvel[:, 0:3]
    rlinv_local = transform_vec(rlinv, root_q, "root")

    return {
        "qpos": qpos_seq,
        "qvel": qvel,
        "wbpos": wbpos.reshape(T, -1),
        "wbquat": wbquat.reshape(T, -1),
        "bquat": bquat.reshape(T, -1),
        "body_com": body_com.reshape(T, -1),
        "rlinv": rlinv,
        "rlinv_local": rlinv_local,
        "rangv": qvel[:, 3:6],
        "bangvel": bang,
        "ee_wpos": ee_wpos.reshape(T, -1),
        "ee_pos": ee_pos.reshape(T, -1),
        "com": body_com[:, 0],
        "head_pos": wbpos[:, head_idx],
        "height_lb": jnp.min(qpos_seq[:, 2]),
        "head_height_lb": jnp.min(wbpos[:, head_idx, 2]),
        "len": T,
    }

def qpos_fk_frame(topo: Topology, model: Model, qpos: jnp.ndarray):
    """Single-frame FK target dict (numpy_smpl_humanoid.Humanoid.qpos_fk on
    one pose, as used by HumanoidKinEnv.step, humanoid_kin_v1.py:307).
    Velocity fields are zero (no previous frame)."""
    kin = E.fk(topo, model, qpos)
    joint_quats = quat_from_euler_zyx(qpos[7:].reshape(-1, 3))
    bquat = jnp.concatenate([qpos[None, 3:7], joint_quats], axis=0)
    ee_wpos = kin["xpos"][ee_indices(topo)]
    return {
        "qpos": qpos,
        "wbpos": kin["xpos"].reshape(-1),
        "wbquat": kin["xquat"].reshape(-1),
        "bquat": bquat.reshape(-1),
        "body_com": kin["xipos"].reshape(-1),
        "ee_wpos": ee_wpos.reshape(-1),
        "head_pose": jnp.concatenate([kin["xpos"][head_index(topo)],
                                      kin["xquat"][head_index(topo)]]),
    }
