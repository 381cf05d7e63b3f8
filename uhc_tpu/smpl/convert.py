"""SMPL pose <-> MuJoCo-layout qpos conversion (JAX).

Twin of reference uhc/smpllib/smpl_mujoco.py:543 `smpl_to_qpose` /
:738 `qpos_to_smpl`, without the torch/scipy round-trips: axis-angle ->
quaternion -> intrinsic-ZYX euler entirely in JAX so it can run on device
and under vmap for whole motion libraries at once.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from uhc_tpu.maths import (
    euler_zyx_from_quat,
    quat_from_rotvec,
    quat_to_rotvec,
)
from uhc_tpu.smpl.constants import MUJOCO_2_SMPL, SMPL_2_MUJOCO

DEFAULT_Z = 0.91437225  # reference smpl_mujoco.py:561 default standing height


def smpl_to_qpose(pose_aa, root_offset, trans=None, count_offset=True):
    """(T, 72) SMPL axis-angle + (T, 3) trans -> (T, 76) qpos.

    `root_offset` is mj body_pos[1] (the Pelvis zero-pose offset) used when
    count_offset=True (smpl_mujoco.py:603-605).
    """
    pose_aa = jnp.asarray(pose_aa)
    T = pose_aa.shape[0]
    if trans is None:
        trans = jnp.zeros((T, 3)).at[:, 2].set(DEFAULT_Z)
    trans = jnp.asarray(trans).reshape(T, 3)
    aa = pose_aa.reshape(T, 24, 3)
    quats = quat_from_rotvec(aa)                      # (T,24,4)
    quats = quats[:, np.asarray(SMPL_2_MUJOCO)]       # mujoco body order
    root_quat = quats[:, 0]
    eulers = euler_zyx_from_quat(quats[:, 1:])        # (T,23,3) [z,y,x]
    pos = trans + jnp.asarray(root_offset) if count_offset else trans
    return jnp.concatenate(
        [pos, root_quat, eulers.reshape(T, -1)], axis=1)


def smpl_to_qpose_ball(pose_aa, root_offset, trans=None, count_offset=True):
    """(T, 72) SMPL axis-angle -> (T, 99) ball-joint qpos: trans + root quat
    + one quaternion per joint in mujoco body order (the reference's
    smpl_to_qpose(..., use_quat=True) layout, smpl_mujoco.py:543 +
    humanoid_im.py:193)."""
    pose_aa = jnp.asarray(pose_aa)
    T = pose_aa.shape[0]
    if trans is None:
        trans = jnp.zeros((T, 3)).at[:, 2].set(DEFAULT_Z)
    trans = jnp.asarray(trans).reshape(T, 3)
    aa = pose_aa.reshape(T, 24, 3)
    quats = quat_from_rotvec(aa)                      # (T,24,4)
    quats = quats[:, np.asarray(SMPL_2_MUJOCO)]       # mujoco body order
    pos = trans + jnp.asarray(root_offset) if count_offset else trans
    return jnp.concatenate(
        [pos, quats[:, 0], quats[:, 1:].reshape(T, -1)], axis=1)


def qpos_ball_to_smpl(qpos, root_offset):
    """(T, 99) ball qpos -> ((T, 24, 3) SMPL axis-angle, (T, 3) trans)."""
    qpos = jnp.asarray(qpos)
    T = qpos.shape[0]
    trans = qpos[:, :3] - jnp.asarray(root_offset)
    quats = jnp.concatenate(
        [qpos[:, None, 3:7], qpos[:, 7:].reshape(T, -1, 4)], axis=1)
    rv = quat_to_rotvec(quats)                         # mujoco order
    return rv[:, np.asarray(MUJOCO_2_SMPL)], trans


def qpos_to_smpl(qpos, root_offset):
    """(T, 76) qpos -> ((T, 24, 3) SMPL axis-angle, (T, 3) trans)."""
    qpos = jnp.asarray(qpos)
    T = qpos.shape[0]
    trans = qpos[:, :3] - jnp.asarray(root_offset)
    root_rv = quat_to_rotvec(qpos[:, 3:7])
    from uhc_tpu.maths import quat_from_euler_zyx

    jq = quat_from_euler_zyx(qpos[:, 7:].reshape(T, 23, 3))
    rv = quat_to_rotvec(jq)                            # (T,23,3) mujoco order
    full = jnp.concatenate([root_rv[:, None], rv], axis=1)  # mujoco order
    return full[:, np.asarray(MUJOCO_2_SMPL)], trans
