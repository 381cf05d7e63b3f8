"""Supervised kinematic losses — uhc/losses/loss_function.py twin
(reference :96-202). All functions take (..., D) batched arrays and return a
per-sample loss of shape (...,); compose/means happen at the call site, as
in KinNet.compute_loss (kin_net.py:721-781).

qpos layout: [trans(3), root quat(4), 23×3 euler] — so
get_root_pos = [:, :3], get_root_quat = [:, 3:7], get_body_rot = [:, 7:].
"""
from __future__ import annotations

import jax.numpy as jnp

from uhc_tpu.maths import quat_inv, quat_mul


def quat_diff(gt_quat, pred_quat):
    """Relative quaternion gt ⊗ pred⁻¹ (math quat_diff_batch)."""
    return quat_mul(gt_quat, quat_inv(pred_quat))


def orientation_loss(gt_quat, pred_quat):
    """‖|q_rel| − identity‖² (loss_function.py:105)."""
    dist = quat_diff(gt_quat, pred_quat)
    iden = jnp.zeros_like(dist).at[..., 0].set(1.0)
    return jnp.sum((jnp.abs(dist) - iden) ** 2, axis=-1)


def pose_rot_loss(gt_pose, pred_pose):
    """Squared euler-angle body-pose error (loss_function.py:112)."""
    return jnp.sum((gt_pose[..., 7:] - pred_pose[..., 7:]) ** 2, axis=-1)


def root_pos_loss(gt_pose, pred_pose):
    return jnp.sum((gt_pose[..., :3] - pred_pose[..., :3]) ** 2, axis=-1)


def root_orientation_loss(gt_pose, pred_pose):
    return orientation_loss(gt_pose[..., 3:7], pred_pose[..., 3:7])


def end_effector_pos_loss(gt_pos, pred_pos):
    # reference flattens everything past the batch axis before summing
    # (loss_function.py:139 `.reshape(gt_pos.shape[0], -1)`), so a
    # (B, n_ee, 3) input yields one scalar per batch row
    d = (gt_pos - pred_pos).reshape(gt_pos.shape[0], -1)
    return jnp.sum(d ** 2, axis=-1)


def position_loss(gt_pos, pred_pos):
    return jnp.sum((gt_pos - pred_pos) ** 2, axis=-1)


def action_loss(gt_action, pred_action):
    return jnp.sum((gt_action - pred_action) ** 2, axis=-1)


def velocity_distance_loss(gt_vel, pred_vel):
    return jnp.sum((gt_vel - pred_vel) ** 2, axis=-1)


def linear_velocity_loss(gt_vel, pred_vel):
    return jnp.sum((gt_vel[..., :3] - pred_vel[..., :3]) ** 2, axis=-1)


def angular_velocity_loss(gt_vel, pred_vel):
    return jnp.sum((gt_vel[..., 3:6] - pred_vel[..., 3:6]) ** 2, axis=-1)


def deep_mimic_loss(gt_pose, pred_pose, gt_vel, pred_vel, w):
    """loss_function.py:160 DeepMimicLoss. `w` is a mapping with keys
    w_p/w_vl/w_va/w_ee/w_rp/w_rr."""
    rp = root_pos_loss(gt_pose, pred_pose)
    rr = root_orientation_loss(gt_pose, pred_pose)
    p = pose_rot_loss(gt_pose, pred_pose)
    vl = linear_velocity_loss(gt_vel, pred_vel)
    va = angular_velocity_loss(gt_vel, pred_vel)
    loss = (w["w_rp"] * rp + w["w_rr"] * rr + w["w_p"] * p
            + w["w_vl"] * vl + w["w_va"] * va)
    terms = [jnp.mean(rp), jnp.mean(rr), jnp.mean(p), jnp.mean(vl),
             jnp.mean(va), jnp.zeros(())]
    return jnp.mean(loss), terms


def traj_loss(gt_pose, pred_pose, gt_vel, pred_vel, w):
    """loss_function.py:181 TrajLoss (DeepMimic minus the pose term)."""
    rp = root_pos_loss(gt_pose, pred_pose)
    rr = root_orientation_loss(gt_pose, pred_pose)
    vl = linear_velocity_loss(gt_vel, pred_vel)
    va = angular_velocity_loss(gt_vel, pred_vel)
    loss = w["w_rp"] * rp + w["w_rr"] * rr + w["w_vl"] * vl + w["w_va"] * va
    terms = [jnp.mean(rp), jnp.mean(rr), jnp.zeros(()), jnp.mean(vl),
             jnp.mean(va), jnp.zeros(())]
    return jnp.mean(loss), terms


def pose_loss_masked(gt_pose, pred_pose, ofpos: int = 7):
    """loss_function.py:198 PoseLoss — note the reference sets the mask to
    zero everywhere (mask[:, 0:ofpos] = 0.0 on an all-zero mask), making
    this identically 0 — replicated faithfully."""
    mask = jnp.zeros_like(pred_pose)
    mask = mask.at[..., 0:ofpos].set(0.0)
    diff = (gt_pose - pred_pose) * mask
    return jnp.mean(jnp.sum(diff ** 2, axis=-1))
