"""Batched SMPL-side FK with camera-projection fitting losses —
uhc/smpllib/np_smpl_humanoid_batch.py Humanoid_Batch twin (the embodiedpose
2D-keypoint fitting machinery).

The reference differentiates its numpy FK with the `autograd` package and
runs L-BFGS per frame; here everything is JAX, so `jax.grad(proj_2d_loss)`
is free, `vmap` batches over frames/subjects, and the losses jit.

Layout notes (reference :102-157): FK runs in MuJoCo body order over
per-body offsets derived from the shaped SMPL joints; `proj2d` maps MuJoCo
bodies -> SMPL joints -> the OpenPose subset, projects with the full-frame
camera (R, t, K), then merges to the 14-point OP skeleton via
`smpl_op_to_op` (:31).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from uhc_tpu.maths import quat_from_rotvec, quat_mul, quat_rotate
from uhc_tpu.smpl.constants import MUJOCO_PARENTS, MUJOCO_2_SMPL, SMPL_2_MUJOCO


def smpl_op_to_op(j2d: jnp.ndarray) -> jnp.ndarray:
    """Merge the OpenPose-25-style subset to the 14-point OP skeleton
    (np_smpl_humanoid_batch.py:31)."""
    return jnp.concatenate([
        jnp.mean(j2d[..., jnp.array([1, 4]), :], axis=-2, keepdims=True),
        j2d[..., 1:7, :],
        jnp.mean(j2d[..., jnp.array([7, 8, 11]), :], axis=-2, keepdims=True),
        j2d[..., 9:11, :],
        j2d[..., 12:, :],
    ], axis=-2)


def normalize_screen_coordinates(x, w: float = 1920, h: float = 1080):
    """[0,w]x[0,h] -> [-1,1] x aspect-preserving (:41)."""
    return x / w * 2 - jnp.asarray([1.0, h / w], x.dtype)


def fk_batch(offsets: jnp.ndarray, pose_aa: jnp.ndarray,
             trans: jnp.ndarray, count_offset: bool = True):
    """FK over MuJoCo-ordered per-body offsets.

    offsets: (24, 3) local body offsets (mujoco order — e.g. from
    uhc_tpu.smpl.lbs.mujoco_offsets_from_betas); pose_aa: (..., 72)
    axis-angle in SMPL order; trans: (..., 3) root translation.
    Returns {"wbpos": (..., 24, 3), "wbquat": (..., 24, 4)}
    (fk_batch :306 / forward_kinematics_batch :367, quats instead of
    matrices — same rotations, cheaper composition on TPU)."""
    aa = pose_aa.reshape(pose_aa.shape[:-1] + (24, 3))
    quats = quat_from_rotvec(aa)[..., np.asarray(SMPL_2_MUJOCO), :]
    root = trans + (offsets[0] if count_offset else 0.0)

    parents = np.asarray(MUJOCO_PARENTS)
    gq = [None] * 24
    gp = [None] * 24
    gq[0] = quats[..., 0, :]
    gp[0] = root
    for i in range(1, 24):
        p = int(parents[i])
        gp[i] = gp[p] + quat_rotate(gq[p], jnp.broadcast_to(
            offsets[i], gp[p].shape))
        gq[i] = quat_mul(gq[p], quats[..., i, :])
    return {"wbpos": jnp.stack(gp, axis=-2), "wbquat": jnp.stack(gq, axis=-2)}


@dataclasses.dataclass
class CameraFit:
    """Projection state (update_projection/update_tgt_joints,
    :196-226) + the fitting losses. All losses take `input_vec`
    (..., 75) = [trans(3), pose_aa(72)] so jax.grad drives the same
    optimization the reference runs through autograd+L-BFGS."""

    offsets: Any                 # (24, 3) mujoco-order body offsets
    full_R: Any                  # (3, 3)
    full_t: Any                  # (3,)
    K: Any                       # (3, 3)
    img_w: float
    img_h: float
    smpl2op_map: Any             # (J_op,) SMPL joint -> OP index map
    gt_2d_joints: Any = None     # (T, J2d, 2)
    inliers: Any = None          # (T, J2d, 2) bool
    weighting: Any = None        # (T, J2d, 2) exp-decay frame weights

    def __post_init__(self):
        m = np.asarray(self.smpl2op_map)
        self.smpl2op_partial = jnp.asarray(m[m < 22])

    def update_tgt_joints(self, tgt_joints, inliers, lam: float = 0.3):
        self.gt_2d_joints = jnp.asarray(tgt_joints)
        self.inliers = jnp.asarray(inliers, bool)
        T, J = tgt_joints.shape[0], tgt_joints.shape[-2]
        w = np.exp(lam * -np.arange(T))
        w = w / w.sum()
        self.weighting = jnp.asarray(
            np.tile(w[:, None, None], [1, J, 2]))
        self.gt_2d_norm = normalize_screen_coordinates(
            self.gt_2d_joints, self.img_w, self.img_h)
        rays = jnp.concatenate(
            [self.gt_2d_joints, jnp.ones((T, J, 1))], axis=2) \
            @ jnp.linalg.inv(jnp.asarray(self.K)).T
        self.camera_rays = rays / jnp.linalg.norm(rays, axis=2,
                                                  keepdims=True)

    # -- projection ----------------------------------------------------------
    def proj2d(self, wbpos, return_cam_3d: bool = False):
        """(..., 24, 3) mujoco bodies -> (..., 14, 2) OP pixels (:227)."""
        j3d = wbpos[..., np.asarray(MUJOCO_2_SMPL), :]
        j3d = jnp.take(j3d, self.smpl2op_partial, axis=-2)
        cam = j3d @ jnp.asarray(self.full_R).T + jnp.asarray(self.full_t)
        j2d = cam @ jnp.asarray(self.K).T
        j2d = j2d[..., :2] / j2d[..., 2:]
        j2d = smpl_op_to_op(j2d)
        return (j2d, cam) if return_cam_3d else j2d

    def _fk(self, input_vec):
        trans, pose = input_vec[..., :3], input_vec[..., 3:]
        return fk_batch(self.offsets, pose, trans)["wbpos"]

    # -- losses (:244-304) ----------------------------------------------------
    def proj_2d_loss(self, input_vec, ord: int = 2, normalize: bool = True):
        j2d = self.proj2d(self._fk(input_vec))
        if normalize:
            pred = normalize_screen_coordinates(j2d, self.img_w, self.img_h)
            gt = self.gt_2d_norm
        else:
            pred, gt = j2d, self.gt_2d_joints
        if ord == 1:
            return jnp.mean(jnp.abs((gt - pred) * self.inliers))
        w = self.weighting * self.inliers
        return jnp.mean(jnp.sum((gt - pred) ** 2 * w, axis=0))

    def proj_2d_body_loss(self, input_vec, ord: int = 2,
                          normalize: bool = False):
        """Root-centred variant: snap the prediction to the GT mid-hip
        before comparing (:272)."""
        j2d = self.proj2d(self._fk(input_vec))
        center = self.gt_2d_joints[..., 7:8, :]
        j2d = j2d + (center - j2d[..., 7:8, :])
        if normalize:
            pred = normalize_screen_coordinates(j2d, self.img_w, self.img_h)
            gt = self.gt_2d_norm
        else:
            pred, gt = j2d, self.gt_2d_joints
        if ord == 1:
            return jnp.mean(jnp.abs((gt - pred) * self.inliers))
        w = self.weighting * self.inliers
        return jnp.mean(jnp.sum((gt - pred) ** 2 * w, axis=0))

    def proj_2d_root_loss(self, root_pos_rot):
        """Mid-hip-only loss over the 6-dim root (:297)."""
        input_vec = jnp.concatenate(
            [root_pos_rot.reshape(1, 6), jnp.zeros((1, 69))], axis=1)
        j2d = self.proj2d(self._fk(input_vec))
        return jnp.mean(jnp.abs(self.gt_2d_joints[..., 7:8, :]
                                - j2d[..., 7:8, :]))

    def proj_2d_line_loss(self, input_vec):
        """Distance of camera-space joints to the GT pixel rays (:244 —
        requires gt joints and the projected subset to share a joint
        count, as in the reference)."""
        _, cam = self.proj2d(self._fk(input_vec), return_cam_3d=True)
        dist = jnp.cross(cam, cam - self.camera_rays) ** 2
        return jnp.mean(dist)
