"""SMPL layer tests: pose<->qpos roundtrip, LBS consistency, shape-model
building (synthetic SMPL data; real model files are user-supplied)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.smpl import lbs as L
from uhc_tpu.smpl.constants import MUJOCO_PARENTS, SMPL_2_MUJOCO
from uhc_tpu.smpl.convert import qpos_to_smpl, smpl_to_qpose

RNG = np.random.default_rng(0)


def test_smpl_qpos_roundtrip():
    T = 7
    pose = RNG.normal(scale=0.4, size=(T, 72)).astype(np.float32)
    trans = RNG.normal(size=(T, 3)).astype(np.float32)
    root_off = np.array([0.1, -0.2, 0.05], np.float32)
    qpos = smpl_to_qpose(pose, root_off, trans)
    assert qpos.shape == (T, 76)
    pose2, trans2 = qpos_to_smpl(qpos, root_off)
    np.testing.assert_allclose(np.asarray(trans2), trans, atol=1e-5)
    # axis-angle roundtrip up to 2π ambiguity: compare rotations
    from scipy.spatial.transform import Rotation as sRot

    r1 = sRot.from_rotvec(pose.reshape(-1, 3))
    r2 = sRot.from_rotvec(np.asarray(pose2).reshape(-1, 3))
    ang = (r1.inv() * r2).magnitude()
    assert ang.max() < 1e-4


def test_lbs_zero_pose_identity():
    data = L.synthetic_smpl_data()
    betas = jnp.zeros(16)
    verts, joints = L.lbs(data, jnp.zeros((24, 3)), betas)
    np.testing.assert_allclose(np.asarray(verts), np.asarray(data.v_template),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(joints),
                               np.asarray(L.shaped_joints(data, betas)),
                               atol=1e-5)


def test_lbs_global_rotation():
    """Rotating only the root rotates everything rigidly about the root."""
    data = L.synthetic_smpl_data()
    betas = jnp.zeros(16)
    pose = jnp.zeros((24, 3)).at[0].set(jnp.asarray([0.0, 0.0, np.pi / 2]))
    verts, joints = L.lbs(data, pose, betas)
    from scipy.spatial.transform import Rotation as sRot

    R = sRot.from_rotvec([0, 0, np.pi / 2]).as_matrix()
    j0 = np.asarray(L.shaped_joints(data, betas))
    want = (np.asarray(data.v_template) - j0[0]) @ R.T + j0[0]
    np.testing.assert_allclose(np.asarray(verts), want, atol=1e-4)


def test_shape_model_building():
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
    from uhc_tpu.smpl.robot import batched_models, model_from_betas

    topo, base = load_mjcf_humanoid(
        "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml")
    base = model_to_dtype(base, jnp.float32)
    data = L.synthetic_smpl_data()
    assign = L.vertex_body_assignment(data)
    assert assign.shape == (512,) and assign.max() < 24

    m = model_from_betas(topo, base, data, jnp.zeros(16), assign)
    # zero betas: scales are 1, offsets come from the synthetic regressor
    np.testing.assert_allclose(np.asarray(m.body_mass),
                               np.asarray(base.body_mass), rtol=1e-4)

    B = 4
    betas = jnp.asarray(RNG.normal(scale=0.5, size=(B, 16)), jnp.float32)
    mb = batched_models(topo, base, data, betas, assign)
    assert mb.body_pos.shape == (B, 24, 3)
    assert mb.body_mass.shape == (B, 24)
    assert bool(jnp.all(jnp.isfinite(mb.body_inertia)))
    assert bool(jnp.all(mb.body_mass > 0))
