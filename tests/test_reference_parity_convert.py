"""smpl_to_qpose parity vs the REFERENCE'S OWN conversion code.

uhc/smpllib/smpl_mujoco.py cannot import wholesale (glfw/mujoco_py/skimage)
but `smpl_to_qpose` itself only needs numpy/torch/scipy + the reference's
torch_geometry_transforms (which imports cleanly) + the SMPL bone order and
the mujoco body/qpos addressing. We surgically exec the function source in
a namespace that supplies exactly those — so the executed algorithm
(axis-angle -> rotation matrices -> intrinsic-ZYX eulers, smpl->mujoco
joint remap, root quat, body-offset translation) is the reference's,
line for line."""
import ast
import sys
import types

import numpy as np
import pytest

import jax

sys.path.append("/root/reference")

torch = pytest.importorskip("torch")
tgt = pytest.importorskip("uhc.utils.torch_geometry_transforms")
from scipy.spatial.transform import Rotation as sRot

from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.constants import SMPL_BONE_ORDER_NAMES
from uhc_tpu.smpl.convert import smpl_to_qpose as ours_smpl_to_qpose
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
SRC = "/root/reference/uhc/smpllib/smpl_mujoco.py"


def _load_reference_fn():
    tree = ast.parse(open(SRC).read())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "smpl_to_qpose")
    code = compile(ast.Module(body=[fn], type_ignores=[]), SRC, "exec")
    ns = {
        "np": np, "torch": torch, "sRot": sRot,
        "SMPL_BONE_ORDER_NAMES": list(SMPL_BONE_ORDER_NAMES),
        "angle_axis_to_rotation_matrix": tgt.angle_axis_to_rotation_matrix,
        "rotation_matrix_to_quaternion": tgt.rotation_matrix_to_quaternion,
    }
    exec(code, ns)
    return ns


def test_smpl_to_qpose_matches_reference():
    topo, model = load_mjcf_humanoid(XML)
    import jax.numpy as jnp
    model = model_to_dtype(model, jnp.float32)

    ns = _load_reference_fn()
    # the reference derives the smpl->mujoco joint order from the MjModel's
    # body/qpos addressing; our Topology carries the same body order
    qaddr = {name: None for name in topo.body_names}
    ns["get_body_qposaddr"] = lambda m: qaddr
    root_offset = np.asarray(jax.device_get(model.body_pos))[0] \
        if np.asarray(model.body_pos).ndim == 2 else \
        np.asarray(jax.device_get(model.body_pos))[0]
    mj_model = types.SimpleNamespace(body_pos=np.vstack(
        [np.zeros(3), root_offset]))

    rng = np.random.RandomState(9)
    T = 7
    pose_aa = (rng.randn(T, 72) * 0.4).astype(np.float64)
    trans = rng.randn(T, 3).astype(np.float64)

    ref_qpos = ns["smpl_to_qpose"](pose_aa.copy(), mj_model,
                                   trans=trans.copy())
    our_qpos, our_trans_off = None, None
    q = np.asarray(jax.device_get(
        ours_smpl_to_qpose(jnp.asarray(pose_aa, jnp.float32),
                           model.body_pos[0]
                           if np.asarray(model.body_pos).ndim == 2
                           else model.body_pos[0],
                           jnp.asarray(trans, jnp.float32))))

    assert q.shape == ref_qpos.shape == (T, 76)
    # trans + root offset
    np.testing.assert_allclose(q[:, :3], ref_qpos[:, :3], atol=1e-5)
    # root quat (sign-free)
    for t in range(T):
        d = min(np.abs(q[t, 3:7] - ref_qpos[t, 3:7]).max(),
                np.abs(q[t, 3:7] + ref_qpos[t, 3:7]).max())
        assert d < 1e-5
    # joint eulers (ZYX intrinsic, smpl->mujoco order)
    np.testing.assert_allclose(q[:, 7:], ref_qpos[:, 7:], atol=1e-5)


def test_qpos_to_smpl_matches_reference():
    """Inverse conversion: exec the reference's qpos_to_smpl (euler-ZYX ->
    rotvec per bone, mujoco->smpl reorder, offset-removed trans)."""
    import jax.numpy as jnp

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)

    tree = ast.parse(open(SRC).read())
    fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
              and n.name == "qpos_to_smpl")
    ns = {"np": np, "sRot": sRot,
          "SMPL_BONE_ORDER_NAMES": list(SMPL_BONE_ORDER_NAMES),
          "SMPLH_BONE_ORDER_NAMES": []}
    qaddr = {"Pelvis": (0, 7)}
    for i, name in enumerate(topo.body_names[1:]):
        qaddr[name] = (7 + 3 * i, 7 + 3 * (i + 1))
    ns["get_body_qposaddr"] = lambda m: qaddr
    exec(compile(ast.Module(body=[fn], type_ignores=[]), SRC, "exec"), ns)

    root_offset = np.asarray(jax.device_get(model.body_pos))[0]
    mj_model = types.SimpleNamespace(
        body_pos=np.vstack([np.zeros(3), root_offset]))

    rng = np.random.RandomState(13)
    T = 6
    qpos = rng.randn(T, 76)
    qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=1, keepdims=True)
    qpos[:, 7:] = np.clip(qpos[:, 7:], -1.3, 1.3)

    ref_pose, ref_trans = ns["qpos_to_smpl"](qpos.copy(), mj_model)

    from uhc_tpu.smpl.convert import qpos_to_smpl as ours
    import jax.numpy as jnp
    aa, trans = ours(jnp.asarray(qpos, jnp.float32),
                     jnp.asarray(root_offset))
    aa = np.asarray(jax.device_get(aa))
    np.testing.assert_allclose(np.asarray(jax.device_get(trans)),
                               ref_trans, atol=1e-5)
    # rotvec comparison: v and the 2pi-complement represent the same
    # rotation; inputs here stay under pi so direct comparison holds
    np.testing.assert_allclose(aa, ref_pose, atol=1e-4)
