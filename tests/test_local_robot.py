"""smpl_local_robot / smpl_cap_robot option family as array transforms
(reference smpl_local_robot.py:1136, smpl_cap_robot.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.config.config import EnvConfig
from uhc_tpu.data.dataset import build_expert_library
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.local_robot import (big_ankle_model, box_feet_model,
                                      capsule_model, remove_toe_model,
                                      upright_start_model)
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


@pytest.fixture(scope="module")
def base():
    return load_mjcf_humanoid(XML)


def test_upright_start(base):
    topo, model = base
    up = upright_start_model(model)
    # base_rot = 90 deg about x: y -> z
    bp = np.asarray(model.body_pos)
    ub = np.asarray(up.body_pos)
    i = topo.body_names.index("Head")
    np.testing.assert_allclose(np.linalg.norm(ub[i]),
                               np.linalg.norm(bp[i]), rtol=1e-5)
    assert not np.allclose(ub[i], bp[i])


def test_big_ankle_and_box_feet(base):
    topo, model = base
    big = big_ankle_model(topo, model, 1.5)
    ia = topo.body_names.index("L_Ankle")
    ih = topo.body_names.index("L_Hip")
    np.testing.assert_allclose(np.asarray(big.contact_point)[ia],
                               np.asarray(model.contact_point)[ia] * 1.5)
    np.testing.assert_allclose(np.asarray(big.contact_point)[ih],
                               np.asarray(model.contact_point)[ih])
    box = box_feet_model(topo, model)
    assert np.asarray(box.contact_mask)[ia].sum() == 8
    pts = np.asarray(box.contact_point)[ia][:8]
    orig = np.asarray(model.contact_point)[ia][
        np.asarray(model.contact_mask)[ia] > 0]
    np.testing.assert_allclose(pts.min(0), orig.min(0), atol=1e-6)
    np.testing.assert_allclose(pts.max(0), orig.max(0), atol=1e-6)


def test_capsule_model(base):
    topo, model = base
    cap = capsule_model(topo, model)
    assert np.all(np.asarray(cap.contact_mask).sum(-1) == 2)


@pytest.mark.slow
def test_remove_toe_steps(base):
    topo, model = base
    topo2, model2 = remove_toe_model(topo, model)
    assert topo2.nbody == 22
    assert "L_Toe" not in topo2.body_names
    # ankle keeps total foot mass and gains toe support points
    ia, it = topo.body_names.index("L_Ankle"), topo.body_names.index("L_Toe")
    ia2 = topo2.body_names.index("L_Ankle")
    assert float(np.asarray(model2.body_mass)[ia2]) == pytest.approx(
        float(np.asarray(model.body_mass)[ia])
        + float(np.asarray(model.body_mass)[it]), rel=1e-5)
    assert (np.asarray(model2.contact_mask)[ia2].sum()
            >= np.asarray(model.contact_mask)[ia].sum())

    # the reduced tree steps (generic-topology path; default gains pad)
    model2 = model_to_dtype(model2, jnp.float32)
    import joblib
    neutral = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
    T = 8
    pose = np.asarray(neutral["pose_aa"])[:T]
    seqs = {"stand": {"pose_aa": pose, "trans": None}}
    # 22-body tree: drop the toe dofs from the smpl pose via qpos transform
    from uhc_tpu.smpl.converter import SMPLConverter
    conv = SMPLConverter(topo, topo2, smpl_model="smpl")
    lib, _ = build_expert_library(
        topo2, model2, seqs, converter=conv,
        base_root_offset=np.asarray(model.body_pos)[0])
    cfg = EnvConfig(meta_pd=True, residual_force=False, reactive_v=0,
                    env_init_noise=0.0)
    ndof, vf, meta = H.action_dims(topo2, cfg)
    state = H.env_reset(topo2, model2, cfg, jax.random.PRNGKey(0),
                        jnp.zeros((), jnp.int32), lib, lib["qpos"][0, 0],
                        lib["qvel"][0, 0], train=False)
    jpw = jnp.asarray(conv.get_new_diff_weight().astype(np.float32))
    state2, obs, reward, terms, done = H.env_step(
        topo2, model2, cfg, state, jnp.zeros(ndof + vf + meta), lib,
        jpw, jpw[1:], train=False)
    assert bool(jnp.all(jnp.isfinite(state2.qpos)))
    assert float(state2.qpos[2]) > 0.5
