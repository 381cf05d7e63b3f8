"""Masterfoot / bigfoot foot-model variants (VERDICT round-1 item 5).
Reference: smpl_robot.py:1336 add_masterfoot, config/masterfoot/*.yml,
config/bigfoot/*.yml."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.config.config import Config, EnvConfig
from uhc_tpu.data.dataset import build_expert_library
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.masterfoot import (NUM_PER_FOOT, bigfoot_model,
                                     masterfoot_model, masterfoot_topology)
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


@pytest.fixture(scope="module")
def mf():
    topo24, model24 = load_mjcf_humanoid(XML)
    topo, model, conv = masterfoot_model(topo24, model24)
    return topo24, model24, topo, model_to_dtype(model, jnp.float32), conv


def test_topology(mf):
    topo24, model24, topo, model, conv = mf
    assert topo.nbody == 24 + 2 * NUM_PER_FOOT == 48
    i_ltoe = topo.body_names.index("L_Toe")
    assert topo.body_names[i_ltoe + 1] == "L_Ankle_mf00"
    i_ank = topo.body_names.index("L_Ankle")
    for k in range(NUM_PER_FOOT):
        assert topo.parents[i_ltoe + 1 + k] == i_ank
    # smpl body names all preserved
    assert set(topo24.body_names) <= set(topo.body_names)


def test_model_tables(mf):
    topo24, model24, topo, model, conv = mf
    jkp = np.asarray(model.jkp)
    i_mf = topo.body_names.index("L_Ankle_mf00") - 1
    # new bodies: default 50/5/1/200 tables (smpl_mujoco.py:271-281)
    assert np.all(jkp[3 * i_mf:3 * i_mf + 3] == 50.0)
    assert np.all(np.asarray(model.jkd)[3 * i_mf:3 * i_mf + 3] == 5.0)
    assert np.all(np.asarray(model.torque_lim)[3 * i_mf:3 * i_mf + 3] == 200.0)
    # +-master_range joint limits
    r = np.asarray(model.jnt_range)[3 * i_mf]
    np.testing.assert_allclose(r, [-np.deg2rad(30), np.deg2rad(30)])
    # capsule mass ~0.56 kg, contact proxies present
    i_b = topo.body_names.index("L_Ankle_mf00")
    assert 0.3 < float(np.asarray(model.body_mass)[i_b]) < 0.8
    assert np.asarray(model.contact_mask)[i_b].sum() == 3
    # diff weights zero on the clones -> excluded from termination/reward
    w = conv.get_new_diff_weight()
    assert w[i_b] == 0.0 and w[topo.body_names.index("L_Hip")] == 1.0


def test_converter_roundtrip(mf):
    topo24, model24, topo, model, conv = mf
    rng = np.random.RandomState(0)
    qpos24 = jnp.asarray(rng.randn(5, topo24.nq).astype(np.float32))
    qpos48 = conv.qpos_smpl_2_new(qpos24)
    assert qpos48.shape == (5, topo.nq)
    np.testing.assert_allclose(np.asarray(conv.qpos_new_2_smpl(qpos48)),
                               np.asarray(qpos24), atol=1e-6)
    # new joints start zeroed
    i_mf = topo.body_names.index("L_Ankle_mf00")
    s = 7 + 3 * (i_mf - 1)
    assert np.all(np.asarray(qpos48[:, s:s + 3]) == 0.0)


@pytest.mark.slow
def test_masterfoot_env_step(mf):
    topo24, model24, topo, model, conv = mf
    import joblib
    neutral = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
    seqs = {"stand": {"pose_aa": np.asarray(neutral["pose_aa"])[:10],
                      "trans": None}}
    lib, keys = build_expert_library(
        topo, model, seqs, converter=conv,
        base_root_offset=np.asarray(model24.body_pos)[0])
    assert lib["qpos"].shape == (1, 10, topo.nq)
    cfg = EnvConfig(meta_pd=True, residual_force=False, reactive_v=0,
                    env_init_noise=0.0)
    jpw = jnp.asarray(conv.get_new_diff_weight().astype(np.float32))
    state = H.env_reset(topo, model, cfg, jax.random.PRNGKey(0),
                        jnp.zeros((), jnp.int32), lib, lib["qpos"][0, 0],
                        lib["qvel"][0, 0], train=False)
    ndof, vf, meta = H.action_dims(topo, cfg)
    assert ndof == 3 * 47
    state2, obs, reward, terms, done = H.env_step(
        topo, model, cfg, state, jnp.zeros(ndof + vf + meta), lib,
        jpw, jpw[1:], train=False)
    assert bool(jnp.all(jnp.isfinite(state2.qpos)))
    assert bool(jnp.all(jnp.isfinite(obs)))
    assert not bool(done)
    assert float(state2.qpos[2]) > 0.5   # still upright after one step


def test_bigfoot_transform(mf):
    topo24, model24, topo, model, conv = mf
    big = bigfoot_model(topo24, model24)
    i_a = topo24.body_names.index("L_Ankle")
    i_h = topo24.body_names.index("L_Hip")
    np.testing.assert_allclose(np.asarray(big.contact_point)[i_a],
                               np.asarray(model24.contact_point)[i_a] * 1.6)
    np.testing.assert_allclose(np.asarray(big.contact_point)[i_h],
                               np.asarray(model24.contact_point)[i_h])
    assert float(np.asarray(big.body_mass)[i_a]) == pytest.approx(
        float(np.asarray(model24.body_mass)[i_a]) * 1.6**3)


def test_masterfoot_config_loads():
    cfg = Config.from_yaml("masterfoot_1")
    assert cfg.env.masterfoot
    cfg2 = Config.from_yaml("bigfoot_1")
    assert cfg2.env.bigfoot
