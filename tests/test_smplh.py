"""SMPL-H (52-joint) humanoid family (VERDICT round-1 item 4).

Reference: uhc/smpllib/smpl_parser.py:42,464 (SMPLH bone order / parser),
smpl_mujoco.py:93-200 (hand gain tables). The 24-body path previously
truncated SMPL-H hand dofs to zeros; the 52-body topology consumes the full
156-dof pose."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.config.config import EnvConfig
from uhc_tpu.data.dataset import build_expert_library
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl import smplh as SH
from uhc_tpu.smpl.constants import ee_indices, head_index
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


@pytest.fixture(scope="module")
def smplh():
    topo24, model24 = load_mjcf_humanoid(XML)
    topo = SH.smplh_topology()
    model = model_to_dtype(SH.smplh_model(topo24, model24), jnp.float32)
    return topo, model


def test_topology_structure(smplh):
    topo, model = smplh
    assert topo.nbody == 52 and topo.nq == 160 and topo.nv == 159
    assert topo.body_names[0] == "Pelvis"
    # DFS order: body chain first, fingers hang off each wrist
    assert topo.body_names[:14] == (
        "Pelvis", "L_Hip", "L_Knee", "L_Ankle", "L_Toe", "R_Hip", "R_Knee",
        "R_Ankle", "R_Toe", "Torso", "Spine", "Chest", "Neck", "Head")
    iw = topo.body_names.index("L_Wrist")
    assert topo.body_names[iw + 1] == "L_Index1"
    assert topo.parents[topo.body_names.index("L_Index1")] == iw
    assert topo.parents[topo.body_names.index("L_Index2")] == \
        topo.body_names.index("L_Index1")
    # hands are gone, fingers present
    assert "L_Hand" not in topo.body_names
    assert sum("Thumb" in n for n in topo.body_names) == 6
    # ee/head lookups still resolve
    np.testing.assert_array_equal(ee_indices(topo), [3, 7, 17, 36, 13])
    assert head_index(topo) == 13


def test_model_tables(smplh):
    topo, model = smplh
    assert np.all(np.asarray(model.body_mass) > 0)
    jkp = np.asarray(model.jkp)
    assert jkp.shape == (153,)
    i_f = topo.body_names.index("L_Index1") - 1
    assert np.all(jkp[3 * i_f:3 * i_f + 3] == 100.0)  # finger gains
    i_h = topo.body_names.index("L_Hip") - 1
    assert np.all(jkp[3 * i_h:3 * i_h + 3] == 500.0)
    # elbow range +-4pi
    i_e = topo.body_names.index("L_Elbow") - 1
    assert np.asarray(model.jnt_range)[3 * i_e, 1] == pytest.approx(
        4 * np.pi)
    jpw, bdw = SH.smplh_diff_weights()
    assert jpw.shape == (52,) and bdw.shape == (51,)
    assert jpw[topo.body_names.index("L_Index1")] == pytest.approx(0.3)
    assert jpw[topo.body_names.index("L_Toe")] == 0.0


@pytest.mark.slow
def test_smplh_expert_library_and_step(smplh):
    topo, model = smplh
    T = 12
    rng = np.random.RandomState(0)
    pose = np.zeros((T, 156), np.float32)
    pose[:, 66:] = rng.uniform(-0.2, 0.2, (T, 90))   # hand articulation
    trans = np.zeros((T, 3), np.float32); trans[:, 2] = 0.92
    seqs = {"clip": {"pose_aa": pose, "trans": trans}}
    lib, keys = build_expert_library(topo, model, seqs)
    assert lib["qpos"].shape == (1, T, 160)
    assert lib["wbpos"].shape == (1, T, 52 * 3)
    # hand dofs are NOT truncated: finger euler angles non-zero
    iw = topo.body_names.index("L_Index1")
    fq = np.asarray(lib["qpos"][0, :, 7 + 3 * (iw - 1):7 + 3 * iw])
    assert np.abs(fq).max() > 0.01

    cfg = EnvConfig(meta_pd=True, residual_force=True, reactive_v=0,
                    env_init_noise=0.0)
    ndof, vf, meta = H.action_dims(topo, cfg)
    assert (ndof, vf, meta) == (153, 6, 30)
    state = H.env_reset(topo, model, cfg, jax.random.PRNGKey(0),
                        jnp.zeros((), jnp.int32), lib, lib["qpos"][0, 0],
                        lib["qvel"][0, 0], train=False)
    obs = H.get_obs(topo, model, cfg, state, lib)
    assert obs.shape == (H.obs_dim(topo, cfg),)
    assert bool(jnp.all(jnp.isfinite(obs)))

    jpw, bdw = SH.smplh_diff_weights()
    state2, obs2, reward, terms, done = H.env_step(
        topo, model, cfg, state, jnp.zeros(ndof + vf + meta), lib,
        jnp.asarray(jpw), jnp.asarray(bdw), train=False)
    assert bool(jnp.all(jnp.isfinite(state2.qpos)))
    assert bool(jnp.all(jnp.isfinite(obs2)))
    assert 0.0 <= float(reward) <= 1.0
    assert not bool(done)


def test_smplh_accepts_plain_smpl_poses(smplh):
    """72-dof SMPL clips route onto the 52-body tree with flat hands
    (finger dofs zeroed) — the inverse of the reference's model="smpl"
    hand-drop."""
    topo, model = smplh
    from uhc_tpu.data.dataset import _pose_to_qpose
    qpos = _pose_to_qpose(topo, model, np.zeros((3, 72), np.float32), None)
    assert qpos.shape == (3, topo.nq)
    assert bool(jnp.all(jnp.isfinite(qpos)))


@pytest.mark.slow
def test_smplx_family(smplh):
    """SMPL-X 55-body extension (smpl_parser.py:97 SMPLX_BONE_ORDER_NAMES):
    SMPL-H + Jaw + eyes off the Head."""
    from uhc_tpu.smpl.smplh import (smplx_model, smplx_to_qpose,
                                    smplx_topology)
    topo24, model24 = load_mjcf_humanoid(XML)
    topo = smplx_topology()
    assert topo.nbody == 55 and topo.nq == 169
    assert topo.parents[topo.body_names.index("Jaw")] == \
        topo.body_names.index("Head")
    assert head_index(topo) == 13
    model = model_to_dtype(smplx_model(topo24, model24), jnp.float32)
    assert np.all(np.asarray(model.body_mass) > 0)
    T = 6
    pose = np.zeros((T, 165), np.float32)
    pose[:, 66:75] = 0.1     # jaw/eye articulation
    lib, _ = build_expert_library(topo, model, {
        "c": {"pose_aa": pose, "trans": None}})
    assert lib["qpos"].shape == (1, T, 169)
    cfg = EnvConfig(meta_pd=True, residual_force=True, reactive_v=0,
                    env_init_noise=0.0)
    state = H.env_reset(topo, model, cfg, jax.random.PRNGKey(0),
                        jnp.zeros((), jnp.int32), lib, lib["qpos"][0, 0],
                        lib["qvel"][0, 0], train=False)
    obs = H.get_obs(topo, model, cfg, state, lib)
    assert obs.shape == (H.obs_dim(topo, cfg),)
    assert bool(jnp.all(jnp.isfinite(obs)))


def test_smplh_lbs_data_path(tmp_path):
    """Real-data loader path (VERDICT r2 item 6): load_smplh_data reads a
    52-joint model file, lbs runs on the 52-joint tree, and
    smplh_model_from_data produces exact joint offsets matching the
    regressor differences (smpl_parser.py:464 SMPLH_Parser)."""
    from uhc_tpu.smpl.lbs import (lbs, load_smplh_data, shaped_joints,
                                  smplh_offsets_from_betas,
                                  synthetic_smpl_data)

    sd = synthetic_smpl_data(nj=52)
    # round-trip through an npz file like the real (non-redistributable)
    # SMPL-H release
    path = tmp_path / "smplh_neutral.npz"
    np.savez(path,
             v_template=np.asarray(sd.v_template),
             shapedirs=np.asarray(sd.shapedirs),
             J_regressor=np.asarray(sd.j_regressor),
             weights=np.asarray(sd.weights))
    data = load_smplh_data(str(path))
    assert data.j_regressor.shape[0] == 52
    assert data.weights.shape[1] == 52

    betas = jnp.zeros((16,))
    pose = jnp.zeros((52, 3))
    verts, joints = lbs(data, pose, betas, trans=jnp.zeros(3))
    assert joints.shape == (52, 3)
    # zero pose: LBS joints == regressed joints
    ref = shaped_joints(data, betas)
    assert np.allclose(np.asarray(joints), np.asarray(ref), atol=1e-5)

    offsets, root = smplh_offsets_from_betas(data, betas)
    assert len(offsets) == 51
    # offsets telescope back to the regressed joint positions
    j = np.asarray(ref)
    from uhc_tpu.smpl.smplh import SMPLH_BONE_ORDER_NAMES, SMPLH_PARENTS
    for i in range(1, 52):
        np.testing.assert_allclose(
            offsets[SMPLH_BONE_ORDER_NAMES[i]],
            j[i] - j[int(SMPLH_PARENTS[i])], atol=1e-6)

    # model built from data carries the exact offsets
    topo24, model24 = load_mjcf_humanoid(XML)
    m = SH.smplh_model_from_data(topo24, model24, data)
    topo = SH.smplh_topology()
    names = list(topo.body_names)
    bp = np.asarray(m.body_pos)
    for name in ("L_Index1", "R_Thumb3", "L_Knee", "Head"):
        np.testing.assert_allclose(bp[names.index(name)], offsets[name],
                                   atol=1e-6)


def test_smplx_lbs_data_path():
    """55-joint SMPL-X variant of the loader path."""
    from uhc_tpu.smpl.lbs import (lbs, shaped_joints,
                                  smplh_offsets_from_betas,
                                  synthetic_smpl_data)

    data = synthetic_smpl_data(nj=55)
    betas = jnp.zeros((16,))
    verts, joints = lbs(data, jnp.zeros((55, 3)), betas)
    assert joints.shape == (55, 3)
    offsets, root = smplh_offsets_from_betas(data, betas)
    assert "Jaw" in offsets and len(offsets) == 54
    topo24, model24 = load_mjcf_humanoid(XML)
    m = SH.smplx_model_from_data(topo24, model24, data)
    topo = SH.smplx_topology()
    bp = np.asarray(m.body_pos)
    names = list(topo.body_names)
    np.testing.assert_allclose(bp[names.index("Jaw")], offsets["Jaw"],
                               atol=1e-6)


def test_training_setup_routes_exact_offsets(tmp_path):
    """VERDICT r3 item 8: the TRAINING path (CopycatAgent construction with
    robot_model=smplh + 52-joint model data) consumes exact regressor
    offsets, not the anthropometric fallback — previously the
    smplh_model_from_data branch was only unit-exercised, never wired
    through the agent."""
    from uhc_tpu.config.config import Config
    from uhc_tpu.learn.agent import CopycatAgent
    from uhc_tpu.smpl.lbs import (load_smplh_data, smplh_offsets_from_betas,
                                  synthetic_smpl_data)

    sd = synthetic_smpl_data(nj=52)
    path = tmp_path / "smplh_synth.npz"
    np.savez(path,
             v_template=np.asarray(sd.v_template),
             shapedirs=np.asarray(sd.shapedirs),
             J_regressor=np.asarray(sd.j_regressor),
             weights=np.asarray(sd.weights))

    import dataclasses as DC
    cfg = Config(cfg_id="smplh_exact_test")
    cfg = DC.replace(cfg, env=DC.replace(cfg.env, robot_model="smplh"))
    agent = CopycatAgent(
        cfg, "/root/reference/sample_data/standing_neutral.pkl",
        num_envs=2, horizon=2, max_seq_len=8,
        results_dir=str(tmp_path / "results"), smpl_data=str(path))

    assert agent.topo.nbody == 52
    data = load_smplh_data(str(path))
    offsets, _ = smplh_offsets_from_betas(data, jnp.zeros((16,)))
    names = list(agent.topo.body_names)
    bp = np.asarray(agent.model.body_pos)
    for name in ("L_Index1", "R_Thumb3", "L_Middle2", "Head"):
        np.testing.assert_allclose(bp[names.index(name)], offsets[name],
                                   atol=1e-6,
                                   err_msg=f"{name} not exact-offset")
    # the anthropometric fallback would differ: rebuild it and check the
    # finger rows are actually different (i.e. the exact branch was taken)
    topo24, model24 = load_mjcf_humanoid(XML)
    fb = np.asarray(SH.smplh_model(topo24, model24).body_pos)
    assert not np.allclose(fb[names.index("L_Index1")],
                           bp[names.index("L_Index1")], atol=1e-6)
    # expert library built on the exact model is finite and 52-body wide
    assert np.all(np.isfinite(np.asarray(agent.expert_lib["wbpos"])))
    assert agent.expert_lib["wbpos"].shape[-1] == 52 * 3
