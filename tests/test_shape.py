"""Shape-conditioned training wiring (VERDICT.md round-1 item 2):
per-sequence models from betas, shape observations, and the batched env
step over a model library. Reference: uhc/envs/humanoid_im.py:154-180
reset_robot (per-beta robot rebuild), :1390 get_expert_shape_and_gender,
config/release/uhc_implicit_shape.yml.
"""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.config.config import Config, EnvConfig
from uhc_tpu.data.dataset import build_shaped_library, seq_beta_gender
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.physics.model import (model_batch_axes, model_gather,
                                   model_is_batched, model_to_dtype)
from uhc_tpu.smpl.constants import default_diff_weights
from uhc_tpu.smpl.lbs import synthetic_smpl_data
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


def _synthetic_seqs(T=25):
    rng = np.random.RandomState(0)
    base = {"pose_aa": np.zeros((T, 72), np.float32),
            "trans": np.cumsum(rng.randn(T, 3).astype(np.float32) * 0.001, 0)}
    b1 = np.zeros(16, np.float32); b1[0] = 2.0
    b2 = np.zeros(16, np.float32); b2[0] = -2.0; b2[1] = 1.0
    return {
        "big": dict(base, beta=np.tile(b1, (T, 1)), gender="male"),
        "small": dict(base, beta=b2, gender=np.asarray(b"female")),
    }


@pytest.fixture(scope="module")
def shaped():
    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    smpl = synthetic_smpl_data()
    cfg = EnvConfig(has_shape=True, meta_pd=True, residual_force=True)
    lib, keys, model_lib = build_shaped_library(
        topo, model, _synthetic_seqs(), smpl, cfg)
    return topo, model, cfg, lib, keys, model_lib


def test_seq_beta_gender():
    b, g = seq_beta_gender({"beta": np.ones((5, 10)), "gender": "female"})
    assert b.shape == (16,) and b[9] == 1.0 and b[10] == 0.0 and g == 2.0
    b, g = seq_beta_gender({})
    assert (b == 0).all() and g == 0.0


def test_per_seq_models_differ(shaped):
    topo, model, cfg, lib, keys, model_lib = shaped
    assert model_is_batched(model_lib)
    bp = np.asarray(model_lib.body_pos)
    assert bp.shape == (2, topo.nbody, 3)
    assert not np.allclose(bp[0], bp[1]), "different betas -> different models"
    assert not np.allclose(np.asarray(model_lib.body_mass)[0],
                           np.asarray(model_lib.body_mass)[1])
    # gain tables are shared (reference SMPLConverter tables are per
    # topology, not per shape)
    assert np.asarray(model_lib.jkp).ndim == 1
    # gather returns the right per-seq model
    m1 = model_gather(model_lib, jnp.asarray(1))
    np.testing.assert_array_equal(np.asarray(m1.body_pos), bp[1])
    np.testing.assert_array_equal(np.asarray(m1.jkp),
                                  np.asarray(model_lib.jkp))


def test_shape_obs_in_library(shaped):
    topo, model, cfg, lib, keys, model_lib = shaped
    assert lib["shape_obs"].shape == (2, 17)   # beta16 + gender
    assert float(lib["shape_obs"][0, 16]) == 1.0   # male
    assert float(lib["shape_obs"][1, 16]) == 2.0   # female
    np.testing.assert_allclose(np.asarray(lib["shape_obs"][0, :16]),
                               np.asarray(lib["beta"][0]))
    assert H.shape_obs_dim(topo, cfg) == 17
    assert H.obs_dim(topo, cfg) == H.obs_dim(
        topo, dataclasses.replace(cfg, has_shape=False)) + 17


def test_obs_includes_shape_block(shaped):
    topo, model, cfg, lib, keys, model_lib = shaped
    m1 = model_gather(model_lib, jnp.asarray(1))
    state = H.env_reset(topo, m1, cfg, jax.random.PRNGKey(0),
                        jnp.asarray(1, jnp.int32), lib,
                        lib["qpos"][1, 0], lib["qvel"][1, 0], train=False)
    obs = H.get_obs(topo, m1, cfg, state, lib)
    assert obs.shape == (H.obs_dim(topo, cfg),)
    np.testing.assert_allclose(np.asarray(obs[-17:]),
                               np.asarray(lib["shape_obs"][1]), atol=1e-6)


def test_shape_guard_raises(shaped):
    topo, model, cfg, lib, keys, model_lib = shaped
    m1 = model_gather(model_lib, jnp.asarray(0))
    state = H.env_reset(topo, m1, cfg, jax.random.PRNGKey(0),
                        jnp.asarray(0, jnp.int32), lib,
                        lib["qpos"][0, 0], lib["qvel"][0, 0], train=False)
    bare = {k: v for k, v in lib.items() if k != "shape_obs"}
    with pytest.raises(ValueError, match="shape_obs"):
        H.get_obs(topo, m1, cfg, state, bare)


@pytest.mark.slow
def test_batched_step_with_model_lib(shaped):
    topo, model, cfg, lib, keys, model_lib = shaped
    jpw, bdw = default_diff_weights()
    jpw, bdw = jnp.asarray(jpw), jnp.asarray(bdw)
    seq_idx = jnp.asarray([0, 1, 0, 1], jnp.int32)
    keys_ = jax.random.split(jax.random.PRNGKey(0), 4)
    states = jax.vmap(
        lambda k, s: H.env_reset(topo, model, cfg, k, s, lib,
                                 lib["qpos"][0, 0], lib["qvel"][0, 0],
                                 train=False))(keys_, seq_idx)
    ndof, vf, meta = H.action_dims(topo, cfg)
    actions = jnp.zeros((4, ndof + vf + meta))
    step = H.make_env_step_batched(topo, cfg)
    states2, obs, reward, terms, done = jax.jit(
        lambda s, a: step(model_lib, s, a, lib, jpw, bdw))(states, actions)
    assert obs.shape == (4, H.obs_dim(topo, cfg))
    assert bool(jnp.all(jnp.isfinite(obs)))
    assert bool(jnp.all(jnp.isfinite(states2.qpos)))
    # env 0 (seq "big") and env 1 (seq "small") see different shape obs
    assert not np.allclose(np.asarray(obs[0, -17:]), np.asarray(obs[1, -17:]))


def test_uhc_implicit_shape_config_loads():
    cfg = Config.from_yaml("uhc_implicit_shape")
    assert cfg.env.has_shape and cfg.env.obs_v == 2
    assert cfg.env.fut_frames == 3 and cfg.env.obs_skip == 10
    topo, _ = load_mjcf_humanoid(XML)
    # obs_v2 + full qvel + shape(17)
    assert H.obs_dim(topo, cfg.env) == 640 + 17


def test_rel_joint_ranges():
    """Knee/ankle/toe overrides (smpl_robot.py:1087-1110 rel_joint_lm)."""
    import jax.numpy as jnp

    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
    from uhc_tpu.smpl.robot import rel_joint_ranges

    topo, model = load_mjcf_humanoid(XML)
    jr = np.asarray(rel_joint_ranges(topo, model))
    names = list(topo.body_names)
    kb = 3 * (names.index("L_Knee") - 1)
    np.testing.assert_allclose(jr[kb], [-np.pi / 16, np.pi / 16], atol=1e-6)
    np.testing.assert_allclose(jr[kb + 2], [-np.pi / 16, np.pi], atol=1e-6)
    ab = 3 * (names.index("R_Ankle") - 1)
    np.testing.assert_allclose(jr[ab], [-np.pi / 2, np.pi / 2], atol=1e-6)
    tb = 3 * (names.index("L_Toe") - 1)
    np.testing.assert_allclose(jr[tb + 2], [-np.pi / 2, np.pi / 2],
                               atol=1e-6)
    # untouched elsewhere
    hb = 3 * (names.index("L_Hip") - 1)
    np.testing.assert_allclose(jr[hb], np.asarray(model.jnt_range)[hb],
                               atol=1e-6)


def test_model_from_betas_exact_mass_props():
    """Exact hull inertials per shape (VERDICT r2 item 8): physical mass
    distribution from the shaped vertices, not s³ heuristics."""
    import jax.numpy as jnp

    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.lbs import synthetic_smpl_data, vertex_body_assignment
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
    from uhc_tpu.smpl.robot import model_from_betas, model_from_betas_exact

    topo, base = load_mjcf_humanoid(XML)
    base = model_to_dtype(base, jnp.float32)
    data = synthetic_smpl_data(V=2048)
    assign = vertex_body_assignment(data)
    betas = jnp.zeros(16)
    m = model_from_betas_exact(topo, base, data, betas, assign)
    mass = np.asarray(m.body_mass)
    iner = np.asarray(m.body_inertia)
    assert np.all(mass > 0) and np.all(np.isfinite(mass))
    assert np.all(iner > 0)
    # bodies with >=8 assigned vertices got hull-derived (changed) masses
    counts = np.bincount(assign, minlength=topo.nbody)
    scaled = model_from_betas(topo, base, data, betas, assign)
    changed = ~np.isclose(mass, np.asarray(scaled.body_mass))
    assert changed[counts >= 8].any()
    # inertia quats are unit
    qn = np.linalg.norm(np.asarray(m.body_iquat), axis=1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-5)


def test_synthetic_smpl_data_like_is_anatomical():
    """VERDICT r3 item 5 root cause: the old random-blendshape stand-in
    regressed a degenerate centimeter-scale skeleton (every joint collapsed
    to the mean vertex). The anatomical stand-in must reproduce the base
    model's skeleton exactly at betas=0 and perturb bones smoothly."""
    from uhc_tpu.smpl.lbs import (synthetic_smpl_data_like,
                                  mujoco_offsets_from_betas,
                                  vertex_body_assignment)
    from uhc_tpu.smpl.robot import model_from_betas

    topo, base = load_mjcf_humanoid(XML)
    base = model_to_dtype(base, jnp.float32)
    sd = synthetic_smpl_data_like(topo, base)

    off0, root0 = mujoco_offsets_from_betas(sd, jnp.zeros(16))
    np.testing.assert_allclose(np.asarray(off0), np.asarray(base.body_pos),
                               atol=1e-5)

    # nonzero betas: bones change but stay humanoid-scale
    assign = vertex_body_assignment(sd)
    m1 = model_from_betas(topo, base, sd, jnp.ones(16) * 0.8, assign)
    d0 = np.linalg.norm(np.asarray(base.body_pos)[1:], axis=1)
    d1 = np.linalg.norm(np.asarray(m1.body_pos)[1:], axis=1)
    assert not np.allclose(d0, d1, atol=1e-4), "betas had no effect"
    assert np.all(np.abs(d1 - d0) < 0.25), "bone change implausibly large"
    # mass varies with shape but stays in a human range
    mass = float(np.sum(np.asarray(m1.body_mass)))
    assert 30.0 < mass < 200.0


def test_make_shaped_clips_tool(tmp_path):
    """Shaped-variant generator: betas attached, trans height-fixed so the
    shaped body's lowest contact point matches the neutral clearance
    (process_amass_db.py:194 fix_height analogue)."""
    import runpy
    import sys

    import joblib

    src = str(tmp_path / "mini.pkl")
    T = 5
    d = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
    pose_aa = np.zeros((T, 72), np.float32)
    trans = np.zeros((T, 3), np.float32)
    trans[:, 2] = 0.95
    joblib.dump({"standing": {"pose_aa": pose_aa, "trans": trans}}, src)
    out = str(tmp_path / "shaped.pkl")
    argv_old = sys.argv
    sys.argv = ["make_shaped_clips.py", "--data", src, "--out", out,
                "--variants", "2"]
    try:
        runpy.run_path("tools/make_shaped_clips.py", run_name="__main__")
    finally:
        sys.argv = argv_old
    shaped = joblib.load(out)
    assert set(shaped) == {"standing", "standing_shape0", "standing_shape1"}
    b0 = shaped["standing_shape0"]["beta"]
    assert b0.shape == (16,) and not np.allclose(b0, 0)

    # the height fix holds: shaped lowest contact z == neutral lowest z
    from uhc_tpu.smpl.convert import smpl_to_qpose
    from uhc_tpu.smpl.lbs import (synthetic_smpl_data_like,
                                  vertex_body_assignment)
    from uhc_tpu.smpl.robot import model_from_betas

    sys.path.insert(0, os.getcwd())
    from tools.make_shaped_clips import lowest_contact_z

    topo, base = load_mjcf_humanoid(XML)
    base = model_to_dtype(base, jnp.float32)
    sd = synthetic_smpl_data_like(topo, base)
    assign = vertex_body_assignment(sd)
    zn = lowest_contact_z(topo, base, np.asarray(
        smpl_to_qpose(pose_aa, base.body_pos[0], trans)))
    for v in range(2):
        dv = shaped[f"standing_shape{v}"]
        m = model_from_betas(topo, base, sd, jnp.asarray(dv["beta"]), assign)
        zs = lowest_contact_z(topo, m, np.asarray(
            smpl_to_qpose(pose_aa, m.body_pos[0], dv["trans"])))
        np.testing.assert_allclose(zs, zn, atol=1e-4)
