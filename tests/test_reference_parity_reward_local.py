"""local_rfc_implicit reward parity vs the REFERENCE'S OWN code — the
root-relative reward family (fd root velocities in the previous root's
frame, heading-removed root quat, local-frame end effectors)."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.append("/root/reference")

rf = pytest.importorskip("uhc.losses.reward_function")
mu = pytest.importorskip("uhc.utils.math_utils")

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
NEUTRAL = "/root/reference/sample_data/standing_neutral.pkl"

WS = {"w_p": 0.5, "w_v": 0.1, "w_e": 0.2, "w_rp": 0.1, "w_rv": 0.05,
      "w_vf": 0.05, "k_p": 2.0, "k_v": 0.005, "k_e": 20.0, "k_vf": 1.0,
      "k_rh": 300.0, "k_rq": 300.0, "k_rl": 5.0, "k_ra": 0.5}


@pytest.mark.slow
def test_local_rfc_implicit_matches_reference():
    from uhc_tpu.config.config import EnvConfig
    from uhc_tpu.data.dataset import (build_expert_library,
                                      load_motion_file, load_neutral)
    from uhc_tpu.envs import humanoid_im as H
    from uhc_tpu.maths import transform_vec
    from uhc_tpu.physics import engine as E
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.rewards.reward_function import reward_func
    from uhc_tpu.smpl.constants import default_diff_weights, ee_indices
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    lib, _ = build_expert_library(topo, model, load_motion_file(NEUTRAL))
    nqp, nqv = load_neutral(NEUTRAL)
    cfg = EnvConfig(meta_pd=True, residual_force=True,
                    residual_force_scale=100.0,
                    reward_id="local_rfc_implicit",
                    extra_rw=tuple(sorted(WS.items())))
    jpw, bdw = default_diff_weights()
    aux = {"jpos_diffw": jnp.asarray(jpw), "body_diffw": jnp.asarray(bdw)}

    rng = jax.random.PRNGKey(4)
    state = jax.vmap(
        lambda k: H.env_reset(topo, model, cfg, k, jnp.zeros((), jnp.int32),
                              lib, nqp, nqv, train=False))(
        jax.random.split(rng, 1))
    nd, vf, meta = H.action_dims(topo, cfg)
    actions = 0.05 * jax.random.normal(rng, (1, nd + vf + meta))
    step = H.make_env_step_batched(topo, cfg)
    state2b, _, _, _, _ = step(model, state, actions, lib,
                               jnp.asarray(jpw), jnp.asarray(bdw))
    state2 = jax.tree.map(lambda x: x[0], state2b)
    action = actions[0]

    ours_r, ours_terms = reward_func["local_rfc_implicit"](
        topo, model, cfg, state2, action, lib, aux)

    kin = E.fk(topo, model, state2.qpos)
    ind = int(state2.start_ind + state2.cur_t)

    def attr(name):
        return np.asarray(jax.device_get(lib[name][0, ind])).copy()

    qpos = np.asarray(jax.device_get(state2.qpos))
    root_pos, root_quat = qpos[:3], qpos[3:7]
    cur_ee_local = np.asarray(jax.device_get(transform_vec(
        kin["xpos"][ee_indices(topo)] - jnp.asarray(root_pos),
        jnp.asarray(root_quat)[None], cfg.obs_coord))).ravel()

    stub = types.SimpleNamespace()
    stub.cc_cfg = types.SimpleNamespace(reward_weights=WS,
                                        residual_force=100.0,
                                        obs_coord=cfg.obs_coord,
                                        b_diffw=np.asarray(bdw))
    stub.cur_t = int(state2.cur_t)
    stub.get_expert_index = lambda t: ind
    stub.prev_bquat = np.asarray(jax.device_get(state2.prev_bquat)).ravel()
    stub.prev_qpos = np.asarray(jax.device_get(state2.prev_qpos)).copy()
    stub.data = types.SimpleNamespace(qpos=qpos)
    stub.get_ee_pos = lambda tr: cur_ee_local
    stub.get_body_quat = lambda: np.asarray(
        jax.device_get(H.get_body_quat(state2.qpos))).ravel()
    # rq_rmh is a precomputed expert track in the reference; derive it the
    # reference's own way from the expert qpos
    stub.get_expert_attr = lambda name, i: (
        mu.de_heading(attr("qpos")[3:7]) if name == "rq_rmh" else attr(name))
    stub.dt = float(np.asarray(cfg.ctrl_dt))
    stub.ndof = nd
    stub.vf_dim = vf

    ref_r, ref_terms = rf.local_rfc_implicit_reward(
        stub, None, np.asarray(jax.device_get(action)), None)

    np.testing.assert_allclose(np.asarray(ours_terms), ref_terms, atol=5e-3)
    np.testing.assert_allclose(float(ours_r), ref_r, atol=5e-3)
