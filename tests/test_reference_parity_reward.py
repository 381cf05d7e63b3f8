"""Reward parity vs the REFERENCE'S OWN reward code.

uhc/losses/reward_function.py imports without mujoco_py; its reward
functions read a duck-typed env surface (expert attrs, current body
quats/ee/com, action slices). We compute a real post-step state with the
uhc_tpu env, extract exactly those quantities, feed them to the reference
`world_rfc_implicit_reward` through a stub env, and compare against our
registry entry on the same state. Scope: the reward MATH (FK parity is
covered by the MuJoCo oracle tests).
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.append("/root/reference")

rf = pytest.importorskip("uhc.losses.reward_function")

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
NEUTRAL = "/root/reference/sample_data/standing_neutral.pkl"

WS = {"w_p": 0.3, "w_v": 0.1, "w_e": 0.45, "w_c": 0.1, "w_vf": 0.05,
      "k_p": 2.0, "k_v": 0.005, "k_e": 5.0, "k_c": 100.0, "k_vf": 1.0}


def test_world_rfc_implicit_matches_reference():
    from uhc_tpu.config.config import EnvConfig
    from uhc_tpu.data.dataset import (build_expert_library,
                                      load_motion_file, load_neutral)
    from uhc_tpu.envs import humanoid_im as H
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
                    k_p=WS["k_p"], k_v=WS["k_v"], k_e=WS["k_e"],
                    k_c=WS["k_c"], k_vf=WS["k_vf"],
                    w_p=WS["w_p"], w_v=WS["w_v"], w_e=WS["w_e"],
                    w_c=WS["w_c"], w_vf=WS["w_vf"])
    jpw, bdw = default_diff_weights()
    aux = {"jpos_diffw": jnp.asarray(jpw), "bdw": None,
           "body_diffw": jnp.asarray(bdw)}

    # one real env step from the expert start with a random action (B=1)
    rng = jax.random.PRNGKey(0)
    state = jax.vmap(
        lambda k: H.env_reset(topo, model, cfg, k, jnp.zeros((), jnp.int32),
                              lib, nqp, nqv, train=False))(
        jax.random.split(rng, 1))
    nd, vf, meta = H.action_dims(topo, cfg)
    actions = 0.05 * jax.random.normal(rng, (1, nd + vf + meta))
    step = H.make_env_step_batched(topo, cfg)
    state2b, _, our_rb, _, _ = step(model, state, actions, lib,
                                    jnp.asarray(jpw), jnp.asarray(bdw))
    state2 = jax.tree.map(lambda x: x[0], state2b)
    our_r = our_rb[0]
    action = actions[0]

    ours_r, ours_terms = reward_func["world_rfc_implicit"](
        topo, model, cfg, state2, action, lib, aux)

    # --- rebuild the reference's env surface from the same arrays -------
    kin = E.fk(topo, model, state2.qpos)
    ind = int(state2.start_ind + state2.cur_t)

    def attr(name):
        return np.asarray(jax.device_get(lib[name][0, ind])).copy()

    stub = types.SimpleNamespace()
    stub.cc_cfg = types.SimpleNamespace(reward_weights=WS,
                                        residual_force=100.0)
    stub.cur_t = int(state2.cur_t)
    stub.get_expert_index = lambda t: ind
    stub.prev_bquat = np.asarray(jax.device_get(state2.prev_bquat)).ravel()
    stub.get_ee_pos = lambda tr: np.asarray(
        jax.device_get(kin["xpos"][ee_indices(topo)])).ravel()
    stub.get_body_quat = lambda: np.asarray(
        jax.device_get(H.get_body_quat(state2.qpos))).ravel()
    stub.get_com = lambda: np.asarray(jax.device_get(kin["xipos"][0]))
    stub.get_expert_attr = lambda name, i: attr(name)
    stub.expert = {}
    stub.body_diffw = np.asarray(bdw)
    stub.jpos_diffw = np.asarray(jpw)[:, None]
    stub.dt = float(np.asarray(cfg.ctrl_dt))
    stub.ndof = nd
    stub.vf_dim = vf

    ref_r, ref_terms = rf.world_rfc_implicit_reward(
        stub, None, np.asarray(jax.device_get(action)), None)

    np.testing.assert_allclose(np.asarray(ours_terms), ref_terms, atol=2e-4)
    np.testing.assert_allclose(float(ours_r), ref_r, atol=2e-4)
    # and the in-env reward path agrees with the registry entry
    np.testing.assert_allclose(float(our_r), float(ours_r), atol=1e-5)
