"""world_rfc_explicit reward parity vs the REFERENCE'S OWN code — the
explicit-RFC flagship's learning signal (per-body [cp,f,τ] action layout,
unweighted velocity term, per-body force penalty)."""
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


@pytest.mark.slow
def test_world_rfc_explicit_matches_reference():
    from uhc_tpu.config.config import EnvConfig
    from uhc_tpu.data.dataset import (build_expert_library,
                                      load_motion_file, load_neutral)
    from uhc_tpu.envs import humanoid_im as H
    from uhc_tpu.physics import engine as E
    from uhc_tpu.rewards.reward_function import reward_func
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.constants import default_diff_weights, ee_indices
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    lib, _ = build_expert_library(topo, model, load_motion_file(NEUTRAL))
    nqp, nqv = load_neutral(NEUTRAL)
    cfg = EnvConfig(meta_pd=True, residual_force=True,
                    residual_force_mode="explicit",
                    residual_force_scale=100.0,
                    k_p=WS["k_p"], k_v=WS["k_v"], k_e=WS["k_e"],
                    k_c=WS["k_c"], k_vf=WS["k_vf"],
                    w_p=WS["w_p"], w_v=WS["w_v"], w_e=WS["w_e"],
                    w_c=WS["w_c"], w_vf=WS["w_vf"])
    jpw, bdw = default_diff_weights()
    aux = {"jpos_diffw": jnp.asarray(jpw), "body_diffw": jnp.asarray(bdw)}

    rng = jax.random.PRNGKey(2)
    state = jax.vmap(
        lambda k: H.env_reset(topo, model, cfg, k, jnp.zeros((), jnp.int32),
                              lib, nqp, nqv, train=False))(
        jax.random.split(rng, 1))
    nd, vf, meta = H.action_dims(topo, cfg)
    assert vf > 6  # explicit layout: per-body [cp, f, (tau)]
    actions = 0.05 * jax.random.normal(rng, (1, nd + vf + meta))
    step = H.make_env_step_batched(topo, cfg)
    state2b, _, our_rb, _, _ = step(model, state, actions, lib,
                                    jnp.asarray(jpw), jnp.asarray(bdw))
    state2 = jax.tree.map(lambda x: x[0], state2b)
    action = actions[0]

    ours_r, ours_terms = reward_func["world_rfc_explicit"](
        topo, model, cfg, state2, action, lib, aux)

    kin = E.fk(topo, model, state2.qpos)
    ind = int(state2.start_ind + state2.cur_t)
    bvd = H.body_vf_dim(cfg)

    def attr(name):
        return np.asarray(jax.device_get(lib[name][0, ind])).copy()

    stub = types.SimpleNamespace()
    stub.cc_cfg = types.SimpleNamespace(reward_weights=WS,
                                        residual_force=100.0)
    stub.cur_t = int(state2.cur_t)
    stub.start_ind = int(state2.start_ind)
    stub.get_expert_index = lambda t: ind
    stub.prev_bquat = np.asarray(jax.device_get(state2.prev_bquat)).ravel()
    stub.get_ee_pos = lambda tr: np.asarray(
        jax.device_get(kin["xpos"][ee_indices(topo)])).ravel()
    stub.get_body_quat = lambda: np.asarray(
        jax.device_get(H.get_body_quat(state2.qpos))).ravel()
    stub.get_com = lambda: np.asarray(jax.device_get(kin["xipos"][0]))
    stub.get_expert_attr = lambda name, i: attr(name)
    stub.expert = {"meta": {"cyclic": False}, "len": 10_000}
    stub.body_diffw = np.asarray(bdw)
    stub.jpos_diffw = np.asarray(jpw)[:, None]
    stub.dt = float(np.asarray(cfg.ctrl_dt))
    stub.ndof = nd
    stub.vf_dim = vf
    stub.body_vf_dim = bvd
    stub.vf_bodies = list(range(vf // bvd))

    ref_r, ref_terms = rf.world_rfc_explicit_reward(
        stub, None, np.asarray(jax.device_get(action)), None)

    np.testing.assert_allclose(np.asarray(ours_terms), ref_terms, atol=2e-4)
    np.testing.assert_allclose(float(ours_r), ref_r, atol=2e-4)
