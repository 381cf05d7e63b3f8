"""world_rfc_implicit_v2 / _v3 reward parity vs the REFERENCE'S OWN code
(the mean-squared world-frame family: local+global body quats, per-body
com and joint positions, jpos_diffw-weighted; v2 multiplicative, v3
additive)."""
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

WS = {"k_p": 0.4, "k_wp": 0.4, "k_v": 0.005, "k_j": 100.0, "k_c": 100.0,
      "k_vf": 1.0, "w_p": 0.4, "w_wp": 0.4, "w_v": 0.005, "w_j": 100.0,
      "w_c": 100.0, "w_vf": 1.0}


@pytest.fixture(scope="module")
def post_step():
    from uhc_tpu.config.config import EnvConfig
    from uhc_tpu.data.dataset import (build_expert_library,
                                      load_motion_file, load_neutral)
    from uhc_tpu.envs import humanoid_im as H
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.constants import default_diff_weights
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    lib, _ = build_expert_library(topo, model, load_motion_file(NEUTRAL))
    nqp, nqv = load_neutral(NEUTRAL)
    # real YAML loading populates BOTH the direct k_/w_ fields (read by
    # the world-implicit family) and extra_rw (read by v2/local via
    # cfg.rw) — mirror that here
    cfg = EnvConfig(meta_pd=True, residual_force=True,
                    residual_force_scale=100.0,
                    k_p=WS["k_p"], k_v=WS["k_v"], k_c=WS["k_c"],
                    k_vf=WS["k_vf"],
                    w_p=WS["w_p"], w_v=WS["w_v"], w_c=WS["w_c"],
                    w_vf=WS["w_vf"],
                    extra_rw=tuple(sorted(WS.items())))
    jpw, bdw = default_diff_weights()
    rng = jax.random.PRNGKey(6)
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
    return topo, model, cfg, lib, state2, actions[0], jpw, bdw, nd, vf


def _stub(topo, model, cfg, lib, state2, nd, vf):
    from uhc_tpu.envs import humanoid_im as H
    from uhc_tpu.physics import engine as E

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
    stub.get_body_quat = lambda: np.asarray(
        jax.device_get(H.get_body_quat(state2.qpos))).ravel()
    stub.get_wbody_quat = lambda: np.asarray(
        jax.device_get(kin["xquat"])).ravel()
    stub.get_wbody_pos = lambda: np.asarray(
        jax.device_get(kin["xpos"])).ravel()
    stub.get_body_com = lambda: np.asarray(
        jax.device_get(kin["xipos"])).ravel()
    stub.get_expert_attr = lambda name, i: attr(name)
    stub.expert = {}
    stub.dt = float(np.asarray(cfg.ctrl_dt))
    stub.ndof = nd
    stub.vf_dim = vf

    from uhc_tpu.smpl.constants import default_diff_weights, ee_indices
    jpw, bdw = default_diff_weights()
    stub.get_ee_pos = lambda tr: np.asarray(
        jax.device_get(kin["xpos"][ee_indices(topo)])).ravel()
    stub.get_com = lambda: np.asarray(jax.device_get(kin["xipos"][0]))
    stub.body_diffw = np.asarray(bdw)
    stub.jpos_diffw = np.asarray(jpw)[:, None]
    return stub


@pytest.mark.parametrize("rid", ["world_rfc_implicit_v2",
                                 "world_rfc_implicit_v3"])
def test_v2_v3_match_reference(post_step, rid):
    from uhc_tpu.rewards.reward_function import reward_func

    topo, model, cfg, lib, state2, action, jpw, bdw, nd, vf = post_step
    aux = {"jpos_diffw": jnp.asarray(jpw), "body_diffw": jnp.asarray(bdw)}
    ours_r, ours_terms = reward_func[rid](topo, model, cfg, state2, action,
                                          lib, aux)
    stub = _stub(topo, model, cfg, lib, state2, nd, vf)
    ref_fn = getattr(rf, rid)
    ref_r, ref_terms = ref_fn(stub, None,
                              np.asarray(jax.device_get(action)), None)
    np.testing.assert_allclose(np.asarray(ours_terms), ref_terms, atol=5e-3)
    np.testing.assert_allclose(float(ours_r), ref_r, atol=5e-3)


@pytest.mark.parametrize("rid,ref_name", [
    ("world_rfc_implicit_quat", "world_rfc_implicit_reward_quat"),
    ("world_rfc_implicit_v1_mul", "world_rfc_implicit_v1_mul"),
])
def test_quat_and_mul_variants_match_reference(post_step, rid, ref_name):
    """The remaining registry entries used by shipped configs: the quat
    variant (same math as world_rfc_implicit modulo dead code — we alias
    it) and the multiplicative v1 composition."""
    from uhc_tpu.rewards.reward_function import reward_func

    topo, model, cfg, lib, state2, action, jpw, bdw, nd, vf = post_step
    aux = {"jpos_diffw": jnp.asarray(jpw), "body_diffw": jnp.asarray(bdw)}
    ours_r, ours_terms = reward_func[rid](topo, model, cfg, state2, action,
                                          lib, aux)
    stub = _stub(topo, model, cfg, lib, state2, nd, vf)
    ref_r, ref_terms = getattr(rf, ref_name)(
        stub, None, np.asarray(jax.device_get(action)), None)
    np.testing.assert_allclose(np.asarray(ours_terms), ref_terms, atol=5e-3)
    np.testing.assert_allclose(float(ours_r), ref_r, atol=5e-3)
