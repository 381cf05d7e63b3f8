"""UHM-reward parity vs the REFERENCE'S OWN dynamic_supervision_v1.

A real post-step KinEnvState from the uhc_tpu hierarchical env is
projected onto the reference reward's duck-typed env surface (body quats,
world body positions, the integrated target's FK, the GT context, prev
quats) and uhc/losses/uhm_rewards.dynamic_supervision_v1 runs on it
in-process; our registry entry must match scalar + all four terms."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.append("/root/reference")

ur = pytest.importorskip("uhc.losses.uhm_rewards")

from uhc_tpu.config.config import EnvConfig
from uhc_tpu.data.dataset import build_expert_library, load_motion_file
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.envs import humanoid_kin as K
from uhc_tpu.envs.expert import qpos_fk_frame
from uhc_tpu.physics import engine as E
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.constants import default_diff_weights
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
NEUTRAL = "/root/reference/sample_data/standing_neutral.pkl"

WS = {"w_p": 0.5, "w_jp": 0.6, "w_act_p": 0.7, "w_act_v": 0.2,
      "k_p": 1.0, "k_jp": 0.1, "k_act_p": 0.1, "k_act_v": 0.1}


@pytest.mark.slow
def test_dynamic_supervision_v1_matches_reference():
    from uhc_tpu.rewards.uhm_rewards import uhm_reward_func

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    lib, _ = build_expert_library(topo, model,
                                  load_motion_file(NEUTRAL), max_len=30)
    jpw, _ = default_diff_weights()
    cc_cfg = EnvConfig(obs_v=2, meta_pd=True, residual_force=True)
    kin_cfg = K.KinConfig(pose_delta=False, remove_base=True,
                          reward_id="dynamic_supervision_v1",
                          reward_weights=tuple(sorted(WS.items())))

    rng = jax.random.PRNGKey(0)
    state = K.kin_env_reset(topo, model, kin_cfg, rng,
                            jnp.zeros((), jnp.int32), lib)
    ndof, vf, meta = H.action_dims(topo, cc_cfg)
    cc_policy_fn = lambda cc_obs: jnp.zeros(ndof + vf + meta)  # noqa: E731
    gt1 = K.context_at(lib, state.seq_idx, 1)
    a = jnp.zeros(K.kin_action_dim(topo))
    a = a.at[0].set(gt1["qpos"][2])
    a = a.at[5:74].set(gt1["qpos"][7:] + 0.02)
    state2, _, _, _, _ = K.kin_env_step(
        topo, model, kin_cfg, cc_cfg, state, a, lib, cc_policy_fn, jpw)

    our_r, our_terms = uhm_reward_func["dynamic_supervision_v1"](
        topo, model, kin_cfg, cc_cfg, state2, lib)

    # --- project onto the reference env surface --------------------------
    kin = E.fk(topo, model, state2.qpos)
    tgt = qpos_fk_frame(topo, model, state2.target_qpos)
    ind = int(state2.start_ind + state2.cur_t)

    def ctx(name, i):
        return np.asarray(jax.device_get(lib[name][0, i])).copy()

    stub = types.SimpleNamespace()
    stub.kin_cfg = types.SimpleNamespace(policy_specs={"reward_weights": WS})
    stub.cur_t = ind
    stub.get_body_quat = lambda: np.asarray(
        jax.device_get(H.get_body_quat(state2.qpos))).ravel()
    stub.get_wbody_pos = lambda: np.asarray(
        jax.device_get(kin["xpos"])).ravel()
    stub.target = {
        "bquat": np.asarray(jax.device_get(tgt["bquat"])).ravel(),
        "wbpos": np.asarray(jax.device_get(tgt["wbpos"])).reshape(-1, 3)}
    stub.ar_context = {"bquat": {ind: ctx("bquat", ind),
                                 ind - 1: ctx("bquat", ind - 1)}}
    stub.prev_bquat = np.asarray(jax.device_get(state2.prev_bquat)).ravel()
    stub.dt = float(np.asarray(cc_cfg.ctrl_dt))

    ref_r, ref_terms = ur.dynamic_supervision_v1(stub, None, None, None)

    # p / jp / gt_p terms match to float32 exactness; the act_v term goes
    # through a finite difference of near-identity quats (rotvec(q⊗q⁻¹)/dt)
    # where f32 cancellation vs the reference's f64 numpy costs ~1e-2 of
    # the exponentiated reward (angvel_fd itself is verified to 2e-6 in
    # test_reference_parity_math-style direct comparison).
    np.testing.assert_allclose(np.asarray(our_terms)[:3], ref_terms[:3],
                               atol=2e-4)
    np.testing.assert_allclose(float(our_terms[3]), ref_terms[3], atol=2e-2)
    np.testing.assert_allclose(float(our_r), ref_r, atol=1e-2)
