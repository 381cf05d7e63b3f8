"""Kinematic-policy env tests (HumanoidKinEnv twin + UHM rewards)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.config.config import EnvConfig
from uhc_tpu.data.dataset import build_expert_library, load_motion_file
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.envs import humanoid_kin as K
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.constants import default_diff_weights
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
NEUTRAL = "/root/reference/sample_data/standing_neutral.pkl"


@pytest.fixture(scope="module")
def setup():
    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, keys = build_expert_library(topo, model, seqs, max_len=30)
    jpw, bdw = default_diff_weights()
    cc_cfg = EnvConfig(obs_v=2, meta_pd=True, residual_force=True)
    kin_cfg = K.KinConfig(pose_delta=False, remove_base=True)
    return topo, model, kin_cfg, cc_cfg, lib, jnp.asarray(jpw)


def test_step_ar_identity(setup):
    """A zero-velocity action whose pose slots echo the current qpos leaves
    the target at the current pose (integration consistency)."""
    topo, model, kin_cfg, cc_cfg, lib, jpw = setup
    qpos = lib["qpos"][0, 0]
    a = jnp.zeros(K.kin_action_dim(topo))
    a = a.at[0].set(qpos[2])            # z
    a = a.at[5:74].set(qpos[7:])        # body pose
    nxt = K.step_ar(kin_cfg, qpos, a)
    np.testing.assert_allclose(np.asarray(nxt[:3]), np.asarray(qpos[:3]),
                               atol=1e-5)
    # integrated rotation with zero angular velocity = current rotation
    dot = abs(float(jnp.dot(nxt[3:7], qpos[3:7])))
    assert dot > 1 - 1e-5
    np.testing.assert_allclose(np.asarray(nxt[7:]), np.asarray(qpos[7:]),
                               atol=1e-5)


@pytest.mark.slow
def test_kin_env_step_and_rewards(setup):
    """Full hierarchical step with a dummy frozen controller; every UHM
    reward evaluates finite on the post-step state."""
    from uhc_tpu.rewards.uhm_rewards import uhm_reward_func

    topo, model, kin_cfg, cc_cfg, lib, jpw = setup
    rng = jax.random.PRNGKey(0)
    state = K.kin_env_reset(topo, model, kin_cfg, rng,
                            jnp.zeros((), jnp.int32), lib)
    obs0 = K.get_ar_obs_v1(topo, model, cc_cfg, state, lib)
    assert obs0.shape == (K.ar_obs_dim(topo, cc_cfg),) == (640,)
    assert bool(jnp.all(jnp.isfinite(obs0)))

    ndof, vf, meta = H.action_dims(topo, cc_cfg)
    cc_policy_fn = lambda cc_obs: jnp.zeros(ndof + vf + meta)  # noqa: E731

    # kinematic action: aim at the next GT frame (teacher forcing)
    gt1 = K.context_at(lib, state.seq_idx, 1)
    a = jnp.zeros(K.kin_action_dim(topo))
    a = a.at[0].set(gt1["qpos"][2])
    a = a.at[5:74].set(gt1["qpos"][7:])

    state2, obs, reward, terms, done = K.kin_env_step(
        topo, model, kin_cfg, cc_cfg, state, a, lib, cc_policy_fn, jpw)
    assert int(state2.cur_t) == 1
    assert obs.shape == obs0.shape
    assert bool(jnp.all(jnp.isfinite(obs)))
    assert np.isfinite(float(reward))
    assert not bool(done)

    for name, fn in uhm_reward_func.items():
        r, t = fn(topo, model, kin_cfg, cc_cfg, state2, lib)
        assert np.isfinite(float(r)), name
        assert bool(jnp.all(jnp.isfinite(t))), name
