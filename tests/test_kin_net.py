"""KinNet autoregressive model tests (uhc/models/kin_net.py twin)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.data.dataset import build_expert_library, load_motion_file
from uhc_tpu.learn import kin_net as KN
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
NEUTRAL = "/root/reference/sample_data/standing_neutral.pkl"


@pytest.fixture(scope="module")
def setup():
    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs, max_len=12)
    specs = KN.KinNetSpecs(mlp_hsize=(64, 32), rnn_hdim=32)
    params = KN.kin_net_init(jax.random.PRNGKey(0), topo, specs)
    return topo, model, specs, params, lib


def test_obs_and_action_shapes(setup):
    topo, model, specs, params, lib = setup
    qpos, qvel = lib["qpos"][0, 0], lib["qvel"][0, 0]
    obs = KN.kin_net_obs(topo, model, specs, qpos, qvel, lib["qpos"][0, 1])
    assert obs.shape == (KN.kin_obs_dim(topo),) == (640,)
    assert bool(jnp.all(jnp.isfinite(obs)))
    h = jnp.zeros(specs.rnn_hdim)
    a, h2 = KN.kin_net_action(params, specs, obs, h)
    assert a.shape == (KN.kin_action_dim(),) == (80,)
    assert h2.shape == h.shape
    assert bool(jnp.all(jnp.isfinite(a)))


def test_rollout_and_loss(setup):
    topo, model, specs, params, lib = setup
    T = 12
    gt_qpos = lib["qpos"][0, :T]
    gt_qvel = lib["qvel"][0, :T]
    gt_wbpos = lib["wbpos"][0, :T]
    pred = KN.kin_net_rollout(params, topo, model, specs, gt_qpos, gt_qvel)
    assert pred["qpos"].shape == (T, 76)
    assert pred["qvel"].shape == (T, 75)
    assert pred["action"].shape == (T - 1, 80)
    assert bool(jnp.all(jnp.isfinite(pred["qpos"])))

    weights = {"r_pos_loss": 1.0, "r_rot_loss": 1.0, "p_rot_loss": 1.0,
               "vl_loss": 0.1, "va_loss": 0.1, "ee_loss": 1.0}
    total, terms = KN.kin_net_loss(pred, gt_qpos, gt_qvel, gt_wbpos, weights)
    assert np.isfinite(float(total)) and float(total) >= 0
    assert set(terms) == set(weights)

    # full scheduled sampling (teacher forcing) pins the rollout to GT
    ss = jnp.ones((T,), bool)
    forced = KN.kin_net_rollout(params, topo, model, specs, gt_qpos, gt_qvel,
                                ss_mask=ss)
    np.testing.assert_allclose(np.asarray(forced["qpos"][1:]),
                               np.asarray(gt_qpos[1:]), atol=1e-5)


@pytest.mark.slow
def test_grad_flows(setup):
    """One supervised gradient is finite and nonzero (the KinNet training
    signal, agent_uhm.py full_update path)."""
    topo, model, specs, params, lib = setup
    T = 8
    gt_qpos, gt_qvel = lib["qpos"][0, :T], lib["qvel"][0, :T]
    gt_wbpos = lib["wbpos"][0, :T]
    weights = {"r_pos_loss": 1.0, "p_rot_loss": 1.0, "ee_loss": 1.0}

    def loss_fn(p):
        pred = KN.kin_net_rollout(p, topo, model, specs, gt_qpos, gt_qvel)
        return KN.kin_net_loss(pred, gt_qpos, gt_qvel, gt_wbpos, weights)[0]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in leaves)


@pytest.mark.slow
def test_uhm_agent_supervised_smoke():
    """UHMAgent full_update (supervised KinNet training) runs and returns a
    finite decreasing-capable loss on tiny shapes."""
    from uhc_tpu.config.config import Config
    from uhc_tpu.learn.agent_uhm import UHMAgent

    cfg = Config.from_dict("uhm_test", {
        "model_specs": {"mlp_hsize": [32, 32], "rnn_hdim": 16},
        "policy_specs": {"full_update": True, "rl_update": False,
                         "gt_rate": 0.3},
        "policy_hsize": [32, 32], "value_hsize": [32, 32],
        "num_optim_epoch": 2, "min_batch_size": 64, "mini_batch_size": 64,
    })
    agent = UHMAgent(cfg, NEUTRAL, num_envs=2, horizon=2, max_seq_len=16,
                     results_dir="/tmp/uhm_test")
    l0 = agent.full_update(window=8, batch=2)
    assert np.isfinite(l0)
    stats = agent.optimize_policy(0)
    assert np.isfinite(stats["supervised_loss"])
    agent.save_checkpoint(0)
    agent.load_checkpoint(0)


def test_env_obs_layout_matches_env():
    """env_obs=True supervised rollouts must build EXACTLY the feature
    vector the hierarchical env feeds the net (humanoid_kin.ar_obs_from ==
    get_ar_obs_v1 on the same state/target)."""
    import dataclasses as DC

    from uhc_tpu.config.config import EnvConfig
    from uhc_tpu.data.dataset import build_expert_library, load_motion_file
    from uhc_tpu.envs import humanoid_kin as K
    from uhc_tpu.learn import kin_net as KN
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

    xml = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
    topo, model = load_mjcf_humanoid(xml)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(
        "/root/reference/sample_data/standing_neutral.pkl")
    lib, _ = build_expert_library(topo, model, seqs, max_len=10)
    cc_cfg = EnvConfig()

    state = K.kin_env_reset(topo, model, K.KinConfig(),
                            jax.random.PRNGKey(0),
                            jnp.zeros((), jnp.int32), lib)
    obs_env = K.get_ar_obs_v1(topo, model, cc_cfg, state, lib)
    gt_next = K.context_at(lib, state.seq_idx, jnp.asarray(1))["qpos"]
    obs_pure = K.ar_obs_from(topo, model, cc_cfg, state.qpos, state.qvel,
                             gt_next)
    np.testing.assert_allclose(np.asarray(obs_env), np.asarray(obs_pure),
                               atol=1e-6)

    # env_obs rollout runs and produces the same shapes as the default
    specs = KN.KinNetSpecs(env_obs=True)
    params = KN.kin_net_init(jax.random.PRNGKey(1), topo, specs)
    qpos_w = lib["qpos"][0, :8]
    qvel_w = lib["qvel"][0, :8]
    out = KN.kin_net_rollout(params, topo, model, specs, qpos_w, qvel_w)
    assert out["qpos"].shape == qpos_w.shape
    assert np.all(np.isfinite(np.asarray(out["qpos"])))
