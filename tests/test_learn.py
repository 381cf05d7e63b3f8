"""Learner tests: GAE semantics, running norm, PPO smoke, full train step,
and the data-parallel mesh path (8 virtual CPU devices)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_gae_matches_reference_loop():
    """Reverse-scan GAE must equal the reference python loop
    (khrylib/rl/core/common.py:5) on masked episode data."""
    from uhc_tpu.learn.gae import estimate_advantages

    rng = np.random.default_rng(0)
    T, B = 40, 3
    gamma, tau = 0.95, 0.95
    rewards = rng.uniform(0, 1, (T, B)).astype(np.float32)
    masks = (rng.uniform(size=(T, B)) > 0.2).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)

    adv, ret = estimate_advantages(jnp.asarray(rewards), jnp.asarray(masks),
                                   jnp.asarray(values), jnp.zeros(B),
                                   gamma, tau)

    # reference-style loop per env column (flattened exactly like their (N,1))
    adv_ref = np.zeros((T, B))
    for b in range(B):
        prev_value = 0.0
        prev_adv = 0.0
        for i in reversed(range(T)):
            delta = rewards[i, b] + gamma * prev_value * masks[i, b] - values[i, b]
            adv_ref[i, b] = delta + gamma * tau * prev_adv * masks[i, b]
            prev_value = values[i, b]
            prev_adv = adv_ref[i, b]
    ret_ref = values + adv_ref
    adv_ref = (adv_ref - adv_ref.mean()) / (adv_ref.std(ddof=1) + 1e-8)
    np.testing.assert_allclose(np.asarray(ret), ret_ref, atol=1e-4)
    # whitening ddof differs (jnp.std is population); compare directionally
    np.testing.assert_allclose(np.asarray(adv), adv_ref, atol=2e-2)


def test_running_norm_matches_welford():
    from uhc_tpu.learn import running_norm as RN

    rng = np.random.default_rng(1)
    xs = rng.normal(2.0, 3.0, size=(5, 17, 4)).astype(np.float32)
    rs = RN.init(4)
    for batch in xs:
        rs = RN.update_batch(rs, jnp.asarray(batch))
    flat = xs.reshape(-1, 4)
    np.testing.assert_allclose(np.asarray(rs.mean), flat.mean(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(RN.std(rs)), flat.std(0, ddof=1),
                               rtol=1e-3)
    y = RN.normalize(rs, jnp.asarray(flat[0]), clip=5.0)
    assert np.all(np.abs(np.asarray(y)) <= 5.0)


def test_policies_and_value_shapes():
    from uhc_tpu.config.config import Config
    from uhc_tpu.learn import nets

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (7, 32))
    cfg = Config(actor_type="mcp", policy_hsize=(24, 16), composer_dim=(8, 8),
                 num_primitive=3)
    params, fn = nets.make_policy(cfg, 32, 10, key)
    assert fn(params, x).shape == (7, 10)
    cfg2 = Config(actor_type="gauss", policy_hsize=(24, 16))
    params2, fn2 = nets.make_policy(cfg2, 32, 10, key)
    assert fn2(params2, x).shape == (7, 10)
    vp = nets.value_init(key, 32, (24, 16))
    assert nets.value_apply(vp, x, "relu").shape == (7,)
    lp = nets.gaussian_log_prob(fn(params, x), params["log_std"] * 0 - 2.3,
                                jnp.zeros((7, 10)))
    assert lp.shape == (7,)


@pytest.mark.slow
def test_full_train_step_tiny():
    """One full PPO epoch on tiny shapes must run and return finite stats."""
    from uhc_tpu.config.config import Config
    from uhc_tpu.learn.agent import CopycatAgent

    cfg = Config(policy_hsize=(32, 32), value_hsize=(32, 32),
                 actor_type="gauss", mini_batch_size=24, num_optim_epoch=2,
                 fix_std=True)
    agent = CopycatAgent(cfg, "/root/reference/sample_data/standing_neutral.pkl",
                         num_envs=4, horizon=3, max_seq_len=20,
                         results_dir="/tmp/uhc_tpu_test")
    stats = agent.optimize_policy(0)
    for k in ("reward_mean", "value_loss", "policy_loss"):
        assert np.isfinite(float(stats[k])), (k, stats[k])
    # checkpoint roundtrip
    agent.save_checkpoint(1)
    agent.load_checkpoint(1)
    stats2 = agent.optimize_policy(1)
    assert np.isfinite(float(stats2["reward_mean"]))


@pytest.mark.slow
def test_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)


@pytest.mark.slow
def test_nn_zoo_remnants():
    """ERD / CMLP / SimpleCNN / ResNet-feat / VideoStateNet shapes
    (khrylib/models inventory, SURVEY.md §2.3 "NN zoo")."""
    import jax
    import jax.numpy as jnp

    from uhc_tpu.learn import nets

    key = jax.random.PRNGKey(0)
    # ERD: (T, B, D) -> (T, B, D)
    p = nets.erd_init(key, 16)
    y, state = nets.erd_apply(p, jnp.zeros((5, 3, 16)))
    assert y.shape == (5, 3, 16)
    assert len(state) == 4
    # CMLP: layers re-read conditioning
    p = nets.cmlp_init(key, 8, 4, (32, 16))
    y = nets.cmlp_apply(p, jnp.ones((2, 4)), jnp.zeros((2, 8)))
    assert y.shape == (2, 16)
    # SimpleCNN: (B,3,224,224) -> (B,out)
    p = nets.simple_cnn_init(key, 128)
    y = nets.simple_cnn_apply(p, jnp.zeros((1, 3, 224, 224)))
    assert y.shape == (1, 128)
    # ResNet feature net
    p = nets.resnet_feat_init(key, 64, width=8, blocks=2)
    y = nets.resnet_feat_apply(p, jnp.zeros((2, 3, 64, 64)))
    assert y.shape == (2, 64)
    # VideoStateNet (gru + tcn variants)
    for kind in ("gru", "tcn"):
        p = nets.video_state_net_init(key, 32, v_hdim=128,
                                      v_net_type=kind, tcn_size=(64, 128))
        y = nets.video_state_net_apply(p, jnp.zeros((7, 32)))
        assert y.shape == (7, 128)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_video_nets_stragglers():
    """MobileNet / VideoRegNet / VideoForecastNet inventory twins
    (reference: uhc/khrylib/models/{mobile_net,video_reg_net,
    video_forecast_net}.py)."""
    import jax
    import jax.numpy as jnp

    from uhc_tpu.learn import nets

    key = jax.random.PRNGKey(0)
    # MobileNet-v1: size-agnostic global pool; tiny input keeps CPU fast.
    p = nets.mobile_net_init(key, 48)
    y = nets.mobile_net_apply(p, jnp.ones((2, 3, 32, 32)))
    assert y.shape == (2, 48)
    assert bool(jnp.all(jnp.isfinite(y)))
    # VideoRegNet: frames -> per-frame regression.
    p = nets.video_reg_net_init(key, out_dim=10, v_hdim=64, cnn_fdim=32,
                                cnn_type="mobile", v_net_type="gru",
                                mlp_dim=(40, 20))
    y = nets.video_reg_net_apply(p, jnp.ones((4, 3, 32, 32)))
    assert y.shape == (4, 10)
    assert bool(jnp.all(jnp.isfinite(y)))
    # VideoForecastNet: margin-window context + per-step state branch.
    for s_net_type in ("id", "gru"):
        p = nets.video_forecast_net_init(key, cnn_feat_dim=32, state_dim=12,
                                         v_hdim=16, v_margin=3,
                                         s_net_type=s_net_type, s_hdim=12)
        v_out, s_state = nets.video_forecast_initialize(
            p, jnp.ones((5, 32)))
        assert v_out.shape == (16,)
        feat, s_state = nets.video_forecast_step(
            p, v_out, s_state, jnp.ones((12,)))
        assert feat.shape == (16 + 12,)
        assert bool(jnp.all(jnp.isfinite(feat)))
