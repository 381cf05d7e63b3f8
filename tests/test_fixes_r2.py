"""Round-2 correctness fixes (VERDICT.md item 7 / ADVICE.md):

* trainable exploration std when fix_std=False (ppo.py),
* obs_v3 honoring cfg fut_frames/skip,
* world_rfc_explicit: unweighted velocity + past-end expert-bangvel zeroing,
* end_reward episode-end bonus in the rollout,
* explicit-RFC contact-point projection + contact gating,
* gaussian_kl closed form.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from uhc_tpu.config.config import Config, EnvConfig
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.learn import nets
from uhc_tpu.learn.ppo import PPOState, make_ppo_update
from uhc_tpu.physics import engine as E


# ---------------------------------------------------------------------------
# PPO log_std training (reference: action_log_std is a policy parameter,
# khrylib/rl/core/policy_gaussian.py:8)
# ---------------------------------------------------------------------------


def _tiny_ppo(fix_std):
    obs_dim, act_dim = 4, 3
    key = jax.random.PRNGKey(0)
    cfg = Config(policy_hsize=(8,), value_hsize=(8,), actor_type="gauss",
                 fix_std=fix_std)
    policy_params, mean_fn = nets.make_policy(cfg, obs_dim, act_dim, key)
    log_std = policy_params.pop("log_std")
    value_params = nets.value_init(key, obs_dim, (8,))
    value_fn = lambda p, x: nets.value_apply(p, x, "relu")
    popt, vopt = optax.adam(1e-3), optax.adam(1e-3)
    lopt = None if fix_std else optax.adam(1e-3)
    state = PPOState(policy_params, value_params,
                     popt.init(policy_params), vopt.init(value_params),
                     None if fix_std else lopt.init(log_std))
    update = make_ppo_update(mean_fn, value_fn, popt, vopt,
                             clip_epsilon=0.2, num_epochs=2,
                             minibatch_size=16, fix_std=fix_std,
                             log_std_optimizer=lopt)
    N = 32
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    batch = {
        "states": jax.random.normal(k1, (N, obs_dim)),
        "actions": jax.random.normal(k2, (N, act_dim)),
        "advantages": jnp.linspace(-1, 1, N),
        "returns": jnp.zeros(N),
        "exps": jnp.ones(N),
    }
    return update, state, log_std, batch


def test_log_std_trains_when_not_fixed():
    update, state, log_std, batch = _tiny_ppo(fix_std=False)
    _, new_log_std, _ = update(state, log_std, batch, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(new_log_std), np.asarray(log_std)), \
        "log_std must receive gradient updates when fix_std=False"


def test_log_std_frozen_when_fixed():
    update, state, log_std, batch = _tiny_ppo(fix_std=True)
    _, new_log_std, _ = update(state, log_std, batch, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(new_log_std),
                                  np.asarray(log_std))


def test_fix_std_false_requires_optimizer():
    with pytest.raises(ValueError):
        make_ppo_update(lambda p, x: x, lambda p, x: x, optax.adam(1e-3),
                        optax.adam(1e-3), 0.2, 1, 8, fix_std=False,
                        log_std_optimizer=None)


# ---------------------------------------------------------------------------
# obs_v3 cfg fut_frames / skip (reference humanoid_im.py:759-762)
# ---------------------------------------------------------------------------


def test_obs_v3_respects_cfg(humanoid_setup):
    topo, model, cfg, lib, aux = humanoid_setup
    state = H.env_reset(topo, model, cfg, jax.random.PRNGKey(0),
                        jnp.zeros((), jnp.int32), lib, aux["neutral_qpos"],
                        aux["neutral_qvel"], train=False)
    for ff, sk in ((10, 10), (3, 5), (1, 1)):
        c3 = dataclasses.replace(cfg, obs_v=3, fut_frames=ff, obs_skip=sk)
        obs = H.get_obs(topo, model, c3, state, lib)
        d2 = H.obs_dim(topo, dataclasses.replace(cfg, obs_v=2))
        assert obs.shape == (H.obs_dim(topo, c3),) == (ff * d2,)
    # YAML key names: fut_frames / skip
    c = Config.from_dict("t", {"obs_v": 3, "fut_frames": 4, "skip": 7})
    assert c.env.fut_frames == 4 and c.env.obs_skip == 7


# ---------------------------------------------------------------------------
# world_rfc_explicit parity (reference reward_function.py:253-345)
# ---------------------------------------------------------------------------


def _explicit_cfg(cfg):
    return dataclasses.replace(
        cfg, reward_id="world_rfc_explicit",
        residual_force_mode="explicit", residual_force_torque=True,
        w_vf=0.1)


def test_explicit_velocity_unweighted(humanoid_setup):
    """Zeroing jpos_diffw must NOT change the explicit velocity term (the
    reference explicit variant does not weight bangvel), while the implicit
    variant must change."""
    from uhc_tpu.rewards.reward_function import (_explicit_terms, _terms)

    topo, model, cfg, lib, aux = humanoid_setup
    cfg = _explicit_cfg(cfg)
    rng = jax.random.PRNGKey(3)
    state = H.env_reset(topo, model, cfg, rng, jnp.zeros((), jnp.int32), lib,
                        aux["neutral_qpos"], aux["neutral_qvel"], train=False)
    # fake a step: perturb prev_bquat so bangvel != 0
    state = dataclasses.replace(
        state, cur_t=jnp.ones((), jnp.int32),
        prev_bquat=H.get_body_quat(state.qpos + 0.01))
    ndof, vf, meta = H.action_dims(topo, cfg)
    action = jnp.zeros(ndof + vf + meta)

    aux0 = dict(aux)
    auxw = dict(aux, jpos_diffw=aux["jpos_diffw"] * 0.0)
    v_e0 = _explicit_terms(topo, model, cfg, state, action, lib, aux0)[1]
    v_ew = _explicit_terms(topo, model, cfg, state, action, lib, auxw)[1]
    np.testing.assert_allclose(np.asarray(v_e0), np.asarray(v_ew), rtol=1e-6)
    v_i0 = _terms(topo, model, cfg, state, action, lib, aux0)[1]
    v_iw = _terms(topo, model, cfg, state, action, lib, auxw)[1]
    assert not np.allclose(np.asarray(v_i0), np.asarray(v_iw))


def test_explicit_bangvel_zeroed_past_end(humanoid_setup):
    """Past the sequence end the expert bangvel is zeroed (:303-304): the
    velocity term must equal exp(-k_v |cur_bangvel|²)."""
    from uhc_tpu.rewards.reward_function import _explicit_terms
    from uhc_tpu.maths import angvel_fd

    topo, model, cfg, lib, aux = humanoid_setup
    cfg = _explicit_cfg(cfg)
    state = H.env_reset(topo, model, cfg, jax.random.PRNGKey(4),
                        jnp.zeros((), jnp.int32), lib, aux["neutral_qpos"],
                        aux["neutral_qvel"], train=False)
    L = int(lib["len"][0])
    state = dataclasses.replace(
        state, cur_t=jnp.asarray(L + 3, jnp.int32),
        prev_bquat=H.get_body_quat(state.qpos + 0.02))
    ndof, vf, meta = H.action_dims(topo, cfg)
    action = jnp.zeros(ndof + vf + meta)
    v = _explicit_terms(topo, model, cfg, state, action, lib, aux)[1]
    cur_bangvel = angvel_fd(state.prev_bquat, H.get_body_quat(state.qpos),
                            cfg.ctrl_dt)
    expected = jnp.exp(-cfg.k_v * jnp.sum(cur_bangvel**2))
    np.testing.assert_allclose(float(v), float(expected), rtol=1e-5)


# ---------------------------------------------------------------------------
# end_reward bonus (reference agent.py:75-76, agent_copycat.py:334)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_end_reward_bonus(humanoid_setup):
    from uhc_tpu.learn.rollout import init_env_states, make_rollout_fn

    topo, model, cfg, lib, aux = humanoid_setup
    # short window so episodes end within the horizon
    cfg = dataclasses.replace(cfg, env_episode_len=3, env_init_noise=0.0,
                              reactive_v=0)
    obs_dim = H.obs_dim(topo, cfg)
    ndof, vf, meta = H.action_dims(topo, cfg)
    act_dim = ndof + vf + meta
    key = jax.random.PRNGKey(0)
    params = {"w": jnp.zeros((obs_dim, act_dim))}
    mean_fn = lambda p, x: x @ p["w"]
    from uhc_tpu.learn import running_norm as RN
    roll = make_rollout_fn(topo, cfg, mean_fn, horizon=6)
    states = init_env_states(topo, cfg, model, lib, aux, key, 4)
    rs = RN.init(obs_dim)
    out = roll(model, lib, aux, params, jnp.zeros(act_dim) - 10.0, rs, states,
               key, 0.0, 1.0, jnp.zeros(1), end_reward=5.0)
    traj = out[2]
    diff = np.asarray(traj.rewards - traj.c_rewards)
    ends = diff > 1.0
    assert ends.any(), "some episode must hit env_episode_len within horizon"
    np.testing.assert_allclose(diff[ends], 5.0, rtol=1e-6)
    np.testing.assert_allclose(diff[~ends], 0.0, atol=1e-7)


# ---------------------------------------------------------------------------
# explicit-RFC projection + gating
# ---------------------------------------------------------------------------


def test_project_vf_cp(humanoid_setup):
    topo, model, cfg, lib, aux = humanoid_setup
    nb = topo.nbody
    far = jnp.full((nb, 3), 10.0)
    proj = E.project_vf_cp(model, far)
    pts = np.asarray(model.contact_point)
    m = np.asarray(model.contact_mask)[..., None]
    hi = np.max(np.where(m > 0, pts, -1e9), axis=-2)
    np.testing.assert_allclose(np.asarray(proj), hi, rtol=1e-5)
    # interior points (body origin is inside every hull AABB here) unchanged
    inside = jnp.zeros((nb, 3))
    lo = np.min(np.where(m > 0, pts, 1e9), axis=-2)
    exp = np.clip(0.0, lo, hi)
    np.testing.assert_allclose(np.asarray(E.project_vf_cp(model, inside)),
                               exp, atol=1e-6)


def test_vf_contact_gate(humanoid_setup):
    topo, model, cfg, lib, aux = humanoid_setup
    qpos = lib["qpos"][0, 0]
    kin = E.fk(topo, model, qpos)
    gate_h = np.asarray(E.vf_contact_gate(model, kin, "height"))
    xz = np.asarray(kin["xpos"][:, 2])
    np.testing.assert_array_equal(gate_h, (xz <= 0.12).astype(np.float32))
    # standing pose: feet near ground are gated on, head is off
    assert gate_h.sum() >= 1 and gate_h[13] == 0.0
    gate_g = np.asarray(E.vf_contact_gate(model, kin, "ground"))
    assert set(np.unique(gate_g)) <= {0.0, 1.0}


def test_gaussian_kl():
    m = jnp.zeros((2, 3))
    ls = jnp.zeros((3,))
    np.testing.assert_allclose(
        np.asarray(nets.gaussian_kl(m, ls, m, ls)), 0.0, atol=1e-7)
    kl = nets.gaussian_kl(m, ls, m + 1.0, ls)
    np.testing.assert_allclose(np.asarray(kl), 1.5, rtol=1e-6)


def test_succ_percent_one_ulp():
    """TPU f32 division (reciprocal-multiply) can return cur_t/(wlen-1) one
    ulp below 1.0 (209/209 -> 0.99999994 on device); the succ criterion
    must not read that as a truncated clip."""
    import numpy as np
    from uhc_tpu.learn.metrics import compute_metrics
    T, nj = 4, 24
    rng = np.random.RandomState(0)
    q = rng.randn(T, 76).astype(np.float32)
    j = rng.randn(T, nj * 3).astype(np.float32)
    one_ulp_under = float(np.nextafter(np.float32(1.0), np.float32(0.0)))
    m = compute_metrics(q, q, j, j, False, one_ulp_under)
    assert m["succ"] == 1.0
    m2 = compute_metrics(q, q, j, j, False, 0.95)
    assert m2["succ"] == 0.0
