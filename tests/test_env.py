"""Env layer tests: expert featurization, obs layout, step/reset mechanics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.config.config import EnvConfig
from uhc_tpu.data.dataset import build_expert_library, load_motion_file, load_neutral
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.envs.expert import qpos_fk
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
    lib, keys = build_expert_library(topo, model, seqs, max_len=40)
    nq, nv = load_neutral(NEUTRAL)
    jpw, bdw = default_diff_weights()
    aux = {"neutral_qpos": nq, "neutral_qvel": nv,
           "jpos_diffw": jnp.asarray(jpw), "body_diffw": jnp.asarray(bdw)}
    cfg = EnvConfig(meta_pd=True, residual_force=True, reactive_v=1,
                    env_init_noise=0.01)
    return topo, model, cfg, lib, aux


def test_expert_features(setup):
    topo, model, cfg, lib, aux = setup
    assert lib["qpos"].shape == (1, 40, 76)
    assert lib["qvel"].shape == (1, 40, 75)
    assert lib["wbpos"].shape == (1, 40, 72)
    assert lib["wbquat"].shape == (1, 40, 96)
    assert lib["bquat"].shape == (1, 40, 96)
    assert lib["ee_wpos"].shape == (1, 40, 15)
    assert int(lib["len"][0]) == 40
    # standing clip: root stays ~0.9 m, head above 1.5 m
    assert 0.7 < float(lib["qpos"][0, 0, 2]) < 1.1
    assert float(lib["head_pos"][0, 0, 2]) > 1.4
    # quats are unit
    wq = np.asarray(lib["wbquat"][0, 0]).reshape(-1, 4)
    np.testing.assert_allclose(np.linalg.norm(wq, axis=1), 1.0, atol=1e-5)


def test_obs_dim_and_step(setup):
    topo, model, cfg, lib, aux = setup
    rng = jax.random.PRNGKey(0)
    state = H.env_reset(topo, model, cfg, rng, jnp.zeros((), jnp.int32), lib,
                        aux["neutral_qpos"], aux["neutral_qvel"], train=False)
    obs = H.obs_v2(topo, model, cfg, state, lib)
    assert obs.shape == (H.obs_dim(topo, cfg),) == (640,)
    assert bool(jnp.all(jnp.isfinite(obs)))

    ndof, vf, meta = H.action_dims(topo, cfg)
    assert (ndof, vf, meta) == (69, 6, 30)
    action = jnp.zeros(ndof + vf + meta)
    state2, obs2, reward, terms, done = H.env_step(
        topo, model, cfg, state, action, lib, aux["jpos_diffw"],
        aux["body_diffw"])
    assert int(state2.cur_t) == 1
    assert obs2.shape == obs.shape
    assert bool(jnp.all(jnp.isfinite(obs2)))
    assert 0.0 <= float(reward) <= 1.0
    assert terms.shape == (5,)
    # standing clip + zero action: high pose/com rewards, no instant fail
    assert not bool(done)
    assert float(reward) > 0.4, float(reward)


def test_zero_action_tracks_standing(setup):
    """Stable-PD toward the expert pose should track the standing clip for
    20 steps (0.66 s) without body-diff failure — the contact/PD calibration
    gate for the whole slice."""
    topo, model, cfg, lib, aux = setup
    rng = jax.random.PRNGKey(1)
    state = H.env_reset(topo, model, cfg, rng, jnp.zeros((), jnp.int32), lib,
                        aux["neutral_qpos"], aux["neutral_qvel"], train=False)
    ndof, vf, meta = H.action_dims(topo, cfg)
    action = jnp.zeros(ndof + vf + meta)

    @jax.jit
    def roll(state):
        def body(s, _):
            s2, _, r, _, d = H.env_step(topo, model, cfg, s, action, lib,
                                        aux["jpos_diffw"], aux["body_diffw"])
            return s2, (r, d)
        return jax.lax.scan(body, state, None, length=20)

    state2, (rews, dones) = roll(state)
    assert not bool(jnp.any(dones[:-1])), np.asarray(dones)
    assert float(jnp.mean(rews)) > 0.4, float(jnp.mean(rews))


def test_reset_reactive_and_noise(setup):
    topo, model, cfg, lib, aux = setup
    # train-mode resets with reactive_rate produce a mix of expert-pose and
    # neutral-pose inits; all must be finite and near the ground
    keys = jax.random.split(jax.random.PRNGKey(2), 32)
    states = jax.vmap(
        lambda k: H.env_reset(topo, model, cfg, k, jnp.zeros((), jnp.int32),
                              lib, aux["neutral_qpos"], aux["neutral_qvel"],
                              train=True))(keys)
    assert bool(jnp.all(jnp.isfinite(states.qpos)))
    assert bool(jnp.all(states.qpos[:, 2] > 0.3))
    assert bool(jnp.all(states.qpos[:, 2] < 1.5))


@pytest.mark.slow
def test_reward_registry_all_finite(setup):
    """Every registered reward family evaluates to a finite [0, +) scalar and
    per-term vector of the documented arity on a post-step state."""
    import dataclasses as dc

    from uhc_tpu.rewards.reward_function import reward_func

    topo, model, cfg, lib, aux = setup
    rng = jax.random.PRNGKey(3)
    state = H.env_reset(topo, model, cfg, rng, jnp.zeros((), jnp.int32), lib,
                        aux["neutral_qpos"], aux["neutral_qvel"], train=False)
    ndof, vf, meta = H.action_dims(topo, cfg)
    action = 0.05 * jax.random.normal(rng, (ndof + vf + meta,))
    state, _, _, _, _ = H.env_step(
        topo, model, cfg, state, action, lib, aux["jpos_diffw"],
        aux["body_diffw"])
    arity = {"local_rfc_implicit": 6, "local_rfc_explicit": 7,
             "world_rfc_implicit_v2": 6, "world_rfc_implicit_v3": 6}
    for name, fn in reward_func.items():
        c = cfg
        if "explicit" in name:
            c = dc.replace(cfg, residual_force_mode="explicit",
                           residual_force_bodies_num=1)
        r, terms = fn(topo, model, c, state, action, lib,
                      {"jpos_diffw": aux["jpos_diffw"],
                       "body_diffw": aux["body_diffw"]})
        assert np.isfinite(float(r)), name
        assert float(r) >= 0.0, name
        assert terms.shape == (arity.get(name, 5),), (name, terms.shape)
        assert bool(jnp.all(jnp.isfinite(terms))), name


def test_obs_versions_dims(setup):
    """Every implemented obs version matches its computed dim and is
    finite."""
    import dataclasses as dc

    topo, model, cfg, lib, aux = setup
    rng = jax.random.PRNGKey(1)
    state = H.env_reset(topo, model, cfg, rng, jnp.zeros((), jnp.int32), lib,
                        aux["neutral_qpos"], aux["neutral_qvel"], train=False)
    for v in (0, 1, 2, 3, 4, 5, 6):
        c = dc.replace(cfg, obs_v=v)
        obs = H.get_obs(topo, model, c, state, lib)
        assert obs.shape == (H.obs_dim(topo, c),), (v, obs.shape,
                                                    H.obs_dim(topo, c))
        assert bool(jnp.all(jnp.isfinite(obs))), v


@pytest.mark.slow
def test_eval_per_seq_params(setup):
    """fit_uhc protocol: make_eval_fn(per_seq_params=True) runs each
    sequence under its own stacked policy/ZFilter (cli/eval.py
    --singles-dir). A per-seq zero policy must reproduce the shared zero
    policy's trajectory exactly."""
    from uhc_tpu.learn import running_norm as RN
    from uhc_tpu.learn.evaluate import make_eval_fn

    topo, model, cfg, lib, aux = setup
    ndof, vf, meta = H.action_dims(topo, cfg)
    adim = ndof + vf + meta
    obs_dim = H.obs_dim(topo, cfg)
    # batch-style net: expects (B, D) like the real policies (einsum 'bp')
    mean_fn = lambda p, o: jnp.einsum("bp,pa->ba", o, p["w"])

    shared_p = {"w": jnp.zeros((obs_dim, adim))}
    shared_rs = RN.init(obs_dim)
    f_shared = make_eval_fn(topo, cfg, mean_fn, max_steps=5,
                            use_fast_solver=False)
    t1, fs1, pc1 = f_shared(model, lib, aux, shared_p, shared_rs)

    S = lib["len"].shape[0]
    stacked_p = jax.tree.map(lambda x: jnp.stack([x] * S), shared_p)
    stacked_rs = jax.tree.map(lambda x: jnp.stack([x] * S), shared_rs)
    f_per = make_eval_fn(topo, cfg, mean_fn, max_steps=5,
                         use_fast_solver=False, per_seq_params=True)
    t2, fs2, pc2 = f_per(model, lib, aux, stacked_p, stacked_rs)

    np.testing.assert_allclose(np.asarray(t1["pred_qpos"]),
                               np.asarray(t2["pred_qpos"]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(fs1), np.asarray(fs2))
    np.testing.assert_allclose(np.asarray(pc1), np.asarray(pc2), atol=1e-6)


def test_explicit_rfc_per_slot_fold(setup):
    """residual_force_bodies_num > 1 (ADVICE r4): N identical slots
    [cp, f, t] must act exactly like ONE slot [cp, N·f, N·t] — the
    per-slot cross-term fold (τ_eff = Σ t_i + cp_i × f_i at cp=0) is
    equivalent to the reference's per-idx mj_applyFT loop
    (uhc/envs/humanoid_im.py:1106-1131), which scales linearly in
    identical slots. Also covers the rfc_rate fix: explicit mode uses
    residual_force_scale alone (:1110), so rfc_rate must NOT change the
    result."""
    import dataclasses as dc

    topo, model, cfg, lib, aux = setup
    NE = 3
    cfg1 = dc.replace(cfg, residual_force=True,
                      residual_force_mode="explicit",
                      residual_force_torque=True,
                      residual_force_bodies_num=1, meta_pd=False)
    cfgN = dc.replace(cfg1, residual_force_bodies_num=NE)
    rng = jax.random.PRNGKey(11)
    state = H.env_reset(topo, model, cfg1, rng, jnp.zeros((), jnp.int32),
                        lib, aux["neutral_qpos"], aux["neutral_qvel"],
                        train=False)
    ndof, vf1, _ = H.action_dims(topo, cfg1)
    _, vfN, _ = H.action_dims(topo, cfgN)
    assert vfN == NE * vf1
    ctrl = 0.05 * jax.random.normal(rng, (ndof,))
    slot = 0.3 * jax.random.normal(jax.random.PRNGKey(12),
                                   (topo.nbody, 9))
    # one slot carrying N× force/torque at the same cp
    slot1 = jnp.concatenate([slot[:, :3], NE * slot[:, 3:]], axis=1)
    a1 = jnp.concatenate([ctrl, slot1.reshape(-1)])
    # N identical slots
    aN = jnp.concatenate(
        [ctrl, jnp.tile(slot[:, None, :], (1, NE, 1)).reshape(-1)])

    s1, _, _, _, _ = H.env_step(topo, model, cfg1, state, a1, lib,
                                aux["jpos_diffw"], aux["body_diffw"])
    sN, _, _, _, _ = H.env_step(topo, model, cfgN, state, aN, lib,
                                aux["jpos_diffw"], aux["body_diffw"])
    np.testing.assert_allclose(np.asarray(sN.qpos), np.asarray(s1.qpos),
                               atol=2e-4)
    # rfc_rate must be a no-op in explicit mode
    s1b, _, _, _, _ = H.env_step(topo, model, cfg1, state, a1, lib,
                                 aux["jpos_diffw"], aux["body_diffw"],
                                 rfc_rate=0.25)
    np.testing.assert_allclose(np.asarray(s1b.qpos), np.asarray(s1.qpos),
                               atol=1e-6)
