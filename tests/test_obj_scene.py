"""Object-scene env support (VERDICT r2 item 7).

Reference: uhc/data_loaders/dataset_smpl_obj.py carries per-frame object
free-joint qpos; uhc/envs/humanoid_im.py:1285-1292 appends it to the sim
state at reset. Here the track rides EnvState.obj_qpos, kinematic and
expert-driven, advancing with the clip on every control step.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.data.dataset import build_expert_library, load_motion_file


@pytest.fixture(scope="module")
def obj_setup(humanoid_setup):
    topo, model, cfg, _, aux = humanoid_setup
    seqs = load_motion_file(
        "/root/reference/sample_data/standing_neutral.pkl")
    key = next(iter(seqs))
    T = len(np.asarray(seqs[key]["pose_aa"]))
    T = min(T, 40)
    seqs[key]["pose_aa"] = np.asarray(seqs[key]["pose_aa"])[:T]
    if seqs[key].get("trans") is not None:
        seqs[key]["trans"] = np.asarray(seqs[key]["trans"])[:T]
    # one object sliding along +x, free-joint qpos (x y z qw qx qy qz)
    obj = np.zeros((T, 7), np.float32)
    obj[:, 0] = np.linspace(0.5, 1.5, T)
    obj[:, 2] = 0.25
    obj[:, 3] = 1.0
    seqs[key]["obj_pose"] = obj
    lib, keys = build_expert_library(topo, model, seqs, max_len=T)
    return topo, model, cfg, lib, aux, obj


def test_obj_track_in_library(obj_setup):
    topo, model, cfg, lib, aux, obj = obj_setup
    assert "obj_pose" in lib
    assert lib["obj_pose"].shape[-1] == 7


def test_reset_and_step_follow_track(obj_setup):
    from uhc_tpu.envs import humanoid_im as H

    topo, model, cfg, lib, aux, obj = obj_setup
    state = H.env_reset(topo, model, cfg, jax.random.PRNGKey(0),
                        jnp.zeros((), jnp.int32), lib, aux["neutral_qpos"],
                        aux["neutral_qvel"], start_ind=0, train=False)
    assert state.obj_qpos is not None
    np.testing.assert_allclose(np.asarray(state.obj_qpos), obj[0], atol=1e-6)

    ndof, vf, meta = H.action_dims(topo, cfg)
    action = jnp.zeros((ndof + vf + meta,))
    step = jax.jit(lambda s: H.env_step(
        topo, model, cfg, s, action, lib, aux["jpos_diffw"],
        aux["body_diffw"], train=False))
    for t in range(1, 4):
        state, *_ = step(state)
        # the object advanced kinematically with the clip
        np.testing.assert_allclose(np.asarray(state.obj_qpos), obj[t],
                                   atol=1e-6)
    assert not np.allclose(obj[0], obj[3])


@pytest.mark.slow
def test_batched_step_carries_obj(obj_setup):
    from uhc_tpu.envs import humanoid_im as H

    topo, model, cfg, lib, aux, obj = obj_setup
    B = 2
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = jax.vmap(lambda k: H.env_reset(
        topo, model, cfg, k, jnp.zeros((), jnp.int32), lib,
        aux["neutral_qpos"], aux["neutral_qvel"], start_ind=0,
        train=False))(keys)
    ndof, vf, meta = H.action_dims(topo, cfg)
    actions = jnp.zeros((B, ndof + vf + meta))
    step = H.make_env_step_batched(topo, cfg)
    states2, *_ = jax.jit(lambda s: step(
        model, s, actions, lib, aux["jpos_diffw"], aux["body_diffw"],
        train=False))(states)
    assert states2.obj_qpos.shape == (B, 7)
    np.testing.assert_allclose(np.asarray(states2.obj_qpos[0]), obj[1],
                               atol=1e-6)
