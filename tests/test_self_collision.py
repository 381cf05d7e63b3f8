"""Body-body self-collision (VERDICT round-1 item 6).

MuJoCo collides all non-excluded geom pairs (smpl_parser.py:315-329); the
engine approximates the important pairs with per-body sphere chains
(engine.self_collision_terms, pair set smpl.constants.self_collision_pairs).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.physics import engine as E
from uhc_tpu.smpl.constants import self_collision_pairs


def test_pair_table(humanoid_setup):
    topo, model, cfg, lib, aux = humanoid_setup
    pairs = self_collision_pairs(topo)
    names = topo.body_names
    assert len(pairs) >= 20
    for a, b in pairs:
        assert a != b
        # no parent-child pairs
        assert topo.parents[a] != b and topo.parents[b] != a
    assert (names.index("L_Knee"), names.index("R_Knee")) in \
        [tuple(p) for p in pairs]


def test_sc_geometry(humanoid_setup):
    topo, model, cfg, lib, aux = humanoid_setup
    sc = np.asarray(model.sc_point)
    r = np.asarray(model.sc_radius)
    assert sc.shape == (topo.nbody, 3, 3)
    assert np.all(r > 0.0) and np.all(r < 0.5)


def test_rest_pose_no_forces(humanoid_setup):
    """The curated pairs must NOT fire in the standing rest pose."""
    topo, model, cfg, lib, aux = humanoid_setup
    qpos = lib["qpos"][0, 0]
    kin = E.fk(topo, model, qpos)
    vel = E.velocities(topo, kin, jnp.zeros(topo.nv))
    F, T = E.self_collision_terms(topo, model, kin, vel)
    assert float(jnp.abs(F).max()) == 0.0, \
        "self-collision fires in the rest pose — pair set or radii wrong"


def test_overlap_forces_separate(humanoid_setup):
    """Crossed legs: knees pushed into overlap produce equal-opposite
    separating forces."""
    topo, model, cfg, lib, aux = humanoid_setup
    names = topo.body_names
    qpos = np.asarray(lib["qpos"][0, 0]).copy()
    # rotate both hips inward until the knee (shank) spheres overlap
    iL = names.index("L_Hip") - 1
    iR = names.index("R_Hip") - 1
    found = False
    for ang in (0.3, 0.5, 0.7, 0.9):
        q = qpos.copy()
        q[7 + 3 * iL + 2] = -ang   # hip x-rotations swing legs inward
        q[7 + 3 * iR + 2] = ang
        q[7 + 3 * iL + 0] = 0.4
        q[7 + 3 * iR + 0] = -0.4
        kin = E.fk(topo, model, jnp.asarray(q))
        vel = E.velocities(topo, kin, jnp.zeros(topo.nv))
        F, T = E.self_collision_terms(topo, model, kin, vel)
        Fn = np.asarray(F)
        if np.abs(Fn).max() > 0:
            found = True
            # Newton's third law over the whole wrench
            np.testing.assert_allclose(Fn.sum(0), 0.0, atol=1e-3)
            # the two knees are pushed apart
            kL, kR = names.index("L_Knee"), names.index("R_Knee")
            if np.abs(Fn[kL]).max() > 0:
                dirLR = np.asarray(kin["xipos"][kL] - kin["xipos"][kR])
                assert np.dot(Fn[kL], dirLR) > 0.0
            break
    assert found, "no leg configuration produced knee-knee contact"


def test_env_step_with_self_collision(humanoid_setup):
    topo, model, cfg, lib, aux = humanoid_setup
    cfg = dataclasses.replace(cfg, self_collision=True, env_init_noise=0.0,
                              reactive_v=0)
    state = H.env_reset(topo, model, cfg, jax.random.PRNGKey(0),
                        jnp.zeros((), jnp.int32), lib, aux["neutral_qpos"],
                        aux["neutral_qvel"], train=False)
    ndof, vf, meta = H.action_dims(topo, cfg)
    state2, obs, reward, terms, done = H.env_step(
        topo, model, cfg, state, jnp.zeros(ndof + vf + meta), lib,
        aux["jpos_diffw"], aux["body_diffw"], train=False)
    assert bool(jnp.all(jnp.isfinite(state2.qpos)))
    assert not bool(done)
    # standing pose: self-collision must not disturb the rest behavior
    assert float(reward) > 0.4
