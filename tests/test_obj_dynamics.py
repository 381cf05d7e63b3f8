"""Dynamic scene objects (VERDICT r3 item 6).

Reference: objects are real simulated free-joint bodies built into the robot
XML and stepped with contacts (uhc/envs/humanoid_im.py:159-175 objs_info;
:1284-1287 obj qpos+qvel in the sim state; humanoid_kin_v1.py:477
get_obj_qpos). Here each object is an independent 6-dof rigid body
(physics/objects.py) coupled to the humanoid through penalty contacts.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.data.dataset import build_expert_library, load_motion_file
from uhc_tpu.physics import objects as OBJ


def _box(mass=2.0, size=(0.15, 0.15, 0.15)):
    return OBJ.make_obj_model([{"kind": "box", "size": list(size),
                                "mass": mass}])


def test_box_drop_settles(humanoid_setup):
    """A free box dropped from 0.5 m lands and settles at rest with its
    bottom face on the ground (z = half extent)."""
    topo, model, cfg, lib, aux = humanoid_setup
    om = _box()
    qp = jnp.asarray([[0.0, 0.0, 0.5, 1.0, 0.0, 0.0, 0.0]], jnp.float32)
    qv = jnp.zeros((1, 6), jnp.float32)

    def sub(carry, _):
        qp, qv = carry
        z3 = jnp.zeros((1, 3), jnp.float32)
        qp, qv = OBJ.obj_substep(model, om, qp, qv, z3, z3)
        return (qp, qv), None

    (qp, qv), _ = jax.jit(lambda qp, qv: jax.lax.scan(
        sub, (qp, qv), None, length=900))(qp, qv)   # 2 s at 450 Hz
    qp, qv = np.asarray(qp), np.asarray(qv)
    assert abs(qp[0, 2] - 0.15) < 0.02, f"rest height {qp[0, 2]}"
    assert np.all(np.abs(qv[0]) < 0.05), f"not at rest: {qv[0]}"
    # no lateral drift, orientation upright
    assert np.all(np.abs(qp[0, :2]) < 0.01)
    assert qp[0, 3] > 0.99


def test_sphere_drop_settles(humanoid_setup):
    topo, model, cfg, lib, aux = humanoid_setup
    om = OBJ.make_obj_model([{"kind": "sphere", "size": 0.1, "mass": 1.0}])
    qp = jnp.asarray([[0.0, 0.0, 0.4, 1.0, 0.0, 0.0, 0.0]], jnp.float32)
    qv = jnp.zeros((1, 6), jnp.float32)

    def sub(carry, _):
        qp, qv = carry
        z3 = jnp.zeros((1, 3), jnp.float32)
        return OBJ.obj_substep(model, om, qp, qv, z3, z3), None

    (qp, qv), _ = jax.jit(lambda qp, qv: jax.lax.scan(
        sub, (qp, qv), None, length=900))(qp, qv)
    assert abs(float(qp[0, 2]) - 0.1) < 0.02
    assert np.all(np.abs(np.asarray(qv[0])) < 0.05)


def test_contact_wrench_is_equal_and_opposite(humanoid_setup):
    """Humanoid sphere penetrating a box: forces on the two sides cancel."""
    from uhc_tpu.physics import engine as E

    topo, model, cfg, lib, aux = humanoid_setup
    qpos = lib["qpos"][0, 0]
    kin = E.fk(topo, model, qpos)
    vel = E.velocities(topo, kin, jnp.zeros(topo.nv, qpos.dtype))
    om = _box(size=(0.3, 0.3, 0.3))
    # center the box on the pelvis so several SC spheres penetrate
    pos = kin["xpos"][0:1]
    quat = jnp.asarray([[1.0, 0, 0, 0]], jnp.float32)
    z = jnp.zeros((1, 3), jnp.float32)
    Fb, Tb, Fo, To = OBJ.humanoid_obj_contacts(
        topo, model, kin, vel, om, pos, quat, z, z)
    tot_h = np.asarray(jnp.sum(Fb, axis=0))
    tot_o = np.asarray(Fo[0])
    assert np.linalg.norm(tot_h) > 1.0, "no contact generated"
    np.testing.assert_allclose(tot_h, -tot_o, rtol=1e-4, atol=1e-4)


def test_humanoid_displaces_dynamic_box(humanoid_setup):
    """Engine-level: a box overlapping the humanoid's thigh is pushed away
    over a few control steps while the sim stays finite (VERDICT item 6
    acceptance)."""
    from uhc_tpu.envs import humanoid_im as H

    topo, model, cfg, lib, aux = humanoid_setup
    qpos = lib["qpos"][0, 0]
    qvel = jnp.zeros(topo.nv, qpos.dtype)
    from uhc_tpu.physics import engine as E
    kin = E.fk(topo, model, qpos)
    thigh = kin["xpos"][1]          # L_Hip body origin
    om = _box(mass=1.0, size=(0.12, 0.12, 0.12))
    obj_qp = jnp.concatenate([
        thigh + jnp.asarray([0.05, 0.0, 0.0], qpos.dtype),
        jnp.asarray([1.0, 0, 0, 0], qpos.dtype)])[None]
    obj_qv = jnp.zeros((1, 6), qpos.dtype)
    ndof, vf, meta = H.action_dims(topo, cfg)
    action = jnp.zeros((ndof + vf + meta,), qpos.dtype)
    target = qpos[7:]

    sim = jax.jit(lambda qp, qv, oq, ov: H.do_simulation(
        topo, model, cfg, qp, qv, action, target, 1.0,
        obj=(om, oq, ov)))
    start = np.asarray(obj_qp[0, :3])
    for _ in range(10):
        qpos, qvel, obj_qp, obj_qv = sim(qpos, qvel, obj_qp, obj_qv)
    end = np.asarray(obj_qp[0, :3])
    assert np.all(np.isfinite(np.asarray(qpos)))
    assert np.all(np.isfinite(end))
    moved = np.linalg.norm(end[:2] - start[:2])
    assert moved > 0.02, f"box did not move ({moved:.4f} m)"
    # pushed away from the thigh, not into it
    assert end[0] > start[0] - 1e-3


def test_kin_env_rollout_with_dynamic_obj(humanoid_setup):
    """Obj-aware kin_env rollout runs end to end with a dynamic object."""
    from uhc_tpu.envs import humanoid_kin as K

    topo, model, cfg, _, aux = humanoid_setup
    seqs = load_motion_file(
        "/root/reference/sample_data/standing_neutral.pkl")
    key = next(iter(seqs))
    T = 20
    seqs[key]["pose_aa"] = np.asarray(seqs[key]["pose_aa"])[:T]
    if seqs[key].get("trans") is not None:
        seqs[key]["trans"] = np.asarray(seqs[key]["trans"])[:T]
    obj = np.zeros((T, 7), np.float32)
    obj[:, 0] = 0.6
    obj[:, 2] = 0.15
    obj[:, 3] = 1.0
    seqs[key]["obj_pose"] = obj
    lib, _ = build_expert_library(topo, model, seqs, max_len=T)

    om = _box(mass=2.0)
    kc = K.KinConfig(env_episode_len=T)
    state = K.kin_env_reset(topo, model, kc, jax.random.PRNGKey(0),
                            jnp.zeros((), jnp.int32), lib, dynamic_obj=True)
    assert state.obj_qpos is not None and state.obj_qvel is not None
    cc_fn = lambda o: jnp.zeros(
        (len(np.asarray(aux["jpos_diffw"])) * 3 - 3 + 6 + 30,), o.dtype)
    # action dims: use the env's own accounting for the frozen controller
    from uhc_tpu.envs import humanoid_im as H
    ndof, vf, meta = H.action_dims(topo, cfg)
    cc_fn = lambda o: jnp.zeros((ndof + vf + meta,), o.dtype)
    a = jnp.zeros((K.kin_action_dim(topo),), jnp.float32)
    step = jax.jit(lambda s: K.kin_env_step(
        topo, model, kc, cfg, s, a, lib, cc_fn, aux["jpos_diffw"],
        train=False, obj_model=om))
    for _ in range(3):
        state, obs, r, terms, done = step(state)
    assert np.all(np.isfinite(np.asarray(state.qpos)))
    assert np.all(np.isfinite(np.asarray(state.obj_qpos)))
    assert np.all(np.isfinite(np.asarray(obs)))
