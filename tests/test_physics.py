"""Physics engine oracle tests.

The reference has no test suite (SURVEY.md §4); these are the analytic unit
tests that anchor the TPU engine:
  * mesh mass properties vs closed-form solids,
  * mass-matrix consistency with propagated velocities (kinetic energy),
  * free-fall: COM accelerates at g in any configuration (momentum),
  * gravity-only bias force equals -Jᵀmg,
  * energy conservation without gravity/contacts,
  * the standing humanoid stays standing under stable-PD + ground contact.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.physics import engine as E
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def tm():
    topo, model = load_mjcf_humanoid(XML)
    return topo, model_to_dtype(model, jnp.float32)


def rand_qpos(topo, z=2.0):
    q = np.zeros(topo.nq, np.float32)
    q[:3] = [0, 0, z]
    quat = RNG.normal(size=4)
    q[3:7] = quat / np.linalg.norm(quat)
    q[7:] = RNG.uniform(-0.5, 0.5, topo.nq - 7)
    return jnp.asarray(q)


def rand_qvel(topo, scale=1.0):
    return jnp.asarray(RNG.normal(size=topo.nv).astype(np.float32) * scale)


def test_mesh_mass_properties_box():
    from uhc_tpu.smpl.mesh import mesh_mass_properties

    # unit cube centered at (0.5, 0.5, 0.5), density 2
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    faces = [(0, 2, 1), (0, 3, 2), (4, 5, 6), (4, 6, 7), (0, 1, 5), (0, 5, 4),
             (1, 2, 6), (1, 6, 5), (2, 3, 7), (2, 7, 6), (3, 0, 4), (3, 4, 7)]
    tris = np.stack([v[list(f)] for f in faces])
    m, com, I = mesh_mass_properties(tris, density=2.0)
    assert np.isclose(m, 2.0)
    np.testing.assert_allclose(com, [0.5, 0.5, 0.5], atol=1e-9)
    np.testing.assert_allclose(np.diag(I), 2.0 / 6.0, atol=1e-9)  # m(a²+b²)/12
    np.testing.assert_allclose(I - np.diag(np.diag(I)), 0, atol=1e-9)


def test_model_build(tm):
    topo, model = tm
    assert topo.nbody == 24 and topo.nq == 76 and topo.nv == 75
    total = float(jnp.sum(model.body_mass))
    assert 50.0 < total < 120.0, total  # a plausible human
    assert model.contact_point.shape[0] == 24  # (nb, K, 3) dense layout
    assert float(model.contact_mask.sum()) >= 24 * 8


def test_mass_matrix_vs_kinetic_energy(tm):
    """½ qvelᵀ M qvel must equal the sum of body kinetic energies computed
    from propagated velocities — validates Jacobians + CRB independently."""
    topo, model = tm
    qpos, qvel = rand_qpos(topo), rand_qvel(topo)
    kin = E.fk(topo, model, qpos)
    vel = E.velocities(topo, kin, qvel)
    Jlin, Jang = E.jacobians(topo, kin)
    Rtot, sqI = E.world_inertia_factors(model, kin["xquat"])
    M = E.mass_matrix(model, Jlin, Jang, Rtot, sqI)
    # direct energy
    vcom = vel["vel"] + jnp.cross(vel["omega"], kin["xipos"] - kin["xpos"])
    Iw = jnp.einsum("nab,nb,ncb->nac", Rtot, model.body_inertia, Rtot)
    T_direct = 0.5 * jnp.sum(model.body_mass * jnp.sum(vcom**2, -1)) + \
        0.5 * jnp.sum(vel["omega"] * jnp.einsum("nab,nb->na", Iw, vel["omega"]))
    T_direct = T_direct + 0.5 * jnp.sum(model.armature * qvel**2)
    T_M = 0.5 * qvel @ M @ qvel
    # f32 accumulation noise only: in float64 the two paths agree to 1e-14
    np.testing.assert_allclose(float(T_M), float(T_direct), rtol=3e-3)
    # Jacobian-velocity consistency
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("naj,j->na", Jlin, qvel)), np.asarray(vcom),
        atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("naj,j->na", Jang, qvel)),
        np.asarray(vel["omega"]), atol=2e-3)
    # SPD
    w = np.linalg.eigvalsh(np.asarray(M, np.float64))
    assert w.min() > 0


def test_free_fall_com(tm):
    """With no contact (high above ground) and zero torque, the total-COM
    acceleration equals g for any configuration and velocity."""
    topo, model = tm
    qpos, qvel = rand_qpos(topo, z=50.0), rand_qvel(topo, 0.5)
    kin = E.fk(topo, model, qpos)
    vel = E.velocities(topo, kin, qvel)
    Jlin, Jang = E.jacobians(topo, kin)
    Rtot, sqI = E.world_inertia_factors(model, kin["xquat"])
    M = E.mass_matrix(model, Jlin, Jang, Rtot, sqI)
    C = E.bias_force(model, vel, Jlin, Jang, Rtot)
    qacc = jnp.linalg.solve(M, -C)
    # COM acceleration = (Σ mᵢ (Jlinᵢ q̈ + bias_accᵢ)) / Σ mᵢ
    acom = jnp.einsum("naj,j->na", Jlin, qacc) + vel["acom_bias"]
    total = jnp.sum(model.body_mass[:, None] * acom, 0) / jnp.sum(model.body_mass)
    # armature breaks exact momentum conservation; it is tiny (0.01 vs ~5 kgm²)
    np.testing.assert_allclose(np.asarray(total), [0, 0, -9.81], atol=2e-2)


def test_gravity_only_bias(tm):
    topo, model = tm
    qpos = rand_qpos(topo)
    qvel = jnp.zeros(topo.nv)
    kin = E.fk(topo, model, qpos)
    vel = E.velocities(topo, kin, qvel)
    Jlin, Jang = E.jacobians(topo, kin)
    Rtot, _ = E.world_inertia_factors(model, kin["xquat"])
    C = E.bias_force(model, vel, Jlin, Jang, Rtot)
    want = -jnp.einsum("naj,na->j", Jlin,
                       model.body_mass[:, None] * model.gravity)
    np.testing.assert_allclose(np.asarray(C), np.asarray(want), atol=1e-3)


def test_energy_conservation_no_gravity(tm):
    """Zero gravity, no contacts, zero torque: kinetic energy is conserved
    to O(dt) by semi-implicit Euler over a short horizon."""
    topo, model = tm
    import dataclasses
    model0 = dataclasses.replace(model, gravity=jnp.zeros(3))
    qpos, qvel = rand_qpos(topo, z=50.0), rand_qvel(topo, 0.3)
    kp = jnp.zeros(topo.ndof)
    kd = jnp.zeros(topo.ndof)
    target = jnp.zeros(topo.ndof)
    zero6 = jnp.zeros(topo.nv)

    def energy(qpos, qvel):
        kin = E.fk(topo, model0, qpos)
        vel = E.velocities(topo, kin, qvel)
        Jlin, Jang = E.jacobians(topo, kin)
        Rtot, sqI = E.world_inertia_factors(model0, kin["xquat"])
        M = E.mass_matrix(model0, Jlin, Jang, Rtot, sqI)
        return 0.5 * float(qvel @ M @ qvel)

    e0 = energy(qpos, qvel)

    @jax.jit
    def roll(qpos, qvel):
        def body(carry, _):
            qp, qv = carry
            qp, qv, _ = E.substep(topo, model0, qp, qv, target, kp, kd, zero6)
            return (qp, qv), None
        (qp, qv), _ = jax.lax.scan(body, (qpos, qvel), None, length=90)
        return qp, qv

    qp, qv = roll(qpos, qvel)
    e1 = energy(qp, qv)
    assert abs(e1 - e0) / max(e0, 1e-6) < 0.05, (e0, e1)


def test_standing_is_stable(tm):
    """Standing_neutral under stable-PD toward its own pose: short-horizon
    the contacts must support the body calmly (no launch, no sink); over a
    long horizon nothing may blow up. (Passive PD standing is an inverted
    pendulum — active balance is the policy's job, so 2 s uprightness is NOT
    asserted; the reference trains reactive recovery for exactly this,
    humanoid_im.py:1258.)"""
    import joblib

    topo, model = tm
    data = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
    qpos0 = jnp.asarray(data["qpos"], jnp.float32)
    qvel0 = jnp.zeros(topo.nv, jnp.float32)
    target = qpos0[7:]
    zero6 = jnp.zeros(topo.nv)

    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def roll(qpos, qvel, n):
        def body(carry, _):
            qp, qv = carry
            qp, qv, _ = E.substep(topo, model, qp, qv, target,
                                  model.jkp, model.jkd, zero6)
            return (qp, qv), None
        (qp, qv), _ = jax.lax.scan(body, (qpos, qvel), None, length=n)
        return qp, qv

    # 0.5 s: calm support — the initial interpenetration must resolve
    # without a launch and the body must not sink
    qp, qv = roll(qpos0, qvel0, 225)
    dz = float(qp[2] - qpos0[2])
    assert abs(dz) < 0.08, f"root height drifted {dz:.3f} m in 0.5 s"
    assert float(jnp.max(jnp.abs(qv))) < 3.0
    err = float(jnp.max(jnp.abs(E.wrap_to_pi(qp[7:] - target))))
    assert err < 0.2, err

    # 2 s: bounded, finite, on the ground (may tip — that is physical)
    qp, qv = roll(qpos0, qvel0, 900)
    assert bool(jnp.all(jnp.isfinite(qp))) and bool(jnp.all(jnp.isfinite(qv)))
    assert -0.2 < float(qp[2]) < 1.3
    assert float(jnp.max(jnp.abs(qv))) < 10.0
