"""MuJoCo oracle tests (SURVEY.md §7.3, VERDICT round-1 item 9).

The engine's model is exported to modern local-coordinate MJCF
(smpl/mjcf_export.py) and stepped in CPU MuJoCo from identical states; the
JAX engine must reproduce MuJoCo's forward quantities to numerical
precision and its free-space dynamics to integration tolerance. Contact
trajectories are compared quantitatively in PARITY.md (penalty contacts vs
MuJoCo's constraint solver differ by design).

Reference equivalents: mj_forward/mj_fullM/qfrc_bias are exactly what the
reference reads for stable PD (uhc/envs/humanoid_im.py:1019-1022).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")

from uhc_tpu.physics import engine as E
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
from uhc_tpu.smpl.mjcf_export import export_mjcf

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


@pytest.fixture(scope="module")
def oracle():
    jax.config.update("jax_enable_x64", True)
    topo, model = load_mjcf_humanoid(XML)
    modelj = model_to_dtype(model, jnp.float64)
    m = mujoco.MjModel.from_xml_string(export_mjcf(topo, model))
    yield topo, modelj, m
    jax.config.update("jax_enable_x64", False)


def _random_state(topo, seed, z=5.0, vscale=0.5):
    rng = np.random.RandomState(seed)
    qpos = np.zeros(topo.nq)
    qpos[:3] = rng.randn(3) * 0.1
    qpos[2] = z
    q = rng.randn(4); q /= np.linalg.norm(q)
    qpos[3:7] = q
    qpos[7:] = rng.uniform(-0.5, 0.5, topo.ndof)
    qvel = rng.randn(topo.nv) * vscale
    return qpos, qvel


def test_export_roundtrip_structure(oracle):
    topo, modelj, m = oracle
    assert (m.nq, m.nv, m.nbody) == (topo.nq, topo.nv, topo.nbody + 1)
    np.testing.assert_allclose(m.body_mass[1:],
                               np.asarray(modelj.body_mass), rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fk_parity(oracle, seed):
    topo, modelj, m = oracle
    qpos, qvel = _random_state(topo, seed)
    d = mujoco.MjData(m)
    d.qpos[:] = qpos; d.qvel[:] = qvel
    mujoco.mj_forward(m, d)
    kin = E.fk(topo, modelj, jnp.asarray(qpos))
    np.testing.assert_allclose(np.asarray(kin["xpos"]), d.xpos[1:],
                               atol=1e-7)
    q_ours = np.asarray(kin["xquat"]); q_mj = d.xquat[1:]
    sign = np.sign(np.sum(q_ours * q_mj, axis=1, keepdims=True))
    np.testing.assert_allclose(q_ours * sign, q_mj, atol=1e-7)
    np.testing.assert_allclose(np.asarray(kin["xipos"]), d.xipos[1:],
                               atol=1e-7)


@pytest.mark.parametrize("seed", [0, 3])
def test_mass_matrix_and_bias_parity(oracle, seed):
    topo, modelj, m = oracle
    qpos, qvel = _random_state(topo, seed)
    d = mujoco.MjData(m)
    d.qpos[:] = qpos; d.qvel[:] = qvel
    mujoco.mj_forward(m, d)

    kin = E.fk(topo, modelj, jnp.asarray(qpos))
    vel = E.velocities(topo, kin, jnp.asarray(qvel))
    Jlin, Jang = E.jacobians(topo, kin)
    Rtot, sqI = E.world_inertia_factors(modelj, kin["xquat"])
    M_ours = np.asarray(E.mass_matrix(modelj, Jlin, Jang, Rtot, sqI))
    M_mj = np.zeros((m.nv, m.nv)); mujoco.mj_fullM(m, d, M_mj)
    scale = np.abs(M_mj).max()
    assert np.abs(M_ours - M_mj).max() / scale < 1e-7

    C_ours = np.asarray(E.bias_force(modelj, vel, Jlin, Jang, Rtot))
    cscale = max(np.abs(d.qfrc_bias).max(), 1.0)
    assert np.abs(C_ours - d.qfrc_bias).max() / cscale < 1e-7


def test_free_space_trajectory_parity(oracle):
    """No contacts, no actuation: 90 substeps (0.2 s) of ballistic tumbling
    must track MuJoCo's semi-implicit Euler closely."""
    topo, modelj, m = oracle
    qpos, qvel = _random_state(topo, 7, z=50.0, vscale=1.0)
    d = mujoco.MjData(m)
    d.qpos[:] = qpos; d.qvel[:] = qvel

    # our engine: zero PD (kp=kd=0 target irrelevant), no RFC; joint-limit
    # penalties off by keeping the pose well inside the ranges is not
    # guaranteed for a random pose, so clamp into range first
    lo, hi = (np.asarray(modelj.jnt_range[:, 0]),
              np.asarray(modelj.jnt_range[:, 1]))
    qpos[7:] = np.clip(qpos[7:], lo + 0.05, np.maximum(hi - 0.05, lo + 0.05))
    d.qpos[:] = qpos

    qp = jnp.asarray(qpos); qv = jnp.asarray(qvel)
    zeros_t = jnp.zeros(topo.ndof)
    kp = jnp.zeros(topo.ndof); kd = jnp.zeros(topo.ndof)
    qfrc = jnp.zeros(topo.nv)

    sub = jax.jit(lambda qp, qv: E.substep(topo, modelj, qp, qv, zeros_t,
                                           kp, kd, qfrc)[:2])
    errs = []
    for t in range(90):
        mujoco.mj_step(m, d)
        qp, qv = sub(qp, qv)
        errs.append(np.abs(np.asarray(qp) - d.qpos).max())
    # f64 integrators, identical formulation: sub-mm/substep divergence
    assert errs[0] < 1e-6, errs[0]
    assert errs[-1] < 5e-3, f"free-space drift over 0.2s: {errs[-1]}"


def test_standing_contact_bounded_divergence(oracle):
    """Standing on the ground with stable PD toward the hold pose: penalty
    contacts vs MuJoCo's solver will diverge, but the body must stay
    upright and close (cm-level) for 30 control steps (1 s). Quantified
    numbers live in PARITY.md."""
    import joblib
    topo, modelj, m = oracle
    neutral = joblib.load("/root/reference/sample_data/standing_neutral.pkl")
    qpos0 = np.asarray(neutral["qpos"], np.float64)
    qvel0 = np.zeros(topo.nv)

    d = mujoco.MjData(m)
    d.qpos[:] = qpos0; d.qvel[:] = qvel0

    kp = jnp.asarray(np.asarray(modelj.jkp), jnp.float64)
    kd = jnp.asarray(np.asarray(modelj.jkd), jnp.float64)
    target = jnp.asarray(qpos0[7:])
    qfrc = jnp.zeros(topo.nv)
    sub = jax.jit(lambda qp, qv: E.substep(topo, modelj, qp, qv, target,
                                           kp, kd, qfrc)[:2])

    # MuJoCo side: apply the same stable-PD torque computed from ITS state
    M_buf = np.zeros((m.nv, m.nv))
    dtf = float(np.asarray(modelj.dt))

    def mj_spd_torque():
        mujoco.mj_forward(m, d)
        mujoco.mj_fullM(m, d, M_buf)
        kpf = np.concatenate([np.zeros(6), np.asarray(kp)])
        kdf = np.concatenate([np.zeros(6), np.asarray(kd)])
        e = np.concatenate([np.zeros(6),
                            d.qpos[7:] + d.qvel[6:] * dtf - np.asarray(target)])
        A = M_buf + np.diag(kdf) * dtf
        rhs = -d.qfrc_bias - kpf * e - kdf * d.qvel
        qacc = np.linalg.solve(A, rhs)
        tau = -kp * e[6:] - kd * (d.qvel[6:] + qacc[6:] * dtf)
        return np.clip(tau, -np.asarray(modelj.torque_lim),
                       np.asarray(modelj.torque_lim))

    qp = jnp.asarray(qpos0); qv = jnp.asarray(qvel0)
    for step in range(30):
        for _ in range(15):
            d.ctrl[:] = mj_spd_torque()
            mujoco.mj_step(m, d)
            qp, qv = sub(qp, qv)
    # both sims keep the humanoid standing at comparable height
    assert d.qpos[2] > 0.6, f"mujoco fell: z={d.qpos[2]}"
    assert float(qp[2]) > 0.6, f"engine fell: z={float(qp[2])}"
    assert abs(float(qp[2]) - d.qpos[2]) < 0.06, \
        f"root height divergence {abs(float(qp[2]) - d.qpos[2])}"
    joint_rms = float(np.sqrt(np.mean((np.asarray(qp)[7:] - d.qpos[7:])**2)))
    assert joint_rms < 0.25, f"joint rms divergence {joint_rms}"


@pytest.mark.slow
def test_walking_clip_bounded_divergence(oracle):
    """Dynamic contact-rich oracle (VERDICT r2 item 2): both simulators
    track the scripted walk with stable-PD targets; engine-vs-MuJoCo
    divergence must stay within centimeters through 2 s of foot strikes
    (full table in PARITY.md via tools/parity_report.py)."""
    import os

    import joblib

    gait = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "sample_data", "gait_clips.pkl")
    if not os.path.exists(gait):
        pytest.skip("no gait clips")
    from uhc_tpu.physics import engine as E
    from uhc_tpu.smpl.convert import smpl_to_qpose

    topo, modelj, m = oracle
    clip = joblib.load(gait)["0-SYN_walk_forward"]
    qpos_seq = np.asarray(jax.device_get(smpl_to_qpose(
        clip["pose_aa"], np.asarray(modelj.body_pos)[0],
        clip["trans"]))).astype(np.float64)

    d = mujoco.MjData(m)
    d.qpos[:] = qpos_seq[0]
    d.qvel[:] = 0.0
    kp = jnp.asarray(np.asarray(modelj.jkp))
    kd = jnp.asarray(np.asarray(modelj.jkd))
    z75 = jnp.zeros(topo.nv, jnp.float64)
    sub = jax.jit(lambda qp, qv, tgt: E.substep(
        topo, modelj, qp, qv, tgt, kp, kd, z75)[:2])
    M_buf = np.zeros((m.nv, m.nv))
    dtf = float(np.asarray(modelj.dt))
    kpf = np.concatenate([np.zeros(6), np.asarray(kp)])
    kdf = np.concatenate([np.zeros(6), np.asarray(kd)])
    tql = np.asarray(modelj.torque_lim)

    qp, qv = jnp.asarray(qpos_seq[0]), jnp.zeros(topo.nv, jnp.float64)
    for t in range(1, 61):                      # 2 s
        tgt = qpos_seq[t][7:]
        tgt_j = jnp.asarray(tgt)
        for _ in range(15):
            mujoco.mj_forward(m, d)
            mujoco.mj_fullM(m, d, M_buf)
            err = d.qpos[7:] + d.qvel[6:] * dtf - tgt
            err -= 2 * np.pi * np.round(err / (2 * np.pi))
            e = np.concatenate([np.zeros(6), err])
            qacc = np.linalg.solve(M_buf + np.diag(kdf) * dtf,
                                   -d.qfrc_bias - kpf * e - kdf * d.qvel)
            d.ctrl[:] = np.clip(
                -np.asarray(kp) * e[6:]
                - np.asarray(kd) * (d.qvel[6:] + qacc[6:] * dtf), -tql, tql)
            mujoco.mj_step(m, d)
            qp, qv = sub(qp, qv, tgt_j)
    dxy = float(np.linalg.norm(np.asarray(qp)[:2] - d.qpos[:2]))
    jrms = float(np.sqrt(np.mean((np.asarray(qp)[7:] - d.qpos[7:])**2)))
    assert dxy < 0.15, f"root-xy diverged {dxy:.3f} m over 2 s of walking"
    assert jrms < 0.08, f"joint RMS diverged {jrms:.3f} rad"
