"""Self-collision calibration vs CPU MuJoCo (VERDICT r2 item 4).

The engine's body-body contact (engine.self_collision_terms: penalty
springs between curated SC sphere pairs) is compared against MuJoCo
simulating the SAME sphere pairs (export_mjcf(self_collision=True) emits
them as explicit <contact><pair> elements). MuJoCo's constraint solver and
a penalty model cannot agree exactly; calibration asserts:

  * the generalized self-contact force points the same way (high cosine
    similarity on the involved dofs), and
  * free dynamics from an interpenetrating pose separate the spheres on a
    comparable timescale, without blowup.

Reference behavior being reproduced: all humanoid geoms share one
contype/conaffinity group so MuJoCo collides them by default
(uhc/smpllib/smpl_parser.py:315-329).
"""
import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")

from uhc_tpu.physics import engine as E
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.constants import self_collision_pairs
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
from uhc_tpu.smpl.mjcf_export import export_mjcf

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


@pytest.fixture(scope="module")
def sc_oracle():
    topo, model = load_mjcf_humanoid(XML)
    modelj = model_to_dtype(model, jnp.float32)
    m = mujoco.MjModel.from_xml_string(
        export_mjcf(topo, model, self_collision=True, actuators=False))
    m.opt.gravity[:] = 0.0
    return topo, modelj, m


def _overlap_pose(topo, modelj):
    """A mid-air knees-together pose with 1-4 cm of SC-sphere overlap
    between the knees (the tightest curated pair), found by scanning hip
    adduction."""
    names = list(topo.body_names)
    js = {n: 7 + 3 * (names.index(n) - 1) for n in names[1:]}
    pairs = self_collision_pairs(topo)

    def overlap_depth(qpos):
        kin = E.fk(topo, modelj, jnp.asarray(qpos, jnp.float32))
        xpos, xquat = np.asarray(kin["xpos"]), np.asarray(kin["xquat"])
        scp = np.asarray(modelj.sc_point)
        scr = np.asarray(modelj.sc_radius)
        best = 0.0
        from uhc_tpu.maths import quat_rotate
        for a, b in pairs:
            wa = xpos[a] + np.asarray(
                quat_rotate(jnp.asarray(xquat[a])[None], scp[a]))
            wb = xpos[b] + np.asarray(
                quat_rotate(jnp.asarray(xquat[b])[None], scp[b]))
            d = np.linalg.norm(wa[:, None] - wb[None, :], axis=-1)
            pen = (scr[a] + scr[b]) - d
            best = max(best, float(pen.max()))
        return best

    base = np.zeros(topo.nq, np.float32)
    base[2] = 3.0
    base[3] = 1.0
    best_q, best_pen = None, 0.0
    for hz in np.linspace(0.0, -0.3, 31):
        q = base.copy()
        for s, sg in (("L", 1.0), ("R", -1.0)):
            q[js[f"{s}_Hip"] + 0] = sg * hz
        pen = overlap_depth(q)
        # want a modest 1-4 cm interpenetration
        if 0.01 < pen < 0.04 and pen > best_pen:
            best_q, best_pen = q, pen
    assert best_q is not None, "no overlapping knee pose found"
    return best_q, best_pen


def test_force_direction_matches_mujoco(sc_oracle):
    topo, modelj, m = sc_oracle
    qpos, pen0 = _overlap_pose(topo, modelj)

    # --- MuJoCo generalized contact force at the pose -------------------
    d = mujoco.MjData(m)
    d.qpos[:] = qpos
    d.qvel[:] = 0.0
    mujoco.mj_forward(m, d)
    f_mj = np.array(d.qfrc_constraint)
    assert np.linalg.norm(f_mj) > 0, "oracle scene has no active contact"

    # --- engine: project the SC wrench through the Jacobians -------------
    qj = jnp.asarray(qpos, jnp.float32)
    kin = E.fk(topo, modelj, qj)
    vel = E.velocities(topo, kin, jnp.zeros(topo.nv, jnp.float32))
    Jlin, Jang = E.jacobians(topo, kin)
    F, T = E.self_collision_terms(topo, modelj, kin, vel)
    f_ours = np.asarray(
        jnp.einsum("naj,na->j", Jlin, F, precision=E.HI)
        + jnp.einsum("naj,na->j", Jang, T, precision=E.HI))
    assert np.linalg.norm(f_ours) > 0

    # cosine similarity on the joint dofs that MuJoCo actually loads
    active = np.abs(f_mj) > 0.05 * np.abs(f_mj).max()
    cos = float(np.dot(f_ours[active], f_mj[active])
                / (np.linalg.norm(f_ours[active])
                   * np.linalg.norm(f_mj[active]) + 1e-9))
    assert cos > 0.7, f"generalized SC force disagrees: cos={cos:.2f}"


def test_penetration_resolves_like_mujoco(sc_oracle):
    topo, modelj, m = sc_oracle
    qpos, pen0 = _overlap_pose(topo, modelj)
    steps = 90          # 0.2 s at 450 Hz

    # --- MuJoCo rollout ---------------------------------------------------
    d = mujoco.MjData(m)
    d.qpos[:] = qpos
    d.qvel[:] = 0.0
    for _ in range(steps):
        mujoco.mj_step(m, d)
    q_mj = np.array(d.qpos)

    # --- engine rollout (gravity off, torque mode, zero torque) ----------
    # Runs in a FRESH python process: compiling (or reloading) this exact
    # scan-of-substep_torque program inside a long pytest session hits a
    # reproducible XLA:CPU segfault (observed three times at this line,
    # both on cache read and on fresh compile, across hosts/caches); the
    # identical program compiles and runs fine in a clean interpreter.
    import subprocess
    import sys
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        np.savez(os.path.join(td, "in.npz"), qpos=qpos)
        cache_dir = jax.config.jax_compilation_cache_dir
        script = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import os
if os.environ.get("UHC_TEST_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["UHC_TEST_CACHE"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
import dataclasses, sys
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))})
from uhc_tpu.physics import engine as E
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
topo, model = load_mjcf_humanoid({repr(XML)})
model0g = dataclasses.replace(model_to_dtype(model, jnp.float32),
                              gravity=jnp.zeros(3, jnp.float32))
qpos = np.load({repr(os.path.join(td, "in.npz"))})["qpos"]

@jax.jit
def roll(qp):
    qv = jnp.zeros(topo.nv, jnp.float32)
    def body(c, _):
        qp, qv = c
        qp, qv, _ = E.substep_torque(
            topo, model0g, qp, qv, jnp.zeros(topo.ndof, jnp.float32),
            jnp.zeros(topo.nv, jnp.float32), self_collision=True)
        return (qp, qv), None
    (qp, qv), _ = jax.lax.scan(body, (qp, qv), None, length={steps})
    return qp

np.savez({repr(os.path.join(td, "out.npz"))},
         q=np.asarray(roll(jnp.asarray(qpos, jnp.float32))))
"""
        env = dict(os.environ)
        env["UHC_TEST_CACHE"] = cache_dir or ""
        r = subprocess.run([sys.executable, "-c", script], env=env,
                           timeout=900)
        if r.returncode != 0:
            # cached-executable load can be fragile (see module docstring);
            # a fresh compile in a clean interpreter is the proven-safe
            # configuration
            env.pop("UHC_TEST_CACHE", None)
            subprocess.run([sys.executable, "-c", script], env=env,
                           check=True, timeout=900)
        q_us = np.load(os.path.join(td, "out.npz"))["q"]
    assert np.all(np.isfinite(q_us))

    def depth(q):
        kin = E.fk(topo, modelj, jnp.asarray(q, jnp.float32))
        xpos, xquat = np.asarray(kin["xpos"]), np.asarray(kin["xquat"])
        scp, scr = np.asarray(modelj.sc_point), np.asarray(modelj.sc_radius)
        from uhc_tpu.maths import quat_rotate
        best = 0.0
        for a, b in self_collision_pairs(topo):
            wa = xpos[a] + np.asarray(
                quat_rotate(jnp.asarray(xquat[a])[None], scp[a]))
            wb = xpos[b] + np.asarray(
                quat_rotate(jnp.asarray(xquat[b])[None], scp[b]))
            dd = np.linalg.norm(wa[:, None] - wb[None, :], axis=-1)
            best = max(best, float(((scr[a] + scr[b]) - dd).max()))
        return best

    pen_mj = depth(q_mj)
    pen_us = depth(q_us)
    # both solvers must have pushed the limbs out of penetration: at least
    # halved, and the engine within 2 cm of MuJoCo's residual depth
    assert pen_mj < 0.6 * pen0
    assert pen_us < 0.6 * pen0, (
        f"engine SC too soft: {pen0:.3f} -> {pen_us:.3f} (mj {pen_mj:.3f})")
    assert abs(pen_us - pen_mj) < 0.02
