# Solver-scheme study (CPU, engine-level): accuracy of cheaper per-substep
# solve schedules vs exact solves over one control step on adversarial
# dynamic states (mid-jog frames, fd velocities — max preconditioner
# staleness). Each variant is scored by max qpos/qvel deviation from the
# exact path; the acceptance bound is 2e-3 qpos (the bound PCG-2 shipped
# under, PERF.md). Matvec/GEMM counts let us trade accuracy vs the measured
# VPU-matvec wall (PERF.md "next ceiling").
#
# Variants:
#   pcgK       — prod-style: substep-0 exact inverses, PCG-K both systems
#   pd1fd2     — PCG-1 on the PD system (tau tolerates error: it is scaled
#                by kd*dt≈0.11 and clipped), PCG-2 on forward dynamics
#   refresh8   — PCG-1 both, fresh exact inverses at substep 8
#   newton1    — ONE Newton-Schulz step per substep tracks X (4 batched
#                MXU GEMMs), then PCG-1 both systems
#   newton_rr  — Newton-tracked X, solve by x = Xb + X(b-AXb) (3 matvecs,
#                no dot products)
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, joblib
import jax.numpy as jnp
from uhc_tpu.config.config import EnvConfig
from uhc_tpu.physics import engine as E
from uhc_tpu.physics import solver as S
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
from uhc_tpu.smpl.convert import smpl_to_qpose

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
topo, model = load_mjcf_humanoid(XML)
model = model_to_dtype(model, jnp.float32)
cfg = EnvConfig(self_collision=True, meta_pd=True, residual_force=True)

clips = joblib.load("/root/repo/sample_data/gait_clips_ext.pkl")
qs = np.asarray(jax.device_get(smpl_to_qpose(
    clips["0-SYN_jog"]["pose_aa"], np.asarray(model.body_pos)[0],
    clips["0-SYN_jog"]["trans"])))
idx = np.arange(40, 56)
qp0 = jnp.asarray(qs[idx], jnp.float32)
qv0 = jnp.concatenate([np.zeros((16, 6)),
                       (qs[idx + 1, 7:] - qs[idx, 7:]) * 30.0], axis=1
                      ).astype(jnp.float32)
B = qp0.shape[0]
import uhc_tpu.envs.humanoid_im as H
nd, vf, meta = H.action_dims(topo, cfg)
rng = np.random.RandomState(0)
act = jnp.asarray(rng.randn(B, nd + vf + meta) * 0.05, jnp.float32)
tb = jnp.asarray(qs[idx + 1, 7:], jnp.float32)


def run(schedule):
    """schedule(i, A_pd, A_fd, Xp, Xf) -> (solve_pd, solve_fd, Xp', Xf')
    where solve_* are callables b -> x."""
    kp_scale = jnp.clip(act[:, nd + vf:nd + vf + cfg.frame_skip] + 1.0,
                        0.0, 10.0)
    kd_scale = jnp.clip(act[:, nd + vf + cfg.frame_skip:] + 1.0, 0.0, 10.0)

    def assemble_env(qp, qv, action, tbv, kp, kd):
        from uhc_tpu.maths import (heading_quat, quat_inv, quat_mul,
                                   quat_rotate, wrap_to_pi)
        base = qp[7:] + wrap_to_pi(tbv - qp[7:])
        target_pos = base + action[:nd]
        qfrc = jnp.zeros(topo.nv, jnp.float32)
        vfa = action[nd:nd + vf] * cfg.residual_force_scale
        hq = heading_quat(quat_mul(qp[3:7], quat_inv(
            jnp.asarray(cfg.base_rot, jnp.float32))))
        vfa = jnp.concatenate([quat_rotate(hq, vfa[:3]), vfa[3:]])
        vfa = jnp.clip(vfa, -cfg.residual_force_lim, cfg.residual_force_lim)
        qfrc = qfrc.at[:6].set(vfa)
        out = E.assemble(topo, model, qp, qv, target_pos, kp, kd, qfrc,
                         None, None, True)
        out["kp"], out["kd"] = kp, kd
        return out

    qp, qv = qp0, qv0
    Xp = Xf = jnp.zeros((B, topo.nv, topo.nv), jnp.float32)
    for i in range(cfg.frame_skip):
        kp = model.jkp[None] * kp_scale[:, i][:, None]
        kd = model.jkd[None] * kd_scale[:, i][:, None]
        out = jax.vmap(assemble_env)(qp, qv, act, tb, kp, kd)
        A_pd, A_fd = out["A_pd"], out["A_fd"]
        solve_pd, solve_fd, Xp, Xf = schedule(i, A_pd, A_fd, Xp, Xf)
        qacc_des = solve_pd(out["pd_rhs"])
        tau = jax.vmap(lambda v, e, p, d, a: E.pd_torque_from_accel(
            model, v, e, p, d, a))(qv, out["qpos_err"], out["kp"],
                                   out["kd"], qacc_des)
        rhs = out["rhs_base"].at[:, 6:].add(tau)
        qacc = solve_fd(rhs)
        qp, qv = jax.vmap(lambda a, b, c: E.integrate(model, a, b, c))(
            qp, qv, qacc)
    return np.asarray(qp), np.asarray(qv)


def sched_pcg(k_pd, k_fd, refresh_at=()):
    def f(i, A_pd, A_fd, Xp, Xf):
        if i == 0 or i in refresh_at:
            Xp, Xf = S.exact_inverse(A_pd), S.exact_inverse(A_fd)
        return (lambda b: S.pcg_solve(A_pd, b, Xp, k_pd),
                lambda b: S.pcg_solve(A_fd, b, Xf, k_fd), Xp, Xf)
    return f


def sched_newton(k, direct=False):
    def f(i, A_pd, A_fd, Xp, Xf):
        if i == 0:
            Xp, Xf = S.exact_inverse(A_pd), S.exact_inverse(A_fd)
        else:
            Xp = S.newton_update(Xp, A_pd, iters=1)
            Xf = S.newton_update(Xf, A_fd, iters=1)
        if direct:
            return (lambda b: S.solve_refined(Xp, A_pd, b),
                    lambda b: S.solve_refined(Xf, A_fd, b), Xp, Xf)
        return (lambda b: S.pcg_solve(A_pd, b, Xp, k),
                lambda b: S.pcg_solve(A_fd, b, Xf, k), Xp, Xf)
    return f


variants = {
    "exact": sched_pcg(64, 64),
    "pcg2(prod)": sched_pcg(2, 2),
    "pcg1": sched_pcg(1, 1),
    "pd1fd2": sched_pcg(1, 2),
    "pd0fd2": sched_pcg(0, 2),
    "refresh8_pcg1": sched_pcg(1, 1, refresh_at=(8,)),
    "newton1_pcg1": sched_newton(1),
    "newton1_direct": sched_newton(0, direct=True),
}

ref = run(variants.pop("exact"))
# matvec counts per substep (both solves), GEMMs per substep
costs = {"pcg2(prod)": (12, 0), "pcg1": (8, 0), "pd1fd2": (10, 0),
         "pd0fd2": (7, 0), "refresh8_pcg1": (8, 0.13),
         "newton1_pcg1": (8, 4), "newton1_direct": (6, 4)}
print(f"{'variant':>16}  qpos_dev   qvel_dev   matvecs/sub  GEMMs/sub")
for name, sched in variants.items():
    r = run(sched)
    mv, gm = costs.get(name, ("?", "?"))
    print(f"{name:>16}  {np.abs(r[0] - ref[0]).max():.2e}   "
          f"{np.abs(r[1] - ref[1]).max():.2e}   {mv:>10}  {gm:>8}")
