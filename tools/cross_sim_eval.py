"""Cross-simulator policy evaluation: run a policy TRAINED in the JAX/Pallas
engine closed-loop inside CPU MuJoCo (constraint-solver contacts, the
reference's exact physics), and score it with the standard imitation
metrics.

This is the strongest oracle evidence the engines agree where it matters:
open-loop PD playback diverges chaotically on low-momentum gaits (PARITY.md),
but a policy that tracks a clip in BOTH simulators demonstrates the
training-relevant dynamics match within the policy's own robustness margin.

The MuJoCo side reproduces the reference control stack verbatim:
  * stable PD torque (uhc/envs/humanoid_im.py:1014 compute_desired_accel /
    :1033 compute_torque): (M + Kd·dt) q̈ = -C - Kp·err_p - Kd·qvel, then
    τ = -Kp·err_p - Kd·(qvel + q̈·dt), clipped to torque_lim
  * meta-PD per-substep gain scaling (:1052-1058)
  * implicit RFC root wrench, heading-rotated and clipped (:1136 rfc_implicit)
applied through data.qfrc_applied (gear-independent; the reference's motors
are gear=1 so ctrl == generalized torque).

Usage:
  python tools/cross_sim_eval.py --cfg uhc_implicit \
      --checkpoint results/uhc_implicit/models/iter_best.p \
      --data /root/reference/sample_data/standing_neutral.pkl
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import numpy as np
from scipy.linalg import cho_factor, cho_solve


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="uhc_implicit")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data",
                   default="/root/reference/sample_data/standing_neutral.pkl")
    p.add_argument("--max-seq-len", type=int, default=None)
    p.add_argument("--out", default=None, help="write summary json here")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import mujoco

    from uhc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from uhc_tpu.config.config import Config
    from uhc_tpu.data.dataset import (build_expert_library, load_motion_file,
                                      load_neutral)
    from uhc_tpu.envs import humanoid_im as H
    from uhc_tpu.learn import nets
    from uhc_tpu.learn import running_norm as RN
    from uhc_tpu.learn.metrics import compute_metrics
    from uhc_tpu.maths import (heading_quat, quat_inv, quat_mul, quat_rotate,
                               wrap_to_pi)
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.constants import default_diff_weights
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
    from uhc_tpu.smpl.mjcf_export import export_mjcf

    XML = ("/root/reference/assets/mujoco_models/"
           "humanoid_smpl_neutral_mesh.xml")
    cfg = Config.from_yaml(args.cfg)
    env_cfg = cfg.env
    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)

    seqs = load_motion_file(args.data)
    lib, keys = build_expert_library(topo, model, seqs,
                                     max_len=args.max_seq_len)
    jpw, _ = default_diff_weights()
    jpos_diffw = jnp.asarray(jpw)

    with open(args.checkpoint, "rb") as f:
        ck = pickle.load(f)
    ndof, vf_dim, meta_dim = H.action_dims(topo, env_cfg)
    action_dim = ndof + vf_dim + meta_dim
    obs_dim = H.obs_dim(topo, env_cfg)
    _, mean_fn = nets.make_policy(cfg, obs_dim, action_dim,
                                  jax.random.PRNGKey(0))
    params = jax.tree.map(jnp.asarray, ck["policy_params"])
    rs = RN.RunningStats(**{k: jnp.asarray(v)
                            for k, v in ck["running_stats"].items()})

    @jax.jit
    def policy_step(state):
        obs = H.get_obs(topo, model, env_cfg, state, lib)
        nobs = RN.normalize(rs, obs)
        return mean_fn(params, nobs[None])[0]

    # MuJoCo twin of the engine's model (timestep 1/450, penalty-free
    # constraint contacts — the reference's sim)
    m = mujoco.MjModel.from_xml_string(export_mjcf(topo, model,
                                                   actuators=False))
    d = mujoco.MjData(m)
    dt = m.opt.timestep
    FS = env_cfg.frame_skip
    jkp = np.asarray(model.jkp, np.float64)
    jkd = np.asarray(model.jkd, np.float64)
    torque_lim = np.asarray(model.torque_lim, np.float64)
    base_rot = jnp.asarray(env_cfg.base_rot, jnp.float32)
    nv = topo.nv

    def mujoco_do_simulation(action, target_base):
        """Reference do_simulation (humanoid_im.py:1145) on MuJoCo state."""
        ctrl_joint = action[:ndof]
        if env_cfg.meta_pd:
            meta = action[ndof + vf_dim:]
            kp_s = np.clip(meta[:FS] + 1.0, 0, 10)
            kd_s = np.clip(meta[FS:] + 1.0, 0, 10)
        else:
            kp_s = kd_s = np.ones(FS)
        for i in range(FS):
            qpos = d.qpos.copy()
            qvel = d.qvel.copy()
            kp = jkp * kp_s[i]
            kd = kd_s[i] * jkd
            base = qpos[7:] + np.asarray(
                wrap_to_pi(jnp.asarray(target_base - qpos[7:])))
            target_pos = base + ctrl_joint
            k_p = np.concatenate([np.zeros(6), kp])
            k_d = np.concatenate([np.zeros(6), kd])
            qpos_err = np.concatenate(
                [np.zeros(6), qpos[7:] + qvel[6:] * dt - target_pos])
            qvel_err = qvel.copy()
            M = np.zeros((nv, nv))
            mujoco.mj_fullM(m, d, M)
            C = d.qfrc_bias.copy()
            q_accel = cho_solve(
                cho_factor(M + np.diag(k_d) * dt, check_finite=False),
                -C - k_p * qpos_err - k_d * qvel_err, check_finite=False)
            qvel_err = qvel_err + q_accel * dt
            torque = -kp * qpos_err[6:] - kd * qvel_err[6:]
            torque = np.clip(torque, -torque_lim, torque_lim)
            d.qfrc_applied[6:] = torque
            if env_cfg.residual_force and \
                    env_cfg.residual_force_mode == "implicit":
                vf = action[ndof:ndof + vf_dim] * env_cfg.residual_force_scale
                curr_root = quat_mul(jnp.asarray(qpos[3:7], jnp.float32),
                                     quat_inv(base_rot))
                hq = heading_quat(curr_root)
                vf = np.concatenate(
                    [np.asarray(quat_rotate(hq, jnp.asarray(vf[:3],
                                                            jnp.float32))),
                     vf[3:]])
                vf = np.clip(vf, -env_cfg.residual_force_lim,
                             env_cfg.residual_force_lim)
                d.qfrc_applied[:6] = vf
            mujoco.mj_step(m, d)

    results = {}
    lengths = np.asarray(lib["len"])
    for s, key in enumerate(keys):
        T = int(lengths[s])
        state = H.env_reset(topo, model, env_cfg, jax.random.PRNGKey(0),
                            jnp.asarray(s), lib, jnp.zeros(topo.nq),
                            jnp.zeros(topo.nv), start_ind=0, train=False)
        mujoco.mj_resetData(m, d)
        d.qpos[:] = np.asarray(state.qpos, np.float64)
        d.qvel[:] = np.asarray(state.qvel, np.float64)
        mujoco.mj_forward(m, d)

        pred_qpos, pred_jpos = [np.asarray(state.qpos)], None
        fail = False
        gt_q = np.asarray(lib["qpos"][s][:T])
        gt_j = np.asarray(lib["wbpos"][s][:T])
        from uhc_tpu.physics import engine as E
        jp = [np.asarray(E.fk(topo, model, state.qpos)["xpos"]).ravel()]
        for t in range(T - 1):
            action = np.asarray(policy_step(state), np.float64)
            tgt = H.expert_at(lib, jnp.asarray(s), jnp.asarray(t + 1))
            mujoco_do_simulation(action, np.asarray(tgt["qpos"])[7:])
            state = dataclasses.replace(
                state,
                qpos=jnp.asarray(d.qpos, jnp.float32),
                qvel=jnp.asarray(d.qvel, jnp.float32),
                prev_qpos=state.qpos, cur_t=state.cur_t + 1,
                prev_bquat=H.get_body_quat(state.qpos))
            pred_qpos.append(d.qpos.copy())
            jp.append(np.asarray(E.fk(topo, model,
                                      state.qpos)["xpos"]).ravel())
            body_diff = float(H.calc_body_diff(topo, model, state, lib,
                                               jpos_diffw))
            if body_diff > env_cfg.body_diff_thresh_test or \
                    not np.all(np.isfinite(d.qpos)):
                fail = True
                break
        Tp = len(pred_qpos)
        percent = (Tp) / (T - 1)
        met = compute_metrics(np.asarray(pred_qpos), gt_q[:Tp],
                              np.asarray(jp), gt_j[:Tp].reshape(Tp, -1),
                              fail_safe=fail, percent=min(percent, 1.0))
        met["percent"] = round(min(percent, 1.0), 4)
        results[key] = {k: round(float(v), 2) for k, v in met.items()}
        print(f"{key}: succ={results[key].get('succ')} "
              f"percent={results[key]['percent']} "
              f"mpjpe={results[key].get('mpjpe')}mm "
              f"mpjpe_g={results[key].get('mpjpe_g')}mm", flush=True)

    n = len(results)
    summary = {
        "succ": sum(r.get("succ", 0) for r in results.values()) / n,
        "mpjpe": sum(r.get("mpjpe", 0) for r in results.values()) / n,
        "mpjpe_g": sum(r.get("mpjpe_g", 0) for r in results.values()) / n,
        "num_seqs": n,
        "per_seq": results,
    }
    print("CROSS-SIM SUMMARY " + json.dumps(
        {k: (round(v, 3) if isinstance(v, float) else v)
         for k, v in summary.items() if k != "per_seq"}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
