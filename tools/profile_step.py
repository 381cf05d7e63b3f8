#!/usr/bin/env python3
"""Phase-level profile of the physics control step (reproducible harness).

Times each phase of the XLA substep chain separately — assemble (FK ->
Jacobians -> M/C -> contacts -> system matrices), the PCG solves, the
substep-0 exact inverses — plus the full control step on both the XLA path
and (on TPU) the fused Pallas kernel. This is the committed version of the
round-2 /tmp profile scripts PERF.md cites (VERDICT r2 weak #9).

Usage:  python tools/profile_step.py            # B=2048 on the default device
        B=512 python tools/profile_step.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
NEUTRAL = "/root/reference/sample_data/standing_neutral.pkl"


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from uhc_tpu.config.config import EnvConfig
    from uhc_tpu.data.dataset import build_expert_library, load_motion_file
    from uhc_tpu.envs import humanoid_im as H
    from uhc_tpu.physics import engine as E
    from uhc_tpu.physics import solver as S
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

    B = int(os.environ.get("B", 2048))
    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs)
    cfg = EnvConfig()
    ndof, vf, meta = H.action_dims(topo, cfg)

    qp = jnp.tile(lib["qpos"][0, 0][None], (B, 1))
    qv = jnp.zeros((B, topo.nv))
    actions = jnp.zeros((B, ndof + vf + meta))
    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))
    nv = topo.nv
    report = {"B": B, "backend": jax.default_backend()}

    # -- phase: assemble ---------------------------------------------------
    @jax.jit
    def run_assemble(qp, qv):
        def one(qp1, qv1):
            return E.assemble(topo, model, qp1, qv1,
                              qp1[7:], model.jkp, model.jkd,
                              jnp.zeros(nv, qp1.dtype))
        return jax.vmap(one)(qp, qv)

    out = run_assemble(qp, qv)
    report["assemble_ms"] = timed(run_assemble, qp, qv) * 1e3

    # -- phase: exact inverse pair (substep 0) -----------------------------
    @jax.jit
    def run_inv(A):
        return S.exact_inverse(A)

    Apd = out["A_pd"]
    report["exact_inverse_ms"] = timed(run_inv, Apd) * 1e3

    # -- phase: one PCG-5 solve -------------------------------------------
    X = run_inv(Apd)
    b = out["pd_rhs"]

    @jax.jit
    def run_pcg(A, b, X):
        return S.pcg_solve(A, b, X, 5)

    report["pcg5_ms"] = timed(run_pcg, Apd, b, X) * 1e3

    # -- full control step, XLA path --------------------------------------
    sim_xla = S.make_do_simulation(topo, cfg, 5)

    @jax.jit
    def run_xla(qp, qv):
        return sim_xla(model, qp, qv, actions, tb, 1.0)

    report["ctrl_step_xla_ms"] = timed(run_xla, qp, qv, reps=3) * 1e3

    # -- full control step, fused Pallas kernel (TPU only) -----------------
    if jax.default_backend() == "tpu":
        from uhc_tpu.physics.pallas_substep import make_fused_do_simulation
        fused = make_fused_do_simulation(topo, cfg, model)

        @jax.jit
        def run_fused(qp, qv):
            return fused(qp, qv, actions, tb, 1.0)

        report["ctrl_step_fused_ms"] = timed(run_fused, qp, qv, reps=3) * 1e3

    for k in ("ctrl_step_xla_ms", "ctrl_step_fused_ms"):
        if k in report:
            report[k.replace("ctrl_step", "substeps_per_sec").replace(
                "_ms", "")] = round(
                B * cfg.frame_skip / (report[k] / 1e3), 1)
    report = {k: (round(v, 3) if isinstance(v, float) else v)
              for k, v in report.items()}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
