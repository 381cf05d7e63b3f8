#!/usr/bin/env python3
"""Fused-kernel variant timing harness (real TPU).

Sweeps (env_tile, pcg_iters, vmem_limit_mb) configurations of
uhc_tpu.physics.pallas_substep.make_fused_do_simulation and reports
substeps/sec for each, so VMEM-ceiling experiments (VERDICT r2 next-step
1) are reproducible instead of living in /tmp.

Usage:
  python tools/kernel_bench.py                 # default sweep
  python tools/kernel_bench.py E=16,PCG=3,V=100 E=8,PCG=2,V=64
Each positional arg is one config; B/STEPS env vars control batch size.
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


def parse_cfg(s):
    out = {"E": 8, "PCG": 3, "V": 100, "SPLIT": 0, "TAIL": 16, "SC": 0,
           "BF16": 0, "LANE": 0, "SUB": 16, "PCGV": 0, "PCGPD": 0,
           "REFRESH": 0}
    for kv in s.split(","):
        k, v = kv.split("=")
        out[k.upper()] = int(v)
    return out


def main():
    from uhc_tpu.config.config import EnvConfig
    from uhc_tpu.data.dataset import build_expert_library, load_motion_file
    from uhc_tpu.envs import humanoid_im as H
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.physics.pallas_substep import make_fused_do_simulation
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

    B = int(os.environ.get("B", 2048))
    STEPS = int(os.environ.get("STEPS", 20))
    cfgs = [parse_cfg(a) for a in sys.argv[1:]] or [
        {"E": 8, "PCG": 3, "V": 100}]

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs)
    env_cfg = EnvConfig(self_collision=False)   # SC=1 flips it per config
    ndof, vf, meta = H.action_dims(topo, env_cfg)

    rng = jax.random.PRNGKey(0)
    qp0 = jnp.tile(lib["qpos"][0, 0][None], (B, 1))
    qv0 = jnp.zeros((B, topo.nv))
    actions = 0.01 * jax.random.normal(rng, (B, ndof + vf + meta))
    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))

    for c in cfgs:
        label = ",".join(f"{k}={v}" for k, v in c.items())
        try:
            cfg_i = (env_cfg if not c["SC"]
                     else __import__("dataclasses").replace(
                         env_cfg, self_collision=True))
            t0 = time.perf_counter()
            if c["LANE"]:
                from uhc_tpu.physics.pallas_lane import \
                    make_fused_do_simulation_lane
                iters = ((c["PCGPD"], c["PCG"]) if c["PCGPD"]
                         else c["PCG"])
                fused = make_fused_do_simulation_lane(
                    topo, cfg_i, model, env_tile=c["E"], sub_tile=c["SUB"],
                    pcg_iters=iters, vmem_limit_mb=c["V"],
                    pcg_vpu=bool(c["PCGV"]),
                    refresh_at=c["REFRESH"] or None)
            else:
                fused = make_fused_do_simulation(
                    topo, cfg_i, model, env_tile=c["E"], pcg_iters=c["PCG"],
                    vmem_limit_mb=c["V"], split=bool(c["SPLIT"]),
                    tail_tile=c["TAIL"], precond_bf16=bool(c["BF16"]))

            @jax.jit
            def run(qp, qv):
                def body(carry, _):
                    qp, qv = carry
                    return fused(qp, qv, actions, tb, 1.0), qp[:, 2]
                (qp, qv), z = jax.lax.scan(body, (qp, qv), None, length=STEPS)
                return qp, qv, z

            qp, qv, z = run(qp0, qv0)
            jax.block_until_ready(z)
            t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            qp, qv, z = run(qp, qv)
            jax.block_until_ready(z)
            dt = time.perf_counter() - t0
            sps = B * STEPS * env_cfg.frame_skip / dt
            # sanity: root height should stay finite/reasonable
            zlast = float(jnp.mean(z[-1]))
            print(json.dumps({
                "cfg": label, "substeps_per_sec": round(sps, 0),
                "ms_per_ctrl_step": round(dt / STEPS * 1000, 1),
                "compile_s": round(t_compile, 1),
                "mean_root_z": round(zlast, 4)}), flush=True)
        except Exception as e:
            print(json.dumps({"cfg": label,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
