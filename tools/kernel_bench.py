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
           "REFRESH": 0, "PCGVS": 0, "CONDINV": 0, "MERGEJ6": 0,
           "MODEL": "smpl"}
    for kv in s.split(","):
        k, v = kv.split("=")
        out[k.upper()] = v if k.upper() == "MODEL" else int(v)
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

    topo24, model24 = load_mjcf_humanoid(XML)
    model24 = model_to_dtype(model24, jnp.float32)
    env_cfg = EnvConfig(self_collision=False)   # SC=1 flips it per config

    def build_family(name):
        # masterfoot (48-body) / smplh (52-body) rows: the NP=160 trees
        # the VERDICT r3 item-4 acceptance compares lane-vs-v2 on
        if name == "masterfoot":
            from uhc_tpu.smpl.masterfoot import masterfoot_model
            topo, model, conv = masterfoot_model(topo24, model24, 30.0)
            return topo, model_to_dtype(model, jnp.float32), conv
        if name == "smplh":
            from uhc_tpu.smpl.smplh import smplh_model, smplh_topology
            model = smplh_model(topo24, model24)
            return smplh_topology(), model_to_dtype(model, jnp.float32), None
        return topo24, model24, None

    fam_cache = {}
    for c in cfgs:
        if c["MODEL"] not in fam_cache:
            topo, model, conv = build_family(c["MODEL"])
            seqs = load_motion_file(NEUTRAL)
            lib, _ = build_expert_library(topo24, model24, seqs,
                                          max_len=4)
            qp00 = lib["qpos"][0, 0]
            tb0 = lib["qpos"][0, 1, 7:]
            if conv is not None:
                qp00 = conv.qpos_smpl_2_new(qp00)
                tb0 = conv.qpos_smpl_2_new(lib["qpos"][0, 1])[7:]
            elif c["MODEL"] == "smplh":
                # 72-dof SMPL clip on the 52-body tree: flat-hand routing
                # (dataset._pose_to_qpose pads the finger chains)
                from uhc_tpu.data.dataset import _pose_to_qpose
                import numpy as np
                pose_aa = np.asarray(seqs[list(seqs)[0]]["pose_aa"])[:2]
                q2 = _pose_to_qpose(topo, model, pose_aa, None)
                qp00, tb0 = q2[0], q2[1, 7:]
            fam_cache[c["MODEL"]] = (topo, model, qp00, tb0)
        topo, model, qp00, tb0 = fam_cache[c["MODEL"]]
        ndof, vf, meta = H.action_dims(topo, env_cfg)
        rng = jax.random.PRNGKey(0)
        qp0 = jnp.tile(qp00[None], (B, 1))
        qv0 = jnp.zeros((B, topo.nv))
        actions = 0.01 * jax.random.normal(rng, (B, ndof + vf + meta))
        tb = jnp.tile(tb0[None], (B, 1))
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
                    refresh_at=c["REFRESH"] or None,
                    pcg_vpu_sub=bool(c["PCGVS"]),
                    cond_inv=bool(c["CONDINV"]),
                    merge_j6=bool(c["MERGEJ6"]))
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
