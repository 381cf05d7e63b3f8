#!/usr/bin/env python3
"""Probe: can a compiled (Mosaic-containing) TPU executable be pickled and
reloaded in a FRESH process without re-paying the remote Mosaic compile?

The round-4 bench failure (BENCH_r04.json rc=124) happened because the JAX
persistent compilation cache does not cover the remote Mosaic compile on
this platform, so every fresh `python bench.py` pays 10-45 min of compile.
If `jax.experimental.serialize_executable` round-trips across processes,
bench.py can ship a pre-compiled lane-kernel executable instead.

Usage:
  python tools/aot_probe.py save /tmp/exec.pkl   # compile + serialize
  python tools/aot_probe.py load /tmp/exec.pkl   # fresh-process reload
Both modes time one measured run and print a JSON line.
"""
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import serialize_executable

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
NEUTRAL = "/root/reference/sample_data/standing_neutral.pkl"


def build(B=2048, STEPS=20):
    from uhc_tpu.config.config import EnvConfig
    from uhc_tpu.data.dataset import build_expert_library, load_motion_file
    from uhc_tpu.envs import humanoid_im as H
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.physics.pallas_substep import make_fused_do_simulation
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    cfg = EnvConfig(self_collision=True)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs, max_len=4)
    qp0 = jnp.tile(lib["qpos"][0, 0][None], (B, 1))
    qv0 = jnp.zeros((B, topo.nv))
    ndof, vf, meta = H.action_dims(topo, cfg)
    actions = jnp.zeros((B, ndof + vf + meta))
    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))
    fused = make_fused_do_simulation(topo, cfg, model, pcg_iters=2,
                                     split=True, tail_tile=16)

    def run(qp, qv):
        def body(c, _):
            qp, qv = c
            return fused(qp, qv, actions, tb, 1.0), qp[:, 2]
        (qp, qv), z = jax.lax.scan(body, (qp, qv), None, length=STEPS)
        return qp, qv, z

    return run, qp0, qv0, B, STEPS, cfg.frame_skip


def measure(callable_, qp0, qv0, B, STEPS, FS):
    qp, qv, z = callable_(qp0, qv0)
    float(jnp.sum(z))            # warm + force full sync via host fetch
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        qp, qv, z = callable_(qp, qv)
        float(jnp.sum(z))
        times.append(time.perf_counter() - t0)
    dt = min(times[-2:])
    return B * STEPS * FS / dt, times


def main():
    mode, path = sys.argv[1], sys.argv[2]
    t_build = 0.0
    if mode == "save":
        t0 = time.perf_counter()
        run, qp0, qv0, B, STEPS, FS = build()
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = jax.jit(run).lower(qp0, qv0).compile()
        t_compile = time.perf_counter() - t0
        ser, in_tree, out_tree = serialize_executable.serialize(compiled)
        import numpy as np
        with open(path, "wb") as f:
            pickle.dump({"exec": (ser, in_tree, out_tree),
                         "qp0": np.asarray(qp0), "qv0": np.asarray(qv0),
                         "B": B, "STEPS": STEPS, "FS": FS}, f)
        sps, times = measure(compiled, qp0, qv0, B, STEPS, FS)
        print(json.dumps({"mode": "save", "compile_s": round(t_compile, 1),
                          "bytes": os.path.getsize(path),
                          "sps": round(sps, 0), "times": times,
                          "build_s": round(t_build, 1)}), flush=True)
    else:
        t0 = time.perf_counter()
        with open(path, "rb") as f:
            d = pickle.load(f)
        compiled = serialize_executable.deserialize_and_load(*d["exec"])
        t_load = time.perf_counter() - t0
        sps, times = measure(compiled, jnp.asarray(d["qp0"]),
                             jnp.asarray(d["qv0"]), d["B"], d["STEPS"],
                             d["FS"])
        print(json.dumps({"mode": "load", "load_s": round(t_load, 1),
                          "sps": round(sps, 0), "times": times,
                          "build_s": round(t_build, 1)}), flush=True)


if __name__ == "__main__":
    main()
