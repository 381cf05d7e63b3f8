#!/usr/bin/env python3
"""Benchmark: batched humanoid physics steps/sec on the local accelerator.

The BASELINE metric (BASELINE.md): ≥1M batched humanoid physics (sub)steps
per second on TPU. One "physics step" = one 450 Hz stable-PD substep of the
full 24-body / 75-dof SMPL humanoid (FK + CRB mass matrix + bias + contacts
+ two 75×75 Cholesky solves + integration) — the unit the reference executes
as `sim.step()` + `cho_solve` (uhc/envs/humanoid_im.py:1145-1190).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is measured against 1,000,000 steps/sec (the BASELINE.json
north star; the reference itself publishes no numbers — a single-threaded
MuJoCo 2.1 humanoid runs O(1e4) steps/sec on CPU).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compilation cache: the fused Pallas control-step kernel takes
# ~80 s to compile once; repeat runs hit the cache
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from uhc_tpu.config.config import EnvConfig
    from uhc_tpu.data.dataset import (build_expert_library, load_motion_file,
                                      load_neutral)
    from uhc_tpu.envs import humanoid_im as H
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.constants import default_diff_weights
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

    XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
    NEUTRAL = "/root/reference/sample_data/standing_neutral.pkl"

    B = int(os.environ.get("BENCH_ENVS", 2048))
    CTRL_STEPS = int(os.environ.get("BENCH_STEPS", 20))

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs)
    nqp, nqv = load_neutral(NEUTRAL)
    jpw, bdw = default_diff_weights()
    jpw, bdw = jnp.asarray(jpw), jnp.asarray(bdw)
    cfg = EnvConfig()

    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, B)
    states = jax.vmap(
        lambda k: H.env_reset(topo, model, cfg, k, jnp.zeros((), jnp.int32),
                              lib, nqp, nqv, train=True))(keys)
    ndof, vf, meta = H.action_dims(topo, cfg)
    actions = jnp.zeros((B, ndof + vf + meta))

    # BENCH_FUSED=1 (default) measures the fused Pallas control-step kernel
    # — the pure physics chain, matching the reference's counted unit
    # (sim.step(), no obs/reward). BENCH_FUSED=0 measures the XLA env step
    # (physics + obs + reward; obs/reward are <1% of it).
    # Paths are tried best-first: lane (v3) -> v2 split -> XLA solver, so a
    # remote-compile flake on one kernel degrades the number instead of
    # erroring the benchmark.
    use_fused = os.environ.get("BENCH_FUSED", "1") == "1"

    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))

    def make_run(path):
        if path in ("lane", "split"):
            if path == "lane":
                # lane-major (v3) kernel with env-major VPU-PCG — the
                # production training path (envs.humanoid_im
                # make_env_step_batched) and measured-best config
                # (PERF.md round-3 table)
                from uhc_tpu.physics.pallas_lane import \
                    make_fused_do_simulation_lane

                pcg = int(os.environ.get("BENCH_PCG", 2))
                pcg_pd = int(os.environ.get("BENCH_PCGPD", 1))
                refresh = int(os.environ.get("BENCH_REFRESH", 0))
                fused = make_fused_do_simulation_lane(
                    topo, cfg, model,
                    env_tile=int(os.environ.get("BENCH_E", 128)),
                    sub_tile=int(os.environ.get("BENCH_SUB", 32)),
                    pcg_iters=(pcg_pd, pcg) if pcg_pd else pcg,
                    refresh_at=refresh or None,
                    pcg_vpu=os.environ.get("BENCH_PCGV", "1") == "1")
            else:
                from uhc_tpu.physics.pallas_substep import \
                    make_fused_do_simulation

                fused = make_fused_do_simulation(
                    topo, cfg, model,
                    pcg_iters=int(os.environ.get("BENCH_PCG", 2)),
                    split=os.environ.get("BENCH_SPLIT", "1") == "1",
                    tail_tile=int(os.environ.get("BENCH_TAIL", 16)))

            @jax.jit
            def run(states):
                def body(c, _):
                    qp, qv = c
                    qp2, qv2 = fused(qp, qv, actions, tb, 1.0)
                    return (qp2, qv2), qp2[:, 2]
                (qp, qv), z = jax.lax.scan(
                    body, (states.qpos, states.qvel), None,
                    length=CTRL_STEPS)
                import dataclasses
                return dataclasses.replace(states, qpos=qp, qvel=qv), z
        else:
            step = H.make_env_step_batched(
                topo, cfg,
                use_fast_solver=os.environ.get("BENCH_EXACT", "0") != "1",
                pcg_iters=int(os.environ.get("BENCH_PCG", 5)))

            @jax.jit
            def run(states):
                def body(s, _):
                    s2, _, r, _, d = step(model, s, actions, lib, jpw, bdw)
                    return s2, r
                s, rews = jax.lax.scan(body, states, None,
                                       length=CTRL_STEPS)
                return s, rews
        return run

    if not use_fused:
        paths = ["xla"]
    elif os.environ.get("BENCH_LANE", "1") == "1":
        paths = ["lane", "split", "xla"]
    else:
        paths = ["split", "xla"]

    dt = None
    for i, path in enumerate(paths):
        try:
            run = make_run(path)
            s, rews = run(states)           # compile
            jax.block_until_ready(rews)
            t0 = time.perf_counter()
            s, rews = run(s)                # measure
            jax.block_until_ready(rews)
            dt = time.perf_counter() - t0
            break
        except Exception as e:
            if i + 1 == len(paths):
                raise
            print(f"# bench path '{path}' failed "
                  f"({type(e).__name__}); falling back", file=sys.stderr)

    substeps = B * CTRL_STEPS * cfg.frame_skip
    sps = substeps / dt
    print(json.dumps({
        "metric": "humanoid_physics_steps_per_sec",
        "value": round(sps, 1),
        "unit": "450Hz_substeps/sec",
        "vs_baseline": round(sps / 1_000_000.0, 4),
    }))


if __name__ == "__main__":
    main()
