#!/usr/bin/env python3
"""UHM tracking diagnosis (VERDICT r4 #5): isolate WHERE the 550 mm comes
from by evaluating the SAME kin-policy checkpoint at three closure levels:

  open_loop   — kin_net_rollout, scheduled sampling OFF: the policy
                integrates its own predictions from the GT start frame,
                conditioned on the GT next frame each step (env_obs mode =
                exactly what the hierarchical rollout feeds it). This is
                the kinematic stack under a PERFECT low-level controller.
  one_step    — single-step prediction error (integrator reset to GT every
                frame): the net's raw regression quality with zero
                compounding.
  closed_loop — cli/eval_relive: kin target + frozen copycat + physics
                (the official number).

If open_loop ≈ closed_loop, the kinematic policy itself drifts and the
physics/controller interface is NOT the problem (train the kin-net
better). If open_loop ≪ closed_loop, the frozen controller fails to track
the kin targets (retrain/replace the controller or close the feedback).

Usage:
  python tools/uhm_diagnose.py --checkpoint results/uhm_2/models/iter_0400.p \
      --data sample_data/gait_clips.pkl [--out results/uhm_2/diagnose.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="uhm_1")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data", default="sample_data/gait_clips.pkl")
    p.add_argument("--out", default=None)
    p.add_argument("--dump-openloop", default=None, metavar="PKL",
                   help="write the open-loop kin rollout as a reference-"
                        "format motion pkl (pose_aa/trans per key) so the "
                        "copycat stack can try to TRACK the kin policy's "
                        "own trajectory (the reference's ar_mode): "
                        "cli.eval --data <PKL> with a UHC checkpoint "
                        "isolates whether the kin targets are physically "
                        "trackable at all")
    args = p.parse_args()

    import pickle

    import numpy as np

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from uhc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from uhc_tpu.config.config import Config
    from uhc_tpu.data.dataset import build_expert_library, load_motion_file
    from uhc_tpu.learn import kin_net as KN
    from uhc_tpu.learn.metrics import compute_metrics
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

    XML = ("/root/reference/assets/mujoco_models/"
           "humanoid_smpl_neutral_mesh.xml")
    cfg = Config.from_yaml(args.cfg)
    d = cfg.cfg_dict
    ms = d.get("model_specs", {}) or {}
    specs = KN.KinNetSpecs(
        mlp_htype=ms.get("mlp_htype", "relu"),
        mlp_hsize=tuple(ms.get("mlp_hsize", (1024, 512))),
        rnn_hdim=ms.get("rnn_hdim", 512),
        model_v=ms.get("model_v", 1),
        pose_delta=ms.get("pose_delta", False),
        remove_base=d.get("remove_base", True),
        base_rot=cfg.env.base_rot,
        log_std=cfg.log_std,
        env_obs=ms.get("env_obs", False))

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(args.data)
    lib, keys = build_expert_library(topo, model, seqs)
    with open(args.checkpoint, "rb") as f:
        params = jax.tree.map(jnp.asarray, pickle.load(f)["params"])

    lens = np.asarray(jax.device_get(lib["len"]))
    gt_q = np.asarray(jax.device_get(lib["qpos"]))
    gt_v = np.asarray(jax.device_get(lib["qvel"]))
    gt_j = np.asarray(jax.device_get(lib["wbpos"]))

    rollout = jax.jit(lambda qp, qv, ss: KN.kin_net_rollout(
        params, topo, model, specs, qp, qv, ss))

    report = {}
    openloop_dump = {}
    for s, key in enumerate(keys):
        T = int(lens[s])
        qp, qv, wj = (jnp.asarray(gt_q[s][:T]), jnp.asarray(gt_v[s][:T]),
                      gt_j[s][:T])
        row = {}
        for mode, ss in (("open_loop", jnp.zeros((T,), bool)),
                         ("one_step", jnp.ones((T,), bool))):
            pred = jax.device_get(rollout(qp, qv, ss))
            m = compute_metrics(pred["qpos"][1:], gt_q[s][1:T],
                                np.asarray(pred["wbpos"][1:]).reshape(
                                    T - 1, -1),
                                wj[1:], False, 1.0)
            row[mode] = {k: round(float(v), 2) for k, v in m.items()}
            if mode == "open_loop" and args.dump_openloop:
                from uhc_tpu.smpl.convert import qpos_to_smpl

                aa, trans = qpos_to_smpl(jnp.asarray(pred["qpos"]),
                                         model.body_pos[0])
                openloop_dump[key] = {
                    "pose_aa": np.asarray(jax.device_get(aa)).reshape(
                        T, -1).astype(np.float32),
                    "trans": np.asarray(
                        jax.device_get(trans)).astype(np.float32)}
        report[key] = row
        print(key, json.dumps(row), flush=True)

    agg = {}
    for mode in ("open_loop", "one_step"):
        agg[mode] = {k: round(float(np.mean(
            [report[key][mode][k] for key in report])), 2)
            for k in next(iter(report.values()))[mode]}
    print("SUMMARY", json.dumps(agg, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": agg, "per_seq": report,
                       "checkpoint": args.checkpoint}, f, indent=1)
        print(f"wrote {args.out}")
    if args.dump_openloop:
        import joblib

        joblib.dump(openloop_dump, args.dump_openloop)
        print(f"dumped {len(openloop_dump)} open-loop kin trajectories "
              f"-> {args.dump_openloop}")


if __name__ == "__main__":
    main()
