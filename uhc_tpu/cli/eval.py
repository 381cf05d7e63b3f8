"""Evaluation CLI — scripts/eval_uhc.py twin (--mode stats).

Usage:
  python -m uhc_tpu.cli.eval --cfg uhc_implicit --epoch 1000 \
      --data <test pkl>
Prints per-sequence metrics and the coverage summary
(succ/mpjpe/pa_mpjpe/mpjpe_g/accel_dist/vel_dist/root_dist).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.getcwd())


def main():
    from uhc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--epoch", type=int, required=True)
    p.add_argument("--data",
                   default="/root/reference/sample_data/standing_neutral.pkl")
    p.add_argument("--max-seq-len", type=int, default=None)
    p.add_argument("--results-dir", default=None,
                   help="checkpoint directory (default results/<cfg_id>)")
    p.add_argument("--dump", default=None,
                   help="write per-seq gt/pred trajectories to this pkl "
                        "(consumed by uhc_tpu.cli.eval_imitation)")
    p.add_argument("--singles-dir", default=None,
                   help="directory of per-sequence fine-tuned policies "
                        "(<key>.p from uhc_tpu.cli.fit); sequences with a "
                        "fitted snapshot evaluate under it, the rest under "
                        "the base checkpoint (fit_uhc.py protocol)")
    args = p.parse_args()

    import jax.numpy as jnp
    from uhc_tpu.config.config import Config
    from uhc_tpu.learn.agent import CopycatAgent
    from uhc_tpu.learn.evaluate import make_eval_fn, summarize

    try:
        cfg = Config.from_yaml(args.cfg)
    except FileNotFoundError:
        cfg = Config(cfg_id=args.cfg)

    agent = CopycatAgent(cfg, args.data, num_envs=1, horizon=1,
                         max_seq_len=args.max_seq_len,
                         results_dir=args.results_dir)
    agent.load_checkpoint(args.epoch)

    max_steps = int(agent.expert_lib["len"].max()) - 1
    params, rs = agent.ppo_state.policy_params, agent.rs
    per_seq = False
    if args.singles_dir:
        import dataclasses
        import pickle

        import jax
        from uhc_tpu.learn import running_norm as RN
        base_p = jax.device_get(params)
        base_rs = jax.device_get(dataclasses.asdict(rs))
        per_p, per_rs, fitted = [], [], []
        for key in agent.seq_keys:
            f = os.path.join(args.singles_dir, f"{key}.p")
            if os.path.exists(f):
                with open(f, "rb") as fh:
                    d = pickle.load(fh)
                per_p.append(d["policy_params"])
                per_rs.append(d["running_stats"])
                fitted.append(key)
            else:
                per_p.append(base_p)
                per_rs.append(base_rs)
        print(f"singles: {len(fitted)}/{len(agent.seq_keys)} fitted "
              f"({', '.join(fitted)})")
        params = jax.tree.map(lambda *xs: jnp.stack(xs),
                              per_p[0], *per_p[1:])
        rs_d = jax.tree.map(lambda *xs: jnp.stack(xs),
                            per_rs[0], *per_rs[1:])
        rs = RN.RunningStats(rs_d["n"], rs_d["mean"], rs_d["m2"])
        per_seq = True
    eval_fn = make_eval_fn(agent.topo, agent.env_cfg, agent.policy_mean_fn,
                           max_steps, fused_model=agent._fused_model,
                           per_seq_params=per_seq)
    traj, fail_safe, percent = eval_fn(
        agent.sim_model, agent.expert_lib, agent.aux, params, rs)
    res = summarize(traj, fail_safe, percent, agent.expert_lib,
                    agent.seq_keys)
    for k, m in res["per_seq"].items():
        print(k, json.dumps({kk: round(vv, 2) for kk, vv in m.items()}))
    print("SUMMARY", json.dumps(res["summary"], indent=2))

    if args.dump:
        # per-sequence trajectory dump (eval_uhc.py --mode stats result pkl
        # layout; feeds scripts/eval_imitation.py's standalone re-eval)
        import joblib
        import numpy as np
        import jax
        traj_np = jax.device_get(traj)
        lens = np.asarray(jax.device_get(agent.expert_lib["len"]))
        gt_q = np.asarray(jax.device_get(agent.expert_lib["qpos"]))
        gt_j = np.asarray(jax.device_get(agent.expert_lib["wbpos"]))
        out = {}
        for s, key in enumerate(agent.seq_keys):
            T = int(lens[s]) - 1
            out[key] = {
                "pred_qpos": traj_np["pred_qpos"][s][:T],
                "pred_jpos": traj_np["pred_jpos"][s][:T],
                "gt_qpos": gt_q[s][1:T + 1],
                "gt_jpos": gt_j[s][1:T + 1],
                "fail_safe": bool(np.asarray(fail_safe)[s]),
                "percent": float(np.asarray(percent)[s]),
            }
        joblib.dump(out, args.dump)
        print(f"dumped {len(out)} sequences -> {args.dump}")


if __name__ == "__main__":
    main()
