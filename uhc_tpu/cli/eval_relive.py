"""Kinematic-policy (UHM / relive) evaluation CLI — scripts/eval_relive.py
twin.

The reference script (eval_relive.py:37-80 data_generator) rolls the
kinematic policy deterministically through the hierarchical env per
sequence, collecting gt/pred qpos (+ the object track) and the reached
percent. Here every sequence evaluates simultaneously: vmap over the
context library, scan over the max clip length, mean actions.

Usage:
  python -m uhc_tpu.cli.eval_relive --cfg <kin cfg> --epoch N \
      [--cc-checkpoint results/uhc_implicit/models/iter_best.p] \
      [--data <motion pkl>] [--dump out.pkl]
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
    p.add_argument("--cc-checkpoint", default=None,
                   help="frozen low-level UHC policy checkpoint")
    p.add_argument("--data",
                   default="/root/reference/sample_data/standing_neutral.pkl")
    p.add_argument("--max-seq-len", type=int, default=None)
    p.add_argument("--dump", default=None)
    p.add_argument("--results-dir", default=None,
                   help="checkpoint directory (default results/uhm_<cfg>)")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from uhc_tpu.config.config import Config
    from uhc_tpu.envs import humanoid_kin as K
    from uhc_tpu.learn import kin_net as KN
    from uhc_tpu.learn.agent_uhm import UHMAgent
    from uhc_tpu.learn.metrics import compute_metrics

    try:
        cfg = Config.from_yaml(args.cfg)
    except FileNotFoundError:
        cfg = Config(cfg_id=args.cfg)

    agent = UHMAgent(cfg, args.data, cc_checkpoint_path=args.cc_checkpoint,
                     num_envs=1, horizon=1, max_seq_len=args.max_seq_len,
                     results_dir=args.results_dir)
    agent.load_checkpoint(args.epoch)

    lib = agent.context_lib
    S = int(lib["len"].shape[0])
    max_steps = int(jax.device_get(lib["len"]).max()) - 1
    topo = agent.topo

    @jax.jit
    def eval_all(params):
        seq_idx = jnp.arange(S)
        keys = jax.random.split(jax.random.PRNGKey(0), S)
        states = jax.vmap(
            lambda k, s: K.kin_env_reset(topo, agent.model,
                                         agent.kin_env_cfg, k, s, lib))(
            keys, seq_idx)
        obs0 = jax.vmap(lambda s: K.get_ar_obs_v1(
            topo, agent.model, agent.env_cfg, s, lib))(states)
        h0 = jnp.zeros((S, agent.specs.rnn_hdim))
        lengths = lib["len"][seq_idx]

        def body(carry, t):
            states, obs, h = carry
            active = t < (lengths - 1)
            mean, h_new = jax.vmap(
                lambda o, hh: KN.kin_net_action(params, agent.specs, o, hh))(
                obs, h)
            states2, obs2, _, _, _ = jax.vmap(
                lambda s, a: K.kin_env_step(
                    topo, agent.model, agent.kin_env_cfg, agent.env_cfg,
                    s, a, lib, agent.cc_policy_fn, agent.jpos_diffw))(
                states, mean)
            keep = lambda new, old: jnp.where(
                jnp.reshape(active, (S,) + (1,) * (old.ndim - 1)), new, old)
            states2 = jax.tree.map(keep, states2, states)
            obs2 = keep(obs2, obs)
            h2 = keep(h_new, h)
            out = {"pred_qpos": states2.qpos, "percent": states2.percent}
            obj = getattr(states2, "obj_qpos", None)
            if obj is not None:
                out["obj_pose"] = obj
            return (states2, obs2, h2), out

        (_, _, _), traj = jax.lax.scan(
            body, (states, obs0, h0), jnp.arange(max_steps))
        return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), traj)

    traj = jax.device_get(eval_all(agent.params))
    lens = np.asarray(jax.device_get(lib["len"]))
    gt_q = np.asarray(jax.device_get(lib["qpos"]))
    gt_j = np.asarray(jax.device_get(lib["wbpos"]))

    from uhc_tpu.envs.expert import qpos_fk
    results, dump = {}, {}
    for s, key in enumerate(agent.seq_keys):
        T = int(lens[s]) - 1
        pred_q = traj["pred_qpos"][s][:T]
        pred_feat = jax.device_get(qpos_fk(topo, agent.model,
                                           jnp.asarray(pred_q)))
        pred_j = np.asarray(pred_feat["wbpos"])
        percent = float(traj["percent"][s][T - 1]) if T > 0 else 0.0
        m = compute_metrics(pred_q, gt_q[s][1:T + 1], pred_j,
                            gt_j[s][1:T + 1], False, percent)
        results[key] = m
        print(key, json.dumps({k: round(v, 2) for k, v in m.items()}))
        if args.dump:
            dump[key] = {"pred": pred_q, "gt": gt_q[s][1:T + 1],
                         "percent": percent}
            if "obj_pose" in traj:
                dump[key]["obj_pose"] = traj["obj_pose"][s][:T]

    agg = {k: float(np.mean([m[k] for m in results.values()]))
           for k in next(iter(results.values()))}
    agg["coverage"] = int(sum(m["succ"] for m in results.values()))
    print("SUMMARY", json.dumps(agg, indent=2))
    # artifact-hygiene rule (VERDICT r4 #8): no number without a committed
    # file — persist the summary + per-seq metrics next to the checkpoints
    out_path = os.path.join(agent.results_dir,
                            f"eval_relive_{args.epoch:04d}.json")
    with open(out_path, "w") as f:
        json.dump({"summary": agg, "per_seq": results}, f, indent=1)
    print(f"wrote {out_path}")
    if args.dump:
        import joblib
        joblib.dump(dump, args.dump)
        print(f"dumped {len(dump)} sequences -> {args.dump}")


if __name__ == "__main__":
    main()
