"""Per-sequence fine-tuning CLI — scripts/fit_uhc.py twin.

Fine-tunes a (possibly pretrained) policy on a single motion sequence until
it imitates it successfully, then saves a per-sequence snapshot
(reference: fit_uhc.py:98-134 loop + AgentCopycat.fit_single_key, saving
results/.../_singles/{key}.p).

Usage:
  python -m uhc_tpu.cli.fit --cfg uhc_implicit --key standing_neutral \
      [--epoch N to warm-start] [--max-epochs 500] [--succ-threshold 0.95]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.getcwd())


def main():
    from uhc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--motion-file",
                   default="/root/reference/sample_data/standing_neutral.pkl")
    p.add_argument("--key", required=True)
    p.add_argument("--epoch", type=int, default=0, help="warm-start epoch")
    p.add_argument("--max-epochs", type=int, default=500)
    p.add_argument("--succ-threshold", type=float, default=0.95)
    p.add_argument("--window-criterion", action="store_true",
                   help="stop on windowed training succ alone (the pre-r4g "
                        "behavior). Default is the reference's criterion: "
                        "once windowed succ passes the threshold, run the "
                        "deterministic FULL-sequence eval and stop only "
                        "when the key's seq-level succ is 1.0 — r4g showed "
                        "horizon-48 window succ 0.94+ coexisting with "
                        "full-240-frame eval succ 0 on all three refit "
                        "clips (fit_uhc.py:98-134 evals the whole seq)")
    p.add_argument("--eval-every", type=int, default=20,
                   help="full-sequence eval cadence once the windowed "
                        "threshold is reached")
    p.add_argument("--num-envs", type=int, default=512)
    p.add_argument("--horizon", type=int, default=48)
    p.add_argument("--results-dir", default=None,
                   help="checkpoint directory (default results/<cfg_id>)")
    args = p.parse_args()

    import numpy as np
    from uhc_tpu.config.config import Config
    from uhc_tpu.learn.agent import CopycatAgent
    from uhc_tpu.utils.logger import create_logger

    try:
        cfg = Config.from_yaml(args.cfg)
    except FileNotFoundError:
        cfg = Config(cfg_id=args.cfg)

    agent = CopycatAgent(cfg, args.motion_file, num_envs=args.num_envs,
                         horizon=args.horizon, results_dir=args.results_dir)
    logger = create_logger(os.path.join(agent.results_dir, "log"))
    if args.epoch > 0:
        agent.load_checkpoint(args.epoch)

    if args.key not in agent.seq_keys:
        raise SystemExit(f"key {args.key!r} not in {agent.seq_keys}")
    key_idx = agent.seq_keys.index(args.key)
    # pin the on-device sampler to this sequence (fit_single_key semantics)
    one_hot = np.full(len(agent.seq_keys), -1e9, np.float32)
    one_hot[key_idx] = 0.0
    agent.sampler.logits = lambda: one_hot  # type: ignore[method-assign]
    # failure-frame-targeted restarts — the fit protocol always runs in
    # precision mode (fit_uhc.py:111 agent.precision_mode = True): windows
    # restart near recorded failure starts, so a localized transient (e.g.
    # a hard clip opening) gets dense training exposure instead of the
    # ~1/len(clip) share uniform window sampling gives it
    agent.precision_mode = True

    singles = os.path.join(agent.results_dir, "_singles")
    os.makedirs(singles, exist_ok=True)
    last_eval = None
    for i in range(args.epoch, args.epoch + args.max_epochs):
        stats = agent.optimize_policy(i)
        succ = float(stats["success_rate"])
        logger.info(f"fit {args.key} epoch {i}: "
                    f"R={float(stats['reward_mean']):.4f} succ={succ:.3f}")
        if succ < args.succ_threshold:
            continue
        if args.window_criterion:
            logger.info(f"window success threshold reached at epoch {i}")
            break
        # reference criterion: the whole sequence must track
        # deterministically (fit_uhc.py:98-134) — windowed training succ
        # measures horizon-length rollouts from random starts, which r4g
        # measured as a non-predictor of seq-level succ
        if last_eval is not None and i - last_eval < args.eval_every:
            continue
        last_eval = i
        # track_best=False: the key-specialized policy must not clobber
        # the shared results-dir iter_best.p (ADVICE r4)
        m = agent.eval_policy(track_best=False)["per_seq"][args.key]
        logger.info(f"full-seq eval at epoch {i}: succ={m['succ']:.0f} "
                    f"mpjpe={m['mpjpe']:.1f} root_dist={m['root_dist']:.1f}")
        if m["succ"] >= 1.0:
            logger.info(f"full-sequence success at epoch {i}")
            break
    import pickle

    import jax

    with open(os.path.join(singles, f"{args.key}.p"), "wb") as f:
        pickle.dump({
            "policy_params": jax.device_get(agent.ppo_state.policy_params),
            "value_params": jax.device_get(agent.ppo_state.value_params),
            "log_std": jax.device_get(agent.log_std),
            "running_stats": jax.device_get(
                __import__("dataclasses").asdict(agent.rs)),
        }, f)
    logger.info(f"saved {singles}/{args.key}.p")


if __name__ == "__main__":
    main()
