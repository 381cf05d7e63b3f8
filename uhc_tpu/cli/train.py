"""Training CLI — scripts/train_uhc.py twin.

Usage:
  python -m uhc_tpu.cli.train --cfg uhc_implicit --motion-file <pkl> \
      [--num-envs 1024] [--horizon 48] [--epochs 100] [--epoch N to resume]

Reference flags (train_uhc.py:34-99) map 1:1; `--num-envs × --horizon`
replaces `min_batch_size` (50000 steps/epoch ≈ 1024×48).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.getcwd())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--motion-file",
                   default="/root/reference/sample_data/standing_neutral.pkl")
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--horizon", type=int, default=48)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--epoch", type=int, default=0, help="resume epoch")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max-seq-len", type=int, default=None)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard envs over all local devices")
    p.add_argument("--agent", choices=("copycat", "uhm"), default="copycat",
                   help="agent registry (uhc/agents/__init__.py agent_dict)")
    p.add_argument("--cc-checkpoint", default=None,
                   help="frozen copycat checkpoint for --agent uhm")
    p.add_argument("--results-dir", default=None,
                   help="override results/<cfg_id> output directory")
    p.add_argument("--robot-model", default=None, choices=("smpl", "smplh"),
                   help="override cfg robot.model (e.g. force the SMPL-H "
                        "52-body family on configs that lack the key)")
    p.add_argument("--smpl-data", default=None,
                   help="SMPL model pkl/npz for shape-conditioned training")
    def positive_int(v):
        iv = int(v)
        if iv < 1:
            raise argparse.ArgumentTypeError(f"must be >= 1, got {iv}")
        return iv

    p.add_argument("--save-n-epochs", type=positive_int, default=None,
                   help="override cfg.save_n_epochs (checkpoint/eval cadence)")
    p.add_argument("--no-train-eval", action="store_true",
                   help="skip the eval-during-training at checkpoints "
                        "(the eval program is a separate ~20-40 min Mosaic "
                        "compile on a fresh config; deadline-bounded queue "
                        "legs checkpoint here and eval separately)")
    p.add_argument("--warm-start-from", default=None, metavar="CKPT",
                   help="initialize policy/value/obs-stats from another "
                        "run's checkpoint file (cross-run warm start; "
                        "epoch counter and sampler state start fresh)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace (XProf/TensorBoard "
                        "format) of epochs 2-4 into DIR")
    p.add_argument("--dr-variants", type=int, default=0,
                   help="contact-domain-randomization: replicate every clip "
                        "across N perturbed-contact models (friction / "
                        "penalty stiffness / damping / mass; variant 0 "
                        "nominal) for cross-simulator robustness fine-tuning")
    p.add_argument("--dr-friction-scale", type=float, default=1.5)
    p.add_argument("--dr-contact-scale", type=float, default=2.0)
    p.add_argument("--dr-mass-scale", type=float, default=1.15)
    args = p.parse_args()

    import jax
    from uhc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from uhc_tpu.config.config import Config
    from uhc_tpu.learn.agent import CopycatAgent
    from uhc_tpu.utils.logger import create_logger

    try:
        cfg = Config.from_yaml(args.cfg)
    except FileNotFoundError:
        cfg = Config(cfg_id=args.cfg)
    if args.robot_model is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, env=dataclasses.replace(cfg.env,
                                         robot_model=args.robot_model))

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from jax.sharding import Mesh
        mesh = Mesh(jax.devices(), ("data",))

    if args.agent == "uhm":
        from uhc_tpu.learn.agent_uhm import UHMAgent

        agent = UHMAgent(cfg, args.motion_file,
                         cc_checkpoint_path=args.cc_checkpoint,
                         num_envs=args.num_envs, horizon=args.horizon,
                         max_seq_len=args.max_seq_len,
                         results_dir=args.results_dir)
        logger = create_logger(os.path.join(agent.results_dir, "log"))
    else:
        agent = CopycatAgent(cfg, args.motion_file, num_envs=args.num_envs,
                             horizon=args.horizon, mesh=mesh, seed=args.seed,
                             max_seq_len=args.max_seq_len,
                             results_dir=args.results_dir,
                             smpl_data=args.smpl_data,
                             dr_variants=args.dr_variants,
                             dr_friction_scale=args.dr_friction_scale,
                             dr_contact_scale=args.dr_contact_scale,
                             dr_mass_scale=args.dr_mass_scale)
        logger = create_logger(os.path.join(agent.results_dir, "log"))
        logger.info(f"cfg {cfg.cfg_id}: obs_dim={agent.obs_dim} "
                    f"action_dim={agent.action_dim} seqs={len(agent.seq_keys)}")

    if args.warm_start_from:
        if not os.path.isfile(args.warm_start_from):
            p.error(f"--warm-start-from: no such checkpoint: "
                    f"{args.warm_start_from}")
        if args.epoch > 0:
            p.error("--warm-start-from and --epoch (resume) are exclusive")
        agent.load_checkpoint_file(args.warm_start_from, warm_start=True)
        logger.info(f"warm-started from {args.warm_start_from}")
    if args.epoch > 0:
        agent.load_checkpoint(args.epoch)

    # wandb-twin scalar sink: per-epoch scalars as ndjson under results/
    # (reference train_uhc.py:58-68 wandb.log)
    from uhc_tpu.utils.metrics_sink import MetricsSink
    sink = MetricsSink(agent.results_dir, resume=args.epoch > 0)

    epochs = args.epochs if args.epochs is not None else cfg.num_epoch
    if args.agent == "uhm":
        # the gt_rate anneal runs over the ACTUAL planned horizon, not the
        # yml's 30k default (reference passes cfg.num_epoch to lambda_rule)
        agent.total_epochs = epochs
    save_n = (args.save_n_epochs if args.save_n_epochs is not None
              else cfg.save_n_epochs)
    for i in range(args.epoch, epochs):
        # profile a steady-state window (epoch 0/1 are compile-dominated)
        if args.profile and i == args.epoch + 2:
            jax.profiler.start_trace(args.profile)
        stats = agent.optimize_policy(i)
        if args.profile and i == args.epoch + 4:
            jax.profiler.stop_trace()
            logger.info(f"profiler trace (epochs {args.epoch + 2}-"
                        f"{args.epoch + 4}) -> {args.profile}")
        sink.log(i, {k: v for k, v in stats.items()
                     if isinstance(v, (int, float))
                     or getattr(v, "ndim", 1) == 0})
        if args.agent == "uhm":
            parts = [f"epoch {i}:"]
            if "reward_mean" in stats:
                parts.append(f"R={float(stats['reward_mean']):.4f}")
            if "supervised_loss" in stats:
                parts.append(f"sup={float(stats['supervised_loss']):.4f}")
            parts.append(f"T={float(stats['T_total']):.2f}s")
            logger.info(" ".join(parts))
        else:
            logger.info(
                f"epoch {i}: R={float(stats['reward_mean']):.4f} "
                f"succ={float(stats['success_rate']):.3f} "
                f"eps={int(stats['episodes'])} "
                f"len={float(stats['avg_eps_len']):.1f} "
                f"sps={float(stats['steps_per_sec']):.0f} "
                f"T={float(stats['T_total']):.2f}s")
        if (i + 1) % save_n == 0 or i + 1 == epochs:
            agent.save_checkpoint(i + 1)
            logger.info(f"saved checkpoint @ {i + 1}")
            if args.agent == "copycat" and not args.no_train_eval:
                # eval during training (agent_copycat.py:346-349) +
                # iter_best.p tracking
                res = agent.eval_policy()
                s = res["summary"]
                logger.info(
                    f"eval @ {i + 1}: coverage={s['coverage']}/"
                    f"{s['num_seqs']} succ={s['succ']:.3f} "
                    f"mpjpe={s['mpjpe']:.1f} mpjpe_g={s['mpjpe_g']:.1f}")
                with open(os.path.join(agent.results_dir,
                                       f"eval_{i + 1:04d}.json"), "w") as f:
                    json.dump(s, f, indent=1)


if __name__ == "__main__":
    main()
