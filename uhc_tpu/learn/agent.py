"""Copycat training agent — the AgentCopycat twin, one SPMD program.

Reference training epoch (uhc/agents/agent_copycat.py:326 optimize_policy):
fork 30-40 CPU samplers -> 50k steps -> CPU->GPU transfer -> GAE -> PPO.
Here an epoch is a single jitted function: `lax.scan` rollout over B
humanoids × T control steps (physics, obs, reward, auto-reset all fused),
GAE, and the full PPO optimization — no process pools, no host transfers
except logging scalars and the hard-mining telemetry.

Multi-chip: pass a `jax.sharding.Mesh`; env state/rollout tensors are
sharded along the batch ("data") axis, parameters are replicated, and XLA
inserts the gradient all-reduces (the reference's multiprocessing.Queue has
no equivalent here — SURVEY.md §2.9).
"""
from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uhc_tpu.config.config import Config
from uhc_tpu.data.dataset import (build_expert_library, load_motion_file,
                                  load_neutral)
from uhc_tpu.data.sampling import FailureFrequencySampler
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.learn import nets, running_norm as RN
from uhc_tpu.learn.gae import estimate_advantages
from uhc_tpu.learn.ppo import PPOState, make_ppo_update
from uhc_tpu.learn.rollout import init_env_states, make_rollout_fn
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.constants import default_diff_weights
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

NEUTRAL_XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


class CopycatAgent:
    def __init__(self, cfg: Config, motion_file: str,
                 num_envs: int = 1024, horizon: int = 48,
                 mesh: Optional[Mesh] = None, seed: Optional[int] = None,
                 model_xml: str = NEUTRAL_XML, max_seq_len: Optional[int] = None,
                 results_dir: Optional[str] = None, smpl_data=None,
                 dr_variants: int = 0, dr_friction_scale: float = 1.5,
                 dr_contact_scale: float = 2.0, dr_mass_scale: float = 1.15,
                 dr_seed: int = 0):
        self.cfg = cfg
        self.env_cfg = cfg.env
        self.num_envs = num_envs
        self.horizon = horizon
        self.mesh = mesh
        self.results_dir = results_dir or os.path.join("results", cfg.cfg_id)
        os.makedirs(os.path.join(self.results_dir, "models"), exist_ok=True)

        self.topo, model = load_mjcf_humanoid(model_xml)
        self.model = model_to_dtype(model, jnp.float32)
        if self.env_cfg.robot_ball:
            # ball-joint (quaternion) family: same tree, qpos carries one
            # quat per joint, control is direct torque
            # (config/copycat_ball/*.yml; humanoid_im.py:52 use_quat)
            self.topo = dataclasses.replace(self.topo, joint_kind="ball")
        self._smplh = self.env_cfg.robot_model == "smplh"
        if self._smplh:
            # SMPL-H 52-body family (config robot.model == "smplh"); with
            # real 52-joint SMPL-H model data the joint offsets are exact
            # (smplh_model_from_data), otherwise anthropometric defaults
            from uhc_tpu.smpl.smplh import (smplh_model,
                                            smplh_model_from_data,
                                            smplh_topology)
            smplh_data = None
            if isinstance(smpl_data, str):
                from uhc_tpu.smpl.lbs import load_smplh_data
                try:
                    smplh_data = load_smplh_data(smpl_data)
                except (ValueError, KeyError):
                    smplh_data = None
            elif smpl_data is not None and not isinstance(smpl_data, dict) \
                    and int(np.asarray(smpl_data.j_regressor).shape[0]) == 52:
                smplh_data = smpl_data
            model52 = (smplh_model_from_data(self.topo, self.model,
                                             smplh_data)
                       if smplh_data is not None
                       else smplh_model(self.topo, self.model))
            self.topo = smplh_topology()
            self.model = model_to_dtype(model52, jnp.float32)

        # foot-model variants (config/bigfoot, config/masterfoot)
        self.converter = None
        base_root_offset = self.model.body_pos[0]
        if self.env_cfg.bigfoot:
            from uhc_tpu.smpl.masterfoot import bigfoot_model
            self.model = model_to_dtype(
                bigfoot_model(self.topo, self.model), jnp.float32)
        if self.env_cfg.masterfoot:
            from uhc_tpu.smpl.masterfoot import masterfoot_model
            self.topo, model_mf, self.converter = masterfoot_model(
                self.topo, self.model, self.env_cfg.master_range)
            self.model = model_to_dtype(model_mf, jnp.float32)

        seqs = load_motion_file(motion_file)
        if self.env_cfg.has_shape:
            # shape-conditioned training: per-sequence robots + shape obs
            # (reference reset_robot humanoid_im.py:154-180; shape obs :1390)
            from uhc_tpu.data.dataset import build_shaped_library
            if smpl_data is None:
                from uhc_tpu.smpl.lbs import synthetic_smpl_data_like
                import warnings
                warnings.warn(
                    "shape training without SMPL model data: falling back to "
                    "synthetic_smpl_data_like() (anatomically-consistent "
                    "synthetic blendshapes around the neutral skeleton, NOT "
                    "real SMPL bodies). Pass smpl_data=<path to SMPL "
                    "pkl/npz> for real shapes.", stacklevel=2)
                print("[uhc_tpu] WARNING: shape training is using SYNTHETIC "
                      "SMPL blendshapes (no smpl_data provided).", flush=True)
                smpl_data = synthetic_smpl_data_like(self.topo, self.model)
            elif isinstance(smpl_data, str):
                from uhc_tpu.smpl.lbs import load_smpl_data
                smpl_data = load_smpl_data(smpl_data)
            self.expert_lib, self.seq_keys, model_lib = build_shaped_library(
                self.topo, self.model, seqs, smpl_data, self.env_cfg,
                max_len=max_seq_len)
            self.sim_model = model_to_dtype(model_lib, jnp.float32)
            # kept for eval-time vertex penetration/skate metrics
            # (smpl_eval.py:125,138 vertex pipeline)
            self.smpl_data = (smpl_data if not isinstance(smpl_data, dict)
                              else smpl_data.get(
                                  "neutral", next(iter(smpl_data.values()))))
        elif dr_variants >= 2:
            # contact-domain-randomized fine-tuning (cross-simulator
            # robustness; tools/cross_sim_eval.py is the acceptance test):
            # every clip replicated across n_variants perturbed-contact
            # models, gathered per env like the shape library
            from uhc_tpu.data.dataset import build_dr_library
            if self.converter is not None or self._smplh:
                raise NotImplementedError(
                    "dr_variants is supported on the 24-body SMPL family")
            self.expert_lib, self.seq_keys, model_lib = build_dr_library(
                self.topo, self.model, seqs, n_variants=dr_variants,
                friction_scale=dr_friction_scale,
                contact_scale=dr_contact_scale, mass_scale=dr_mass_scale,
                seed=dr_seed, max_len=max_seq_len)
            self.sim_model = model_to_dtype(model_lib, jnp.float32)
            self.smpl_data = None
        else:
            self.expert_lib, self.seq_keys = build_expert_library(
                self.topo, self.model, seqs, max_len=max_seq_len,
                converter=self.converter, base_root_offset=base_root_offset)
            self.sim_model = self.model
            if isinstance(smpl_data, str):
                from uhc_tpu.smpl.lbs import load_smpl_data
                smpl_data = load_smpl_data(smpl_data)
            self.smpl_data = (smpl_data if not isinstance(smpl_data, dict)
                              else smpl_data.get(
                                  "neutral", next(iter(smpl_data.values()))))
        nq, nv = self.topo.nq, self.topo.nv
        neutral_qpos, neutral_qvel = load_neutral()
        if self.env_cfg.robot_ball:
            # the standing-neutral pose ships in euler layout; re-express the
            # joints as quaternions for the ball family's reactive resets
            from uhc_tpu.maths import quat_from_euler_zyx as _qfe
            jq = _qfe(jnp.asarray(neutral_qpos)[7:].reshape(-1, 3))
            neutral_qpos = jnp.concatenate(
                [jnp.asarray(neutral_qpos)[:7], jq.reshape(-1)])
        if self.converter is not None:
            # remap the 24-body neutral reset pose onto the mutated tree
            neutral_qpos = self.converter.qpos_smpl_2_new(neutral_qpos)
            neutral_qvel = self.converter.qvel_smpl_2_new(neutral_qvel)
            jpw = self.converter.get_new_diff_weight().astype(np.float32)
            bdw = jpw[1:]
        elif self._smplh:
            from uhc_tpu.smpl.constants import (MUJOCO_BODY_ORDER,
                                                MUJOCO_PARENTS)
            from uhc_tpu.smpl.converter import SMPLConverter
            from uhc_tpu.smpl.smplh import smplh_diff_weights
            from uhc_tpu.physics.model import Topology as _T
            topo24 = _T(24, tuple(int(p) for p in MUJOCO_PARENTS),
                        tuple(MUJOCO_BODY_ORDER))
            nconv = SMPLConverter(topo24, self.topo, smpl_model="smplh")
            neutral_qpos = nconv.qpos_smpl_2_new(neutral_qpos)
            neutral_qvel = nconv.qvel_smpl_2_new(neutral_qvel)
            jpw, bdw = smplh_diff_weights()
        else:
            jpw, bdw = default_diff_weights()
        self.aux = {
            "neutral_qpos": neutral_qpos, "neutral_qvel": neutral_qvel,
            "jpos_diffw": jnp.asarray(jpw), "body_diffw": jnp.asarray(bdw),
        }

        ndof, vf_dim, meta_dim = H.action_dims(self.topo, self.env_cfg)
        self.action_dim = ndof + vf_dim + meta_dim
        self.obs_dim = H.obs_dim(self.topo, self.env_cfg)

        key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        key, kp, kv, ke = jax.random.split(key, 4)
        policy_params, self.policy_mean_fn = nets.make_policy(
            cfg, self.obs_dim, self.action_dim, kp)
        self.log_std = policy_params.pop("log_std")
        value_params = nets.value_init(kv, self.obs_dim, cfg.value_hsize)
        self.value_fn = lambda p, x: nets.value_apply(p, x, cfg.value_htype)

        self.policy_opt = optax.adam(cfg.policy_lr)
        self.value_opt = optax.adam(cfg.value_lr)
        # trainable exploration std (policy_gaussian.py:8 action_log_std is a
        # policy parameter; same Adam lr as the rest of the policy)
        self.log_std_opt = None if cfg.fix_std else optax.adam(cfg.policy_lr)
        self.ppo_state = PPOState(
            policy_params, value_params,
            self.policy_opt.init(policy_params),
            self.value_opt.init(value_params),
            None if cfg.fix_std else self.log_std_opt.init(self.log_std))

        self.rs = RN.init(self.obs_dim)
        self.rng = key
        self.env_states = init_env_states(
            self.topo, self.env_cfg, self.sim_model, self.expert_lib, self.aux,
            ke, num_envs)

        self.sampler = FailureFrequencySampler(
            len(self.seq_keys), cfg.sampling_temp, cfg.sampling_freq)
        # precision_mode: restart near recorded failure starts
        # (agent_copycat.py:103; cli/fit.py forces it on like fit_uhc.py:111)
        self.precision_mode = cfg.precision_mode

        # Route physics through the fused Pallas control-step kernel when
        # the config allows it (fused_compatible); make_env_step_batched
        # falls back to the XLA solver otherwise.
        # UHC_TPU_FUSED=0 forces the XLA path (e.g. CPU test runs).
        # Covers every tree the kernel traces for (24-body SMPL, 48-body
        # masterfoot, 52-body SMPL-H) AND shape-library (batched) models —
        # the lane kernel gathers per-env shape tables by seq_idx
        # (pallas_lane per_env path); first Mosaic compile of a new tree
        # is expensive (~35 min for masterfoot) but lands in the
        # persistent cache.
        self._fused_model = (
            self.sim_model
            if os.environ.get("UHC_TPU_FUSED", "1") == "1"
            and jax.default_backend() == "tpu" else None)
        self._rollout = make_rollout_fn(self.topo, self.env_cfg,
                                        self.policy_mean_fn, horizon,
                                        fused_model=self._fused_model)
        self._ppo_update = make_ppo_update(
            self.policy_mean_fn, self.value_fn, self.policy_opt,
            self.value_opt, cfg.clip_epsilon, cfg.num_optim_epoch,
            min(cfg.mini_batch_size, num_envs * horizon),
            fix_std=cfg.fix_std, log_std_optimizer=self.log_std_opt)
        # env_states is NOT donated: env_reset aliases prev_qpos to qpos in
        # fresh states (same buffer), and donating an aliased pytree raises
        # "Attempt to donate the same buffer twice". The state arrays are
        # tiny (B×nq floats) — donation buys nothing there anyway.
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0, 1, 2))
        self.epoch = 0
        # episode-end reward bonus, updated per epoch from the previous
        # epoch's average custom reward (agent_copycat.py:333-334)
        self.end_reward = 0.0

        if mesh is not None:
            self._shard_env_state()

    # -- sharding ----------------------------------------------------------
    def _shard_env_state(self):
        sh = NamedSharding(self.mesh, P("data"))
        self.env_states = jax.tree.map(
            lambda x: jax.device_put(x, sh), self.env_states)

    # -- one full PPO epoch on device ---------------------------------------
    def _train_step_impl(self, ppo_state, log_std, rs, env_states, rng,
                         noise_rate, rfc_rate, seq_logits, end_reward,
                         fail_pool, precision_freq):
        rng, k_roll, k_ppo = jax.random.split(rng, 3)
        env_states, rs, traj, last_obs = self._rollout(
            self.sim_model, self.expert_lib, self.aux, ppo_state.policy_params,
            log_std, rs, env_states, k_roll, noise_rate, rfc_rate, seq_logits,
            end_reward, fail_pool, precision_freq)

        values = self.value_fn(ppo_state.value_params,
                               traj.states.reshape(-1, self.obs_dim))
        values = values.reshape(self.horizon, -1)
        bootstrap = self.value_fn(ppo_state.value_params, last_obs)
        adv, ret = estimate_advantages(traj.rewards, traj.masks, values,
                                       bootstrap, self.cfg.gamma, self.cfg.tau)
        batch = {
            "states": traj.states.reshape(-1, self.obs_dim),
            "actions": traj.actions.reshape(-1, self.action_dim),
            "advantages": adv.reshape(-1),
            "returns": ret.reshape(-1),
            "exps": traj.exps.reshape(-1),
        }
        ppo_state, log_std, ppo_stats = self._ppo_update(
            ppo_state, log_std, batch, k_ppo)

        done_f = traj.dones.astype(jnp.float32)
        n_done = jnp.maximum(jnp.sum(done_f), 1.0)
        stats = {
            "reward_mean": jnp.mean(traj.rewards),
            "c_reward_mean": jnp.mean(traj.c_rewards),
            "reward_terms": jnp.mean(traj.reward_terms, axis=(0, 1)),
            "episodes": jnp.sum(done_f),
            "avg_percent": jnp.sum(traj.percents * done_f) / n_done,
            # 1-ulp tolerance: TPU reciprocal-multiply division can leave
            # percent one ulp under 1.0 (see learn/metrics.py succ)
            "success_rate": jnp.sum(
                (traj.percents >= 1.0 - 1e-5) * done_f) / n_done,
            "avg_eps_len": self.horizon * self.num_envs / n_done,
            **ppo_stats,
        }
        telemetry = (traj.seq_idx, traj.dones, traj.percents,
                     traj.start_inds)
        return ppo_state, log_std, rs, env_states, rng, stats, telemetry

    def optimize_policy(self, epoch: int):
        """One epoch: adaptive schedules + rollout + PPO + mining telemetry
        (agent_copycat.py:326 optimize_policy / :279 per_epoch_update)."""
        t0 = time.time()
        noise_rate, log_std_sched, _lr = self.cfg.adaptive_params(epoch)
        if self.cfg.fix_std:
            self.log_std = jnp.full_like(self.log_std, log_std_sched)
        rfc_rate = 1.0
        if self.env_cfg.rfc_decay:
            rfc_rate = max(0.0, 1.0 - epoch / 10000.0)
        seq_logits = jnp.asarray(self.sampler.logits())
        # precision_mode (agent_copycat.py:103, switched on by
        # fit_uhc.py:111): restart near recorded failure starts with the
        # same mixing rate as the sequence-level hard mining
        fail_pool = jnp.asarray(self.sampler.fail_start_pool())
        precision_freq = (self.cfg.sampling_freq
                          if self.precision_mode else 0.0)

        (self.ppo_state, self.log_std, self.rs, self.env_states, self.rng,
         stats, telemetry) = self._train_step(
            self.ppo_state, self.log_std, self.rs, self.env_states, self.rng,
            jnp.asarray(noise_rate, jnp.float32),
            jnp.asarray(rfc_rate, jnp.float32), seq_logits,
            jnp.asarray(self.end_reward, jnp.float32),
            fail_pool, jnp.asarray(precision_freq, jnp.float32))

        stats = jax.device_get(stats)
        if self.cfg.end_reward:
            self.end_reward = float(stats["c_reward_mean"]) * \
                self.cfg.gamma / (1.0 - self.cfg.gamma)
        self.sampler.update_from_rollout(*jax.device_get(telemetry))
        stats["T_total"] = time.time() - t0
        stats["steps"] = self.num_envs * self.horizon
        stats["steps_per_sec"] = stats["steps"] / stats["T_total"]
        self.epoch = epoch
        return stats

    # -- evaluation during training (agent_copycat.py:346-349) --------------
    def eval_policy(self, track_best: bool = True):
        """Deterministic eval over the full library; returns the
        summarize() dict (coverage, mpjpe, ...). Tracks the best coverage
        and keeps iter_best.p (agent_copycat.py:216-236).

        `track_best=False` skips the iter_best.p bookkeeping — the
        single-key fit loop (cli/fit.py) evaluates a key-specialized
        policy whose full-library coverage must never clobber the shared
        best checkpoint."""
        from uhc_tpu.learn.evaluate import make_eval_fn, summarize

        if not hasattr(self, "_eval_fn") or self._eval_fn is None:
            max_steps = int(jax.device_get(self.expert_lib["len"]).max())
            self._eval_fn = make_eval_fn(self.topo, self.env_cfg,
                                         self.policy_mean_fn, max_steps,
                                         fused_model=self._fused_model)
        traj, fail_safe, percent = self._eval_fn(
            self.sim_model, self.expert_lib, self.aux,
            self.ppo_state.policy_params, self.rs)
        root_offset = None
        if self.smpl_data is not None:
            import numpy as _np
            bp = _np.asarray(jax.device_get(self.sim_model.body_pos))
            root_offset = bp[:, 0, :] if bp.ndim == 3 else bp[0]
        res = summarize(traj, fail_safe, percent, self.expert_lib,
                        self.seq_keys, smpl_data=self.smpl_data,
                        root_offset=root_offset)
        cov = res["summary"]["coverage"]
        if not track_best:
            return res
        if not hasattr(self, "_best_coverage"):
            # resume-safe: a fresh (short) run must not clobber a better
            # iter_best.p from a previous run
            self._best_coverage = self._read_best_coverage()
        # A later epoch of THIS run may refresh iter_best.p at equal
        # coverage; a fresh run must strictly beat a pre-existing best
        # (agent_copycat.py:216-236 semantics, plus resume safety).
        if cov > self._best_coverage or (
                cov == self._best_coverage and self._owns_best):
            self._best_coverage = cov
            self._owns_best = True
            self.save_checkpoint(self.epoch, name="iter_best.p",
                                 extra={"coverage": cov})
        return res

    _owns_best = False

    def _read_best_coverage(self):
        path = os.path.join(self.results_dir, "models", "iter_best.p")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    cov = pickle.load(f).get("coverage")
                if cov is not None:
                    return cov
            except Exception:
                pass
            # Legacy iter_best.p without a coverage key: recover the best
            # coverage from the committed eval_*.json history so a fresh
            # coverage-0 run cannot clobber a good checkpoint.
            import glob as _glob
            import json as _json
            best = 0
            for fn in _glob.glob(os.path.join(self.results_dir,
                                              "eval_*.json")):
                try:
                    with open(fn) as f:
                        best = max(best, _json.load(f).get("coverage", 0))
                except Exception:
                    continue
            return best
        return -1

    # -- checkpointing (pickle, like the reference iter_%04d.p) -------------
    def checkpoint_path(self, epoch):
        return os.path.join(self.results_dir, "models", f"iter_{epoch:04d}.p")

    def save_checkpoint(self, epoch: int, name: str | None = None,
                        extra: dict | None = None):
        state = {
            "policy_params": jax.device_get(self.ppo_state.policy_params),
            "value_params": jax.device_get(self.ppo_state.value_params),
            "log_std": jax.device_get(self.log_std),
            "running_stats": jax.device_get(dataclasses.asdict(self.rs)),
            "sampler": self.sampler.state_dict(),
            "epoch": epoch,
            **(extra or {}),
        }
        path = (os.path.join(self.results_dir, "models", name)
                if name else self.checkpoint_path(epoch))
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load_checkpoint(self, epoch: int):
        self.load_checkpoint_file(self.checkpoint_path(epoch))

    def load_checkpoint_file(self, path: str, warm_start: bool = False):
        """Restore networks + running stats from any checkpoint file.

        warm_start=True loads only the transferable pieces (params, log_std,
        obs running stats) and leaves epoch/sampler state fresh — the
        cross-run warm-start the reference achieves by copying iter_*.p
        between results dirs (fit_uhc.py resumes a release checkpoint into a
        per-sequence run the same way)."""
        with open(path, "rb") as f:
            state = pickle.load(f)
        self.log_std = jnp.asarray(state["log_std"])
        self.ppo_state = PPOState(
            jax.tree.map(jnp.asarray, state["policy_params"]),
            jax.tree.map(jnp.asarray, state["value_params"]),
            self.policy_opt.init(state["policy_params"]),
            self.value_opt.init(state["value_params"]),
            None if self.log_std_opt is None
            else self.log_std_opt.init(self.log_std))
        rs = state["running_stats"]
        self.rs = RN.RunningStats(jnp.asarray(rs["n"]), jnp.asarray(rs["mean"]),
                                  jnp.asarray(rs["m2"]))
        if warm_start:
            return
        self.sampler.load_state_dict(state["sampler"])
        self.epoch = state["epoch"]
