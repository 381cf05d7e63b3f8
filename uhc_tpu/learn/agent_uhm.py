"""Kinematic-policy trainer — uhc/agents/agent_uhm.py twin.

Trains a KinNet-based kinematic policy through the hierarchical env
(HumanoidKinEnv twin): per control step the kin action is integrated into a
target pose, a *frozen* pretrained copycat controller drives the simulated
body toward it, and the UHM dynamic-supervision reward scores the result.

`update_params` mirrors the reference mixture (agent_uhm.py:543):
  * rl_update  — PPO on the kin policy. Because the policy is recurrent,
    log-probs are recomputed by re-scanning the GRU over whole rollout
    sequences (the JAX analogue of KinPolicy.recrete_eps + initialize_rnn,
    kin_policy.py:174), one batch per optimization epoch.
  * full_update — supervised autoregressive training on GT windows
    (KinNet.train_full_supervised with scheduled sampling).

TPU design: the rollout is `lax.scan` over time of the fully fused two-level
step (kin integration + frozen-controller MLP + 15 stable-PD substeps),
vmapped over B parallel humanoids — the reference's 30-process sampler and
its CPU<->GPU hops collapse into one jitted program.
"""
from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from uhc_tpu.config.config import Config
from uhc_tpu.data.dataset import build_expert_library, load_motion_file
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.envs import humanoid_kin as K
from uhc_tpu.learn import kin_net as KN
from uhc_tpu.learn import nets
from uhc_tpu.learn import running_norm as RN
from uhc_tpu.learn.gae import estimate_advantages
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.constants import default_diff_weights
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

NEUTRAL_XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


def make_cc_policy_fn(cc_checkpoint: Dict[str, Any], cc_cfg: Config,
                      obs_dim: int, action_dim: int):
    """Frozen pretrained controller closure (humanoid_kin_v1.py:99-129):
    running-stat normalization + mean action, params baked in."""
    policy_params = jax.tree.map(jnp.asarray, cc_checkpoint["policy_params"])
    _, mean_fn = nets.make_policy(cc_cfg, obs_dim, action_dim,
                                  jax.random.PRNGKey(0))
    rs = cc_checkpoint["running_stats"]
    mean = jnp.asarray(rs["mean"])
    std = jnp.sqrt(jnp.maximum(
        jnp.asarray(rs["m2"]) / jnp.maximum(jnp.asarray(rs["n"]), 1.0),
        1e-8))

    def cc_policy_fn(cc_obs):
        z = jnp.clip((cc_obs - mean) / std, -5.0, 5.0)
        return mean_fn(policy_params, z[None])[0]

    return cc_policy_fn


class UHMAgent:
    def __init__(self, kin_cfg: Config, motion_file: str,
                 cc_checkpoint_path: Optional[str] = None,
                 num_envs: int = 256, horizon: int = 32,
                 seed: int = 1, model_xml: str = NEUTRAL_XML,
                 max_seq_len: Optional[int] = None,
                 results_dir: Optional[str] = None):
        self.cfg = kin_cfg
        self.cc_cfg = kin_cfg  # cc hyper-params ride the same Config
        self.env_cfg = kin_cfg.env
        self.num_envs = num_envs
        self.horizon = horizon
        self.results_dir = results_dir or os.path.join(
            "results", f"uhm_{kin_cfg.cfg_id}")
        os.makedirs(os.path.join(self.results_dir, "models"), exist_ok=True)

        self.topo, model = load_mjcf_humanoid(model_xml)
        self.model = model_to_dtype(model, jnp.float32)
        seqs = load_motion_file(motion_file)
        self.context_lib, self.seq_keys = build_expert_library(
            self.topo, self.model, seqs, max_len=max_seq_len)
        jpw, _ = default_diff_weights()
        self.jpos_diffw = jnp.asarray(jpw)

        d = kin_cfg.cfg_dict
        ms = d.get("model_specs", {}) or {}
        ps = d.get("policy_specs", {}) or {}
        self.policy_specs = ps
        self.kin_env_cfg = K.KinConfig(
            pose_delta=ms.get("pose_delta", False),
            remove_base=d.get("remove_base", True),
            env_episode_len=self.env_cfg.env_episode_len,
            reward_id=ps.get("reward_id", "dynamic_supervision_v1"),
            reward_weights=tuple(sorted(
                (k, tuple(v) if isinstance(v, list) else v)
                for k, v in (ps.get("reward_weights") or {}).items())),
            base_rot=self.env_cfg.base_rot)
        self.specs = KN.KinNetSpecs(
            mlp_htype=ms.get("mlp_htype", "relu"),
            mlp_hsize=tuple(ms.get("mlp_hsize", (1024, 512))),
            rnn_hdim=ms.get("rnn_hdim", 512),
            model_v=ms.get("model_v", 1),
            pose_delta=ms.get("pose_delta", False),
            remove_base=d.get("remove_base", True),
            base_rot=self.env_cfg.base_rot,
            log_std=kin_cfg.log_std,
            env_obs=ms.get("env_obs", False))

        # frozen low-level controller
        ndof, vf, meta = H.action_dims(self.topo, self.env_cfg)
        cc_action_dim = ndof + vf + meta
        cc_obs_dim = H.obs_dim(self.topo, self.env_cfg)
        if cc_checkpoint_path is not None:
            with open(cc_checkpoint_path, "rb") as f:
                cc_cp = pickle.load(f)
            self.cc_policy_fn = make_cc_policy_fn(cc_cp, kin_cfg,
                                                  cc_obs_dim, cc_action_dim)
        else:  # untrained controller (tests / cold start)
            pp, mean_fn = nets.make_policy(kin_cfg, cc_obs_dim,
                                           cc_action_dim,
                                           jax.random.PRNGKey(7))
            pp.pop("log_std", None)
            self.cc_policy_fn = lambda o: mean_fn(pp, o[None])[0]

        key = jax.random.PRNGKey(seed)
        key, kp = jax.random.split(key)
        self.params = KN.kin_net_init(kp, self.topo, self.specs)
        self.opt = optax.adam(d.get("lr", kin_cfg.policy_lr))
        self.opt_state = self.opt.init(self.params)
        self.value_params = nets.value_init(
            key, KN.kin_obs_dim(self.topo), kin_cfg.value_hsize)
        self.value_opt = optax.adam(kin_cfg.value_lr)
        self.value_opt_state = self.value_opt.init(self.value_params)
        self.rng = key
        self.gt_rate0 = float(ps.get("gt_rate", 0.3))
        self.gt_rate = self.gt_rate0
        # scheduled-sampling decay (kin_net.py:500-502 per_epoch_update):
        # gt_rate anneals linearly to 0 so late training sees pure
        # autoregressive rollouts — without it the integrator is reset to GT
        # every ~1/gt_rate frames and compounding AR error is never trained
        # against (the r3 457mm mpjpe failure mode).
        self.gt_rate_decay = bool(ms.get("gt_rate_decay", True))
        self.num_epoch_fix = int(d.get("num_epoch_fix", 10))
        self.total_epochs = int(d.get("num_epoch", kin_cfg.num_epoch))
        self.sup_window = int(ps.get("window", 32))
        self.sup_batch = int(ps.get("batch", 16))
        self.epoch = 0

        self._rollout = jax.jit(self._rollout_impl)
        self._rl_update = jax.jit(self._rl_update_impl,
                                  donate_argnums=(0, 1, 2, 3))
        self._full_update = jax.jit(self._full_update_impl,
                                    donate_argnums=(0, 1))

    # -- hierarchical rollout -------------------------------------------------
    def _rollout_impl(self, params, log_std, rng, seq_idx):
        """scan(vmap(kin_env_step)) for `horizon` steps from fresh resets.
        Returns per-step (obs, h, action, reward, mask, done) stacks."""
        B = self.num_envs
        # independent streams for initial resets vs per-step randomness
        # (split sets of the same key share prefixes)
        r_init, r_steps = jax.random.split(rng)
        keys = jax.random.split(r_init, B)
        states = jax.vmap(
            lambda k, s: K.kin_env_reset(self.topo, self.model,
                                         self.kin_env_cfg, k, s,
                                         self.context_lib))(keys, seq_idx)
        obs0 = jax.vmap(lambda s: K.get_ar_obs_v1(
            self.topo, self.model, self.env_cfg, s, self.context_lib))(states)
        h0 = jnp.zeros((B, self.specs.rnn_hdim))

        def step_fn(carry, key):
            states, obs, h = carry
            mean, h_new = jax.vmap(
                lambda o, hh: KN.kin_net_action(params, self.specs, o, hh))(
                obs, h)
            k_act, k_reset = jax.random.split(key)
            action = mean + jnp.exp(log_std) * jax.random.normal(
                k_act, mean.shape, mean.dtype)
            states2, obs2, reward, terms, done = jax.vmap(
                lambda s, a: K.kin_env_step(
                    self.topo, self.model, self.kin_env_cfg, self.env_cfg,
                    s, a, self.context_lib, self.cc_policy_fn,
                    self.jpos_diffw))(states, action)
            # auto-reset finished episodes; GRU state and obs reset too
            def reset_one(d, s_new, s0):
                return jax.tree.map(
                    lambda a, b: jnp.where(d, b, a), s_new, s0)
            # (the kin env restarts from the context's frame 0)
            fresh = jax.vmap(
                lambda k, s: K.kin_env_reset(self.topo, self.model,
                                             self.kin_env_cfg, k, s,
                                             self.context_lib))(
                jax.random.split(k_reset, B), seq_idx)
            states_r = jax.vmap(reset_one)(done, states2, fresh)
            obs_r = jax.vmap(lambda s: K.get_ar_obs_v1(
                self.topo, self.model, self.env_cfg, s,
                self.context_lib))(states_r)
            h_r = jnp.where(done[:, None], jnp.zeros_like(h_new), h_new)
            out = {"obs": obs, "action": action, "reward": reward,
                   "done": done, "percent": states2.percent}
            return (states_r, obs_r, h_r), out

        step_keys = jax.random.split(r_steps, self.horizon)
        (_, _, _), traj = jax.lax.scan(step_fn, (states, obs0, h0), step_keys)
        return traj

    # -- PPO over sequences ---------------------------------------------------
    def _seq_log_probs(self, params, obs_seq, act_seq, done_seq, log_std):
        """(T, B, ·) log-probs re-running the GRU, resetting h at episode
        boundaries (KinPolicy.initialize_rnn semantics)."""
        B = obs_seq.shape[1]
        h0 = jnp.zeros((B, self.specs.rnn_hdim))

        def f(h, inp):
            obs, act, done = inp
            mean, h_new = jax.vmap(
                lambda o, hh: KN.kin_net_action(params, self.specs, o, hh))(
                obs, h)
            lp = nets.gaussian_log_prob(mean, log_std, act)
            h_new = jnp.where(done[:, None], jnp.zeros_like(h_new), h_new)
            return h_new, lp

        _, lps = jax.lax.scan(f, h0, (obs_seq, act_seq, done_seq))
        return lps

    def _rl_update_impl(self, params, opt_state, value_params,
                        value_opt_state, traj, rng):
        log_std = params["log_std"]
        obs, act = traj["obs"], traj["action"]
        rewards, dones = traj["reward"], traj["done"]
        masks = 1.0 - dones.astype(rewards.dtype)
        T, B = rewards.shape
        flat_obs = obs.reshape(T * B, -1)
        values = nets.value_apply(value_params, flat_obs,
                                  self.cfg.value_htype).reshape(T, B)
        adv, ret = estimate_advantages(
            rewards, masks, values, jnp.zeros(B), self.cfg.gamma,
            self.cfg.tau)
        fixed_lp = self._seq_log_probs(params, obs, act, dones, log_std)
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        def policy_loss(p):
            lp = self._seq_log_probs(p, obs, act, dones, p["log_std"])
            ratio = jnp.exp(lp - fixed_lp)
            s1 = ratio * adv
            s2 = jnp.clip(ratio, 1 - self.cfg.clip_epsilon,
                          1 + self.cfg.clip_epsilon) * adv
            return -jnp.mean(jnp.minimum(s1, s2))

        def value_loss(vp):
            v = nets.value_apply(vp, flat_obs,
                                 self.cfg.value_htype).reshape(T, B)
            return jnp.mean((v - ret) ** 2)

        def opt_epoch(carry, _):
            params, opt_state, vp, vos = carry
            vg = jax.grad(value_loss)(vp)
            vu, vos = self.value_opt.update(vg, vos)
            vp = optax.apply_updates(vp, vu)
            g = jax.grad(policy_loss)(params)
            gnorm = optax.global_norm(g)
            scale = jnp.minimum(1.0, 40.0 / (gnorm + 1e-8))
            g = jax.tree.map(lambda x: x * scale, g)
            u, opt_state = self.opt.update(g, opt_state)
            params = optax.apply_updates(params, u)
            return (params, opt_state, vp, vos), None

        (params, opt_state, value_params, value_opt_state), _ = jax.lax.scan(
            opt_epoch, (params, opt_state, value_params, value_opt_state),
            None, length=self.cfg.num_optim_epoch)
        stats = {"reward_mean": jnp.mean(rewards),
                 "episodes": jnp.sum(dones)}
        return params, opt_state, value_params, value_opt_state, stats

    # -- supervised full update ----------------------------------------------
    def _full_update_impl(self, params, opt_state, qpos_w, qvel_w, wbpos_w,
                          ss_mask):
        weights = {k: float(v) for k, v in
                   (self.policy_specs.get("weights") or
                    {"r_pos_loss": 1.0, "r_rot_loss": 1.0, "p_rot_loss": 1.0,
                     "vl_loss": 0.1, "va_loss": 0.1, "ee_loss": 1.0}).items()}

        def loss_fn(p):
            def one(qp, qv, wb, ss):
                pred = KN.kin_net_rollout(p, self.topo, self.model,
                                          self.specs, qp, qv, ss)
                total, terms = KN.kin_net_loss(pred, qp, qv,
                                               wb.reshape(qp.shape[0], -1),
                                               weights)
                return total
            return jnp.mean(jax.vmap(one)(qpos_w, qvel_w, wbpos_w, ss_mask))

        loss, g = jax.value_and_grad(loss_fn)(params)
        # clip like the RL path: early env_obs epochs see grad norms >180
        # and one bad scheduled-sampling draw can NaN the run (observed)
        gnorm = optax.global_norm(g)
        g = jax.tree.map(
            lambda x: x * jnp.minimum(1.0, 40.0 / (gnorm + 1e-8)), g)
        u, opt_state = self.opt.update(g, opt_state)
        params = optax.apply_updates(params, u)
        return params, opt_state, loss

    def full_update(self, window: int | None = None, batch: int | None = None):
        """One supervised epoch over random GT windows (scheduled sampling
        rate self.gt_rate; KinNet.train_full_supervised)."""
        window = self.sup_window if window is None else window
        batch = self.sup_batch if batch is None else batch
        self.rng, k1, k2, k3 = jax.random.split(self.rng, 4)
        n_seq = len(self.seq_keys)
        lengths = np.asarray(self.context_lib["len"])
        window = min(window, int(lengths.min()))  # clamp to shortest clip
        sidx = np.asarray(jax.random.randint(k1, (batch,), 0, n_seq))
        starts = np.asarray([
            np.random.randint(0, max(int(lengths[s]) - window, 1))
            for s in sidx])
        gather = lambda f: jnp.stack([
            self.context_lib[f][s, st:st + window]
            for s, st in zip(sidx, starts)])
        qpos_w, qvel_w = gather("qpos"), gather("qvel")
        wbpos_w = gather("wbpos")
        ss = jax.random.bernoulli(k2, self.gt_rate, (batch, window))
        self.params, self.opt_state, loss = self._full_update(
            self.params, self.opt_state, qpos_w, qvel_w, wbpos_w, ss)
        return float(loss)

    def optimize_policy(self, epoch: int):
        """update_params mixture (agent_uhm.py:543): RL and/or supervised,
        per policy_specs flags."""
        t0 = time.time()
        stats: Dict[str, Any] = {}
        if self.gt_rate_decay:
            n, nfix = self.total_epochs, self.num_epoch_fix
            self.gt_rate = self.gt_rate0 * (
                1.0 - max(0, epoch - nfix) / float(n - nfix + 1))
        stats["gt_rate"] = self.gt_rate
        if self.policy_specs.get("rl_update", False):
            self.rng, k1, k2, k3 = jax.random.split(self.rng, 4)
            seq_idx = jax.random.randint(k1, (self.num_envs,), 0,
                                         len(self.seq_keys))
            traj = self._rollout(self.params, self.params["log_std"], k2,
                                 seq_idx)
            (self.params, self.opt_state, self.value_params,
             self.value_opt_state, rl_stats) = self._rl_update(
                self.params, self.opt_state, self.value_params,
                self.value_opt_state, traj, k3)
            stats.update(jax.device_get(rl_stats))
        if self.policy_specs.get("full_update", True):
            stats["supervised_loss"] = self.full_update()
        stats["T_total"] = time.time() - t0
        self.epoch = epoch
        return stats

    # -- checkpointing ---------------------------------------------------------
    def checkpoint_path(self, epoch):
        return os.path.join(self.results_dir, "models", f"iter_{epoch:04d}.p")

    def save_checkpoint(self, epoch: int):
        with open(self.checkpoint_path(epoch), "wb") as f:
            pickle.dump({
                "params": jax.device_get(self.params),
                "value_params": jax.device_get(self.value_params),
                "epoch": epoch,
            }, f)

    def load_checkpoint(self, epoch: int):
        self.load_checkpoint_file(self.checkpoint_path(epoch))

    def load_checkpoint_file(self, path: str, warm_start: bool = False):
        with open(path, "rb") as f:
            state = pickle.load(f)
        self.params = jax.tree.map(jnp.asarray, state["params"])
        self.value_params = jax.tree.map(jnp.asarray, state["value_params"])
        self.opt_state = self.opt.init(self.params)
        self.value_opt_state = self.value_opt.init(self.value_params)
        if not warm_start:
            self.epoch = state["epoch"]
