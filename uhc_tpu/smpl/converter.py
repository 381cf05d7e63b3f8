"""Model-to-model state remapping — uhc/smpllib/smpl_mujoco.py:36
SMPLConverter twin.

Maps qpos/qvel/jpos between the canonical 24-body "smpl" humanoid and any
mutated "new" topology (e.g. masterfoot robots that clone extra foot
sub-bodies, smpl_robot.py:1336), and provides the per-joint PD-gain /
gear / torque-limit / diff-weight tables for the new model.

TPU design: the reference remaps with per-call python loops over body-name
dicts; here the name matching happens once at construction and becomes
static gather-index arrays, so every conversion is a single `take` that
jits/vmaps (the remap can run inside the rollout when experts live in smpl
layout but the sim runs a mutated body).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from uhc_tpu.physics.model import Topology

# body_ws (smpl_mujoco.py:40) — per-body diff weights of the canonical model
SMPL_BODY_WS: Dict[str, float] = {
    "Pelvis": 1.0, "L_Hip": 1.0, "L_Knee": 1.0, "L_Ankle": 1.0, "L_Toe": 0.0,
    "R_Hip": 1.0, "R_Knee": 1.0, "R_Ankle": 1.0, "R_Toe": 0.0, "Torso": 1.0,
    "Spine": 1.0, "Chest": 1.0, "Neck": 1.0, "Head": 1.0, "L_Thorax": 1.0,
    "L_Shoulder": 1.0, "L_Elbow": 1.0, "L_Wrist": 1.0, "L_Hand": 0.0,
    "R_Thorax": 1.0, "R_Shoulder": 1.0, "R_Elbow": 1.0, "R_Wrist": 1.0,
    "R_Hand": 0.0,
}

# [kp, kd, gear, torque_limit] (smpl_mujoco.py:67)
SMPL_BODY_PARAMS: Dict[str, List[float]] = {
    "L_Hip": [500, 50, 1, 500], "L_Knee": [500, 50, 1, 500],
    "L_Ankle": [400, 40, 1, 500], "L_Toe": [200, 20, 1, 500],
    "R_Hip": [500, 50, 1, 500], "R_Knee": [500, 50, 1, 500],
    "R_Ankle": [400, 40, 1, 500], "R_Toe": [200, 20, 1, 500],
    "Torso": [1000, 100, 1, 500], "Spine": [1000, 100, 1, 500],
    "Chest": [1000, 100, 1, 500], "Neck": [100, 10, 1, 250],
    "Head": [100, 10, 1, 250], "L_Thorax": [400, 40, 1, 500],
    "L_Shoulder": [400, 40, 1, 500], "L_Elbow": [300, 30, 1, 150],
    "L_Wrist": [100, 10, 1, 150], "L_Hand": [100, 10, 1, 150],
    "R_Thorax": [400, 40, 1, 150], "R_Shoulder": [400, 40, 1, 250],
    "R_Elbow": [300, 30, 1, 150], "R_Wrist": [100, 10, 1, 150],
    "R_Hand": [100, 10, 1, 150],
}

# SMPL-H/X hand extensions (smpl_mujoco.py:93-200): 0.3 diff weight and
# [100, 10, 1, 100] gains per finger segment
_FINGERS = [f"{s}_{f}{i}" for s in ("L", "R")
            for f in ("Index", "Middle", "Pinky", "Ring", "Thumb")
            for i in (1, 2, 3)]
SMPLH_BODY_WS = {**{k: v for k, v in SMPL_BODY_WS.items()
                    if k not in ("L_Hand", "R_Hand")},
                 **{(f if not f.startswith("R_P") else f.replace("P", "p")):
                    0.3 for f in _FINGERS}}
SMPLH_BODY_PARAMS = {**{k: v for k, v in SMPL_BODY_PARAMS.items()
                        if k not in ("L_Hand", "R_Hand")},
                     **{(f if not f.startswith("R_P") else
                         f.replace("P", "p")): [100, 10, 1, 100]
                        for f in _FINGERS}}


def _qpos_addr(topo: Topology) -> Dict[str, tuple]:
    """get_body_qposaddr twin for our fixed layout (free root + 3-dof
    hinges)."""
    out = {topo.body_names[0]: (0, 7)}
    for i in range(1, topo.nbody):
        s = 7 + (i - 1) * 3
        out[topo.body_names[i]] = (s, s + 3)
    return out


def _qvel_addr(topo: Topology) -> Dict[str, tuple]:
    out = {topo.body_names[0]: (0, 6)}
    for i in range(1, topo.nbody):
        s = 6 + (i - 1) * 3
        out[topo.body_names[i]] = (s, s + 3)
    return out


class SMPLConverter:
    """All remaps become static index arrays at construction."""

    def __init__(self, topo: Topology, new_topo: Topology,
                 smpl_model: str = "smpl"):
        self.topo, self.new_topo = topo, new_topo
        if smpl_model == "smpl":
            self.body_ws, self.body_params = SMPL_BODY_WS, SMPL_BODY_PARAMS
        else:
            self.body_ws, self.body_params = (SMPLH_BODY_WS,
                                              SMPLH_BODY_PARAMS)
        sq, sv = _qpos_addr(topo), _qvel_addr(topo)
        nq_a, nv_a = _qpos_addr(new_topo), _qvel_addr(new_topo)
        self.smpl_joint_names = list(sq.keys())
        self.new_joint_names = list(nq_a.keys())

        # smpl -> new: for each new slot, index into smpl qpos (or -1 = zero)
        def fwd(addr_s, addr_n, n_new):
            idx = np.full(n_new, -1, np.int64)
            for name, (a, b) in addr_n.items():
                if name in addr_s:
                    s0 = addr_s[name][0]
                    idx[a:b] = np.arange(s0, s0 + (b - a))
            return idx

        self._qpos_fwd = fwd(sq, nq_a, new_topo.nq)
        self._qvel_fwd = fwd(sv, nv_a, new_topo.nv)

        # new -> smpl: new indices in smpl joint order; smpl joints absent
        # from a REDUCED tree (e.g. remove_toe) map to -1 -> zero-filled
        self._qpos_bwd = np.concatenate([
            np.arange(*nq_a[self.smpl_joint_names[0]])
            if self.smpl_joint_names[0] in nq_a else np.full(7, -1)] + [
            (np.arange(*nq_a[j]) if j in nq_a else np.full(3, -1, np.int64))
            for j in self.smpl_joint_names[1:]])
        self._qvel_bwd = np.concatenate([
            np.arange(*nv_a[self.smpl_joint_names[0]])
            if self.smpl_joint_names[0] in nv_a else np.full(6, -1)] + [
            (np.arange(*nv_a[j]) if j in nv_a else np.full(3, -1, np.int64))
            for j in self.smpl_joint_names[1:]])
        self._jpos_bwd = np.array(
            [self.new_joint_names.index(j) if j in self.new_joint_names
             else -1 for j in self.smpl_joint_names])

    # -- state remaps (batched; jit/vmap safe) --------------------------------
    def qpos_smpl_2_new(self, qpos):
        out = jnp.take(qpos, jnp.maximum(self._qpos_fwd, 0), axis=-1)
        return out * (self._qpos_fwd >= 0)

    def qvel_smpl_2_new(self, qvel):
        out = jnp.take(qvel, jnp.maximum(self._qvel_fwd, 0), axis=-1)
        return out * (self._qvel_fwd >= 0)

    def qpos_new_2_smpl(self, qpos):
        out = jnp.take(qpos, jnp.maximum(self._qpos_bwd, 0), axis=-1)
        return out * (self._qpos_bwd >= 0)

    def qvel_new_2_smpl(self, qvel):
        out = jnp.take(qvel, jnp.maximum(self._qvel_bwd, 0), axis=-1)
        return out * (self._qvel_bwd >= 0)

    def jpos_new_2_smpl(self, jpos):
        j = jnp.reshape(jpos, jpos.shape[:-1] + (-1, 3)) \
            if jpos.shape[-1] != 3 else jpos
        out = jnp.take(j, jnp.maximum(self._jpos_bwd, 0), axis=-2)
        return out * (self._jpos_bwd >= 0)[:, None]

    # -- per-joint tables of the new model (smpl_mujoco.py:259-281) -----------
    def get_new_qpos_lim(self) -> int:
        return self.new_topo.nq

    def get_new_qvel_lim(self) -> int:
        return self.new_topo.nv

    def get_new_body_lim(self) -> int:
        return self.new_topo.nbody

    def get_new_diff_weight(self):
        return np.array([self.body_ws.get(n, 0.0)
                         for n in self.new_joint_names])

    def _table(self, col: int, default: float):
        return np.concatenate(
            [[self.body_params[n][col]] * 3 if n in self.body_ws
             else [default] * 3 for n in self.new_joint_names[1:]])

    def get_new_jkp(self):
        return self._table(0, 50.0)

    def get_new_jkd(self):
        return self._table(1, 5.0)

    def get_new_a_scale(self):
        return self._table(2, 1.0)

    def get_new_torque_limit(self):
        return self._table(3, 200.0)
