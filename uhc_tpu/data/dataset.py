"""Motion dataset loading and the device-resident expert library.

Replaces the reference runtime dataset (uhc/data_loaders/
dataset_amass_single.py: joblib pkl of {key -> pose_aa/trans/beta/gender})
with a one-time host load that featurizes every sequence through the JAX FK
(`uhc_tpu.envs.expert.qpos_fk`) and stacks the results into padded device
arrays. After that, sampling a sequence is an integer draw and every expert
read during rollout is a device gather — no host involvement, no pickling.

File formats accepted:
  * AMASS copycat pkls (amass_copycat_take5_*.pkl): {key: {pose_aa, trans,
    beta, gender, ...}}
  * standing_neutral.pkl: {pose_aa, pose_6d, qpos, qvel} (single clip).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import joblib
import numpy as np

import jax
import jax.numpy as jnp

from uhc_tpu.envs.expert import qpos_fk
from uhc_tpu.physics.model import Model, Topology
from uhc_tpu.smpl.convert import smpl_to_qpose

EXPERT_KEYS = ["qpos", "qvel", "wbpos", "wbquat", "bquat", "body_com",
               "rlinv", "rlinv_local", "rangv", "bangvel", "ee_wpos",
               "ee_pos", "com"]


def load_motion_file(path: str) -> Dict[str, dict]:
    """Load a reference-format motion pkl -> {key: {pose_aa, trans, ...}}."""
    raw = joblib.load(path)
    if "pose_aa" in raw and not isinstance(raw["pose_aa"], dict):
        # single-clip file (standing_neutral.pkl layout)
        return {"standing_neutral": {"pose_aa": np.asarray(raw["pose_aa"]),
                                     "trans": None}}
    if "pose_aa" in raw and isinstance(raw["pose_aa"], dict):
        # columnar layout: {field: {key: array}}
        keys = list(raw["pose_aa"].keys())
        return {k: {f: (raw[f][k] if f in raw and k in raw[f] else None)
                    for f in ("pose_aa", "trans", "beta", "gender")}
                for k in keys}
    # row layout: {key: {fields}}
    return raw


def build_expert_library(topo: Topology, model: Model,
                         seqs: Dict[str, dict], fps: float = 30.0,
                         max_len: Optional[int] = None):
    """Featurize + pad + stack sequences into the expert library pytree.

    Padding repeats the last frame so out-of-range gathers (already clamped
    by expert_at) stay harmless. Returns (lib dict of (S, Tmax, ...) arrays
    + len/height bounds, list of keys)."""
    keys = list(seqs.keys())
    feats = []
    for k in keys:
        d = seqs[k]
        pose_aa = np.asarray(d["pose_aa"])
        if pose_aa.shape[-1] > 72:  # SMPL-H 156 -> SMPL body dofs
            pose_aa = np.concatenate(
                [pose_aa[:, :66], np.zeros((len(pose_aa), 6), pose_aa.dtype)], -1)
        trans = d.get("trans")
        if max_len is not None:
            pose_aa = pose_aa[:max_len]
            trans = None if trans is None else trans[:max_len]
        qpos = smpl_to_qpose(pose_aa, model.body_pos[0], trans)
        feats.append(jax.device_get(qpos_fk(topo, model, qpos, fps)))

    Tmax = max(f["len"] for f in feats)
    lib = {}
    for key in EXPERT_KEYS + ["head_pos"]:
        stacked = []
        for f in feats:
            a = np.asarray(f[key])
            pad = np.repeat(a[-1:], Tmax - a.shape[0], axis=0)
            stacked.append(np.concatenate([a, pad], 0))
        lib[key] = jnp.asarray(np.stack(stacked))
    lib["len"] = jnp.asarray([f["len"] for f in feats], jnp.int32)
    lib["height_lb"] = jnp.asarray([float(f["height_lb"]) for f in feats])
    lib["head_height_lb"] = jnp.asarray(
        [float(f["head_height_lb"]) for f in feats])
    return lib, keys


def load_neutral(path: str = "/root/reference/sample_data/standing_neutral.pkl"):
    """Standing-neutral reset pose (qpos, qvel) for reactive initialization
    (humanoid_im.py:66 netural_data)."""
    d = joblib.load(path)
    return (jnp.asarray(d["qpos"], jnp.float32),
            jnp.asarray(d["qvel"], jnp.float32))
