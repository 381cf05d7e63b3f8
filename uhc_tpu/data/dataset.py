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
    """Load a reference-format motion pkl -> {key: {pose_aa, trans, beta,
    gender, ...}} (beta/gender preserved for the shape-conditioned path)."""
    raw = joblib.load(path)
    if "pose_aa" in raw and not isinstance(raw["pose_aa"], dict):
        # single-clip file (standing_neutral.pkl layout)
        return {"standing_neutral": {"pose_aa": np.asarray(raw["pose_aa"]),
                                     "trans": None}}
    if "pose_aa" in raw and isinstance(raw["pose_aa"], dict):
        # columnar layout: {field: {key: array}}
        keys = list(raw["pose_aa"].keys())
        return {k: {f: (raw[f][k] if f in raw and k in raw[f] else None)
                    for f in ("pose_aa", "trans", "beta", "gender",
                              "obj_pose", "obj_info")}
                for k in keys}
    # row layout: {key: {fields}}
    return raw


GENDER_NUM = {"neutral": 0.0, "male": 1.0, "female": 2.0}


def seq_beta_gender(d: dict, n_betas: int = 16):
    """First-frame beta padded/truncated to n_betas + numeric gender
    (dataset_amass_single.py:109-128 semantics: neutral 0 / male 1 /
    female 2)."""
    beta = d.get("beta")
    if beta is None:
        beta16 = np.zeros(n_betas, np.float32)
    else:
        beta = np.asarray(beta, np.float32)
        if beta.ndim > 1:
            beta = beta[0]
        beta16 = np.zeros(n_betas, np.float32)
        beta16[:min(len(beta), n_betas)] = beta[:n_betas]
    g = d.get("gender", "neutral")
    if isinstance(g, np.ndarray):
        g = g.item()
    if isinstance(g, bytes):
        g = g.decode("utf-8")
    if isinstance(g, str):
        g = GENDER_NUM.get(g, 0.0)
    return beta16, float(g)


def build_expert_library(topo: Topology, model: Model,
                         seqs: Dict[str, dict], fps: float = 30.0,
                         max_len: Optional[int] = None,
                         converter=None, base_root_offset=None):
    """Featurize + pad + stack sequences into the expert library pytree.

    Padding repeats the last frame so out-of-range gathers (already clamped
    by expert_at) stay harmless. Returns (lib dict of (S, Tmax, ...) arrays
    + len/height bounds, list of keys).

    For mutated topologies (masterfoot), pass the SMPLConverter and the
    base (smpl-24) root offset: poses convert through the canonical 24-body
    qpos and are remapped onto the new tree (reference humanoid_im.py:212 +
    smpl_mujoco.py qpos remaps), leaving the new joints at zero."""
    keys = list(seqs.keys())
    feats = []
    for k in keys:
        d = seqs[k]
        pose_aa = np.asarray(d["pose_aa"])
        trans = d.get("trans")
        if max_len is not None:
            pose_aa = pose_aa[:max_len]
            trans = None if trans is None else trans[:max_len]
        if converter is not None:
            if pose_aa.shape[-1] > 72:
                pose_aa = np.concatenate(
                    [pose_aa[:, :66],
                     np.zeros((len(pose_aa), 6), pose_aa.dtype)], -1)
            qpos24 = smpl_to_qpose(pose_aa, base_root_offset, trans)
            qpos = converter.qpos_smpl_2_new(qpos24)
        else:
            qpos = _pose_to_qpose(topo, model, pose_aa, trans)
        feat = jax.device_get(qpos_fk(topo, model, qpos, fps))
        # object-scene track (dataset_smpl_obj.py: per-frame free-joint qpos
        # of scene objects, appended to resets in the reference env,
        # humanoid_im.py:1285-1292); carried as an expert feature so the
        # env/obs side can gather it per frame
        op = d.get("obj_pose")
        if op is not None:
            feat["obj_pose"] = np.asarray(op, np.float32)[:qpos.shape[0]]
        feats.append(feat)

    lib = _stack_library(feats, extra_keys=(
        ["obj_pose"] if any("obj_pose" in f for f in feats) else []))
    return lib, keys


def _pose_to_qpose(topo: Topology, model: Model, pose_aa, trans):
    """Route the pose vector to the topology's converter: SMPL-H 52-body
    humanoids consume the full 156-dof pose; 24-body humanoids take 72 dofs
    (SMPL-H poses have their hand dofs dropped, reference
    smpl_to_qpose(model='smpl') behavior)."""
    if topo.nbody == 52:
        from uhc_tpu.smpl.smplh import smplh_to_qpose
        if pose_aa.shape[-1] == 72:
            # plain SMPL clip on the SMPL-H body: drop the two hand-root
            # joints and zero the finger chains (flat hands — the inverse
            # of the reference's model="smpl" hand-drop)
            pose_aa = np.concatenate(
                [pose_aa[:, :66],
                 np.zeros((len(pose_aa), 90), pose_aa.dtype)], -1)
        return smplh_to_qpose(pose_aa, model.body_pos[0], trans)
    if topo.nbody == 55:
        from uhc_tpu.smpl.smplh import smplx_to_qpose
        if pose_aa.shape[-1] != 165:
            raise ValueError("55-body topology needs 165-dof SMPL-X poses")
        return smplx_to_qpose(pose_aa, model.body_pos[0], trans)
    if pose_aa.shape[-1] > 72:  # SMPL-H 156 -> SMPL body dofs
        pose_aa = np.concatenate(
            [pose_aa[:, :66], np.zeros((len(pose_aa), 6), pose_aa.dtype)], -1)
    if topo.joint_kind == "ball":
        # quaternion-joint layout (smpl_to_qpose use_quat=True,
        # reference humanoid_im.py:193)
        from uhc_tpu.smpl.convert import smpl_to_qpose_ball
        return smpl_to_qpose_ball(pose_aa, model.body_pos[0], trans)
    return smpl_to_qpose(pose_aa, model.body_pos[0], trans)


def _stack_library(feats, extra_keys=()):
    """Pad (repeat last frame) + stack per-sequence feature dicts."""
    Tmax = max(f["len"] for f in feats)
    lib = {}
    for key in extra_keys:
        # optional tracks (obj_pose): zero-fill sequences lacking them
        width = next(f[key].shape[-1] for f in feats if key in f)
        for f in feats:
            if key not in f:
                f[key] = np.zeros((f["len"], width), np.float32)
    for key in list(EXPERT_KEYS) + ["head_pos"] + list(extra_keys):
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
    return lib


def build_shaped_library(topo: Topology, base_model: Model, seqs,
                         smpl_data, cfg, fps: float = 30.0,
                         max_len: Optional[int] = None,
                         exact_mass: bool = False,
                         rel_joint_lm: bool = True):
    """Shape-conditioned expert library (reference humanoid_im.py:154-180
    reset_robot: per-beta robot rebuild + per-beta expert featurization;
    smpl_robot.py:1018 load_from_skeleton).

    Every sequence gets its own `Model` from its SMPL betas
    (smpl.robot.model_from_betas); experts are featurized through that
    model's FK, and the per-sequence shape observation
    (humanoid_im.py:1390-1406 get_expert_shape_and_gender: [beta(16) if
    has_pca] + [gender] + [weight if has_weight] + [bone_length if
    has_bone_length]) is precomputed into lib["shape_obs"].

    `smpl_data` is a single SMPLData used for all genders, or a dict
    {"neutral"/"male"/"female": SMPLData} (the reference loads gendered SMPL
    pkls; with only a neutral model every gender maps to it).

    Returns (lib, keys, model_lib) — model_lib is a Model whose
    shape-dependent leaves carry a leading (S,) library dim; gather per
    sequence with physics.model.model_gather.
    """
    import dataclasses as _dc

    from uhc_tpu.smpl.lbs import SMPLData, vertex_body_assignment
    from uhc_tpu.smpl.robot import model_from_betas

    if isinstance(smpl_data, SMPLData):
        smpl_by_gender = {0.0: smpl_data, 1.0: smpl_data, 2.0: smpl_data}
    else:
        g2n = {0.0: "neutral", 1.0: "male", 2.0: "female"}
        smpl_by_gender = {
            g: smpl_data.get(n, smpl_data.get("neutral",
                                              next(iter(smpl_data.values()))))
            for g, n in g2n.items()}

    assign = {}
    for sd in smpl_by_gender.values():
        if id(sd) not in assign:
            assign[id(sd)] = vertex_body_assignment(sd)

    keys = list(seqs.keys())
    feats, models, betas, genders = [], [], [], []
    for k in keys:
        d = seqs[k]
        sd0 = smpl_by_gender[0.0]
        n_b = int(np.asarray(sd0.shapedirs).shape[-1])
        beta16, gender = seq_beta_gender(d, 16)
        sd = smpl_by_gender.get(gender, sd0)
        if exact_mass:
            # exact hull mass properties + anatomical ranges
            # (smpl_robot.py:1087-1110 rel_joint_lm; MuJoCo-style hull
            # inertials via the Mirtich integrals)
            from uhc_tpu.smpl.robot import model_from_betas_exact
            model_s = model_from_betas_exact(
                topo, base_model, sd, jnp.asarray(beta16[:n_b]),
                assign[id(sd)], rel_joint_lm=rel_joint_lm)
        else:
            model_s = model_from_betas(topo, base_model, sd,
                                       jnp.asarray(beta16[:n_b]),
                                       assign[id(sd)])
            if rel_joint_lm:
                import dataclasses as _dc2
                from uhc_tpu.smpl.robot import rel_joint_ranges
                model_s = _dc2.replace(
                    model_s, jnt_range=rel_joint_ranges(topo, model_s))
        pose_aa = np.asarray(d["pose_aa"])
        trans = d.get("trans")
        if max_len is not None:
            pose_aa = pose_aa[:max_len]
            trans = None if trans is None else trans[:max_len]
        qpos = _pose_to_qpose(topo, model_s, pose_aa, trans)
        feats.append(jax.device_get(qpos_fk(topo, model_s, qpos, fps)))
        models.append(jax.device_get(model_s))
        betas.append(beta16)
        genders.append(gender)

    lib = _stack_library(feats)
    lib["beta"] = jnp.asarray(np.stack(betas))
    lib["gender"] = jnp.asarray(np.asarray(genders, np.float32))

    # stack per-seq models into a library (leading (S,) on per-shape leaves)
    from uhc_tpu.physics.model import MODEL_BASE_NDIM
    stacked = {}
    for f in _dc.fields(Model):
        vals = [np.asarray(getattr(m, f.name)) for m in models]
        if all(np.array_equal(vals[0], v) for v in vals[1:]):
            stacked[f.name] = jnp.asarray(vals[0])
        else:
            stacked[f.name] = jnp.asarray(np.stack(vals))
    model_lib = Model(**stacked)

    # shape observation (humanoid_im.py:1390 get_expert_shape_and_gender)
    weight = np.asarray([float(np.sum(np.asarray(m.body_mass)))
                         for m in models], np.float32)
    bone_len = np.stack([np.linalg.norm(np.asarray(m.body_pos), axis=1)
                         for m in models]).astype(np.float32)
    obs = []
    if getattr(cfg, "has_pca", True):
        obs.append(np.stack(betas))
    obs.append(np.asarray(genders, np.float32)[:, None])
    if getattr(cfg, "has_weight", False):
        obs.append(weight[:, None])
    if getattr(cfg, "has_bone_length", False):
        obs.append(bone_len)
    lib["shape_obs"] = jnp.asarray(np.concatenate(obs, axis=1))
    lib["weight"] = jnp.asarray(weight)
    return lib, keys, model_lib


def build_dr_library(topo: Topology, model: Model, seqs,
                     n_variants: int = 8, friction_scale: float = 1.5,
                     contact_scale: float = 2.0, mass_scale: float = 1.15,
                     seed: int = 0, fps: float = 30.0,
                     max_len: Optional[int] = None):
    """Domain-randomized expert library for cross-simulator robustness
    fine-tuning: every sequence is replicated `n_variants` times, each
    replica paired with a Model whose contact scalars (friction, penalty
    stiffness/damping) and body masses are perturbed log-uniformly around
    nominal. Variant 0 is exactly nominal. Training across the variants
    widens the policy's robustness margin so it survives the contact-model
    differences of a different simulator (the transfer gap measured by
    tools/cross_sim_eval.py; the reference has no DR — this is the
    TPU-native answer to its single-simulator assumption).

    Returns (lib, keys, model_lib): lib/keys are the expert library tiled
    variant-major (keys `k` for v0, `k@dr<v>` after); model_lib is a Model
    whose friction/contact_stiffness/contact_damping (and body_mass /
    body_inertia under `mass_scale`) carry a leading (S*V,) library dim —
    gathered per env by seq_idx like the shape library
    (physics.pallas_lane per-env path)."""
    import dataclasses as _dc

    lib, keys0 = build_expert_library(topo, model, seqs, fps=fps,
                                      max_len=max_len)
    S = len(keys0)
    V = int(n_variants)
    if V < 2:
        raise ValueError("build_dr_library needs n_variants >= 2")

    lib = {k: jnp.concatenate([v] * V, axis=0) for k, v in lib.items()}
    keys = list(keys0) + [f"{k}@dr{v}" for v in range(1, V) for k in keys0]

    rng = np.random.default_rng(seed)

    def _factors(scale):
        # log-uniform in [1/scale, scale]; variant 0 pinned to nominal
        f = np.exp(rng.uniform(np.log(1.0 / scale), np.log(scale),
                               size=(V,))).astype(np.float32)
        f[0] = 1.0
        return np.repeat(f, S)                       # (S*V,) variant-major

    def _batch_scalar(leaf, scale):
        base = float(np.asarray(jax.device_get(leaf)))
        return jnp.asarray(base * _factors(scale))

    mass_f = _factors(mass_scale)                    # (S*V,)
    bm = np.asarray(jax.device_get(model.body_mass), np.float32)
    bi = np.asarray(jax.device_get(model.body_inertia), np.float32)
    model_lib = _dc.replace(
        model,
        friction=_batch_scalar(model.friction, friction_scale),
        contact_stiffness=_batch_scalar(model.contact_stiffness,
                                        contact_scale),
        contact_damping=_batch_scalar(model.contact_damping, contact_scale),
        body_mass=jnp.asarray(mass_f[:, None] * bm[None, :]),
        body_inertia=jnp.asarray(mass_f[:, None, None] * bi[None, :, :]))
    return lib, keys, model_lib


def load_neutral(path: str = "/root/reference/sample_data/standing_neutral.pkl"):
    """Standing-neutral reset pose (qpos, qvel) for reactive initialization
    (humanoid_im.py:66 netural_data)."""
    d = joblib.load(path)
    return (jnp.asarray(d["qpos"], jnp.float32),
            jnp.asarray(d["qvel"], jnp.float32))
