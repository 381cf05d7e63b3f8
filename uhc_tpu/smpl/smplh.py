"""SMPL-H (52-joint, articulated hands) topology and model family.

Reference: uhc/smpllib/smpl_parser.py:42 SMPLH_BONE_ORDER_NAMES /
:464 SMPLH_Parser; per-finger gain tables uhc/smpllib/smpl_mujoco.py:93-200
(mirrored in uhc_tpu/smpl/converter.py SMPLH_BODY_PARAMS / SMPLH_BODY_WS).

The 52-body humanoid drops SMPL's L_Hand/R_Hand leaf bodies and hangs 15
finger segments off each wrist. Pose vectors are 156 = 52*3 axis-angle dofs
in SMPL-H native order; the MuJoCo body order is the depth-first traversal
of the joint tree with children in native order — exactly how the
reference's skeleton writer lays out the generated MJCF.

With the real SMPL-H model data absent from this image, finger joint
offsets default to anthropometric chains derived from the base model's
wrist->hand direction; `smplh_model_from_offsets` accepts exact 52-joint
offsets (e.g. from a SMPL-H joint regressor) when available.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from uhc_tpu.physics.model import Model, Topology
from uhc_tpu.smpl.constants import SMPL_EE_NAMES

# native (pose-vector) order, reference smpl_parser.py:42
SMPLH_BONE_ORDER_NAMES = [
    "Pelvis", "L_Hip", "R_Hip", "Torso", "L_Knee", "R_Knee", "Spine",
    "L_Ankle", "R_Ankle", "Chest", "L_Toe", "R_Toe", "Neck", "L_Thorax",
    "R_Thorax", "Head", "L_Shoulder", "R_Shoulder", "L_Elbow", "R_Elbow",
    "L_Wrist", "R_Wrist",
] + [f"{s}_{f}{i}" for s in ("L", "R")
     for f in ("Index", "Middle", "Pinky", "Ring", "Thumb")
     for i in (1, 2, 3)]

# native-order parents: SMPL body tree + finger chains off each wrist
_BODY_PARENTS = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
                 16, 17, 18, 19]
SMPLH_PARENTS = np.array(
    _BODY_PARENTS
    + [20 if i == 0 else 21 + f * 3 + i for f in range(5) for i in range(3)]
    + [21 if i == 0 else 36 + f * 3 + i for f in range(5) for i in range(3)],
    np.int32)

NUM_SMPLH_BODIES = 52


def _dfs_order():
    children = {i: [] for i in range(-1, NUM_SMPLH_BODIES)}
    for i, p in enumerate(SMPLH_PARENTS):
        children[int(p)].append(i)
    order = []

    def visit(i):
        order.append(i)
        for c in children[i]:
            visit(c)

    visit(0)
    return order


SMPLH_2_MUJOCO = np.array(_dfs_order(), np.int32)      # mujoco idx -> native
MUJOCO_2_SMPLH = np.argsort(SMPLH_2_MUJOCO).astype(np.int32)
SMPLH_MUJOCO_NAMES = [SMPLH_BONE_ORDER_NAMES[i] for i in SMPLH_2_MUJOCO]
SMPLH_MUJOCO_PARENTS = np.array(
    [-1] + [int(MUJOCO_2_SMPLH[SMPLH_PARENTS[SMPLH_2_MUJOCO[i]]])
            for i in range(1, NUM_SMPLH_BODIES)], np.int32)


def smplh_topology() -> Topology:
    return Topology(nbody=NUM_SMPLH_BODIES,
                    parents=tuple(int(p) for p in SMPLH_MUJOCO_PARENTS),
                    body_names=tuple(SMPLH_MUJOCO_NAMES))


# per-finger-segment defaults: [kp, kd, gear, torque_lim] = [100,10,1,100]
# (smpl_mujoco.py:93-200), diff weight 0.3, small solid-cylinder inertia
_FINGER_GAIN = [100.0, 10.0, 1.0, 100.0]
_FINGER_MASS = 0.02
_FINGER_INERTIA = 2e-6


def default_finger_offsets(base_model: Model, topo24: Topology):
    """Anthropometric default finger chains from the base SMPL-24 model's
    wrist->hand offsets: four fingers fan from 60% of the hand offset with
    a small lateral spread, the thumb roots at 25% with an inward bias;
    distal segments continue along the hand direction."""
    names24 = list(topo24.body_names)
    bp = np.asarray(base_model.body_pos)
    offsets = {}
    for side in ("L", "R"):
        hand_off = bp[names24.index(f"{side}_Hand")]
        u = hand_off / max(np.linalg.norm(hand_off), 1e-6)  # along the arm
        lat = np.array([0.0, 0.0, 1.0])                     # body-frame z
        lat = lat - u * np.dot(lat, u)
        lat /= max(np.linalg.norm(lat), 1e-6)
        spread = {"Index": 0.015, "Middle": 0.005, "Ring": -0.005,
                  "Pinky": -0.015, "Thumb": 0.03}
        root_frac = {"Index": 0.6, "Middle": 0.6, "Ring": 0.58,
                     "Pinky": 0.55, "Thumb": 0.25}
        seg_len = {"Index": 0.03, "Middle": 0.032, "Ring": 0.03,
                   "Pinky": 0.025, "Thumb": 0.032}
        for f in ("Index", "Middle", "Pinky", "Ring", "Thumb"):
            offsets[f"{side}_{f}1"] = (hand_off * root_frac[f]
                                       + lat * spread[f])
            offsets[f"{side}_{f}2"] = u * seg_len[f]
            offsets[f"{side}_{f}3"] = u * seg_len[f] * 0.8
    return offsets


def smplh_model(topo24: Topology, base_model: Model,
                finger_offsets: dict | None = None) -> Model:
    """Build the 52-body Model from the neutral SMPL-24 model: body segments
    copy their offsets/inertials/contacts; fingers get default (or supplied)
    offsets, per-segment gains from the SMPL-H tables, and tip contact
    points."""
    topo = smplh_topology()
    names24 = list(topo24.body_names)
    bp24 = np.asarray(base_model.body_pos)
    if finger_offsets is None:
        finger_offsets = default_finger_offsets(base_model, topo24)

    nb = topo.nbody
    K = np.asarray(base_model.contact_point).shape[1]
    body_pos = np.zeros((nb, 3), np.float32)
    body_ipos = np.zeros((nb, 3), np.float32)
    body_mass = np.zeros(nb, np.float32)
    body_inertia = np.zeros((nb, 3), np.float32)
    body_iquat = np.tile([1.0, 0, 0, 0], (nb, 1)).astype(np.float32)
    cpoints = np.zeros((nb, K, 3), np.float32)
    cmask = np.zeros((nb, K), np.float32)
    SC = np.asarray(base_model.sc_point).shape[1]
    sc_point = np.zeros((nb, SC, 3), np.float32)
    sc_radius = np.zeros(nb, np.float32)

    for i, name in enumerate(topo.body_names):
        if name in names24:
            j = names24.index(name)
            # exact SMPL-H offsets (lbs.smplh_offsets_from_betas) override
            # the base-model copy when provided
            body_pos[i] = np.asarray(finger_offsets[name], np.float32) \
                if name in finger_offsets else bp24[j]
            body_ipos[i] = np.asarray(base_model.body_ipos)[j]
            body_mass[i] = np.asarray(base_model.body_mass)[j]
            body_inertia[i] = np.asarray(base_model.body_inertia)[j]
            body_iquat[i] = np.asarray(base_model.body_iquat)[j]
            cpoints[i] = np.asarray(base_model.contact_point)[j]
            cmask[i] = np.asarray(base_model.contact_mask)[j]
            sc_point[i] = np.asarray(base_model.sc_point)[j]
            sc_radius[i] = np.asarray(base_model.sc_radius)[j]
        else:  # finger segment
            off = np.asarray(finger_offsets[name], np.float32)
            body_pos[i] = off
            seg = np.linalg.norm(off) if name[-1] != "1" else 0.03
            body_ipos[i] = np.array([0, 0, 0], np.float32)
            body_mass[i] = _FINGER_MASS
            body_inertia[i] = _FINGER_INERTIA
            # contact point at the segment tip (approx. next offset)
            cpoints[i, 0] = off / max(np.linalg.norm(off), 1e-6) * seg
            cmask[i, 0] = 1.0
            sc_point[i] = (np.linspace(0.2, 0.9, SC)[:, None]
                           * off[None, :])
            sc_radius[i] = 0.008

    # wrists lose the old hand mass? No: the reference re-derives all masses
    # from per-joint vertex hulls; here the hand's 24-model mass is split
    # uniformly over its 15 finger segments plus the wrist remainder.
    for side in ("L", "R"):
        j_hand = names24.index(f"{side}_Hand")
        hand_mass = float(np.asarray(base_model.body_mass)[j_hand])
        extra = max(hand_mass - 15 * _FINGER_MASS, 0.0)
        i_wrist = topo.body_names.index(f"{side}_Wrist")
        body_mass[i_wrist] += extra

    from uhc_tpu.smpl.converter import SMPLH_BODY_PARAMS, SMPLH_BODY_WS

    def params_of(name):
        if name in SMPLH_BODY_PARAMS:
            return SMPLH_BODY_PARAMS[name]
        # reference table quirk: right pinky keys are lowercased ("R_pinky")
        return SMPLH_BODY_PARAMS[name.replace("Pinky", "pinky")]

    jkp, jkd, tq, a_scale = [], [], [], []
    for name in topo.body_names[1:]:
        p = params_of(name)
        jkp += [p[0]] * 3
        jkd += [p[1]] * 3
        a_scale += [p[2]] * 3
        tq += [p[3]] * 3

    armature = np.zeros(topo.nv, np.float32)
    armature[6:] = 0.01
    # joint ranges: +-pi, elbows +-4pi (smpl_parser.py:315-329)
    jnt_range = np.tile([-np.pi, np.pi], (topo.ndof, 1)).astype(np.float32)
    for i, name in enumerate(topo.body_names[1:], start=1):
        if "Elbow" in name:
            jnt_range[3 * (i - 1):3 * i] = [-4 * np.pi, 4 * np.pi]

    return dataclasses.replace(
        base_model,
        body_pos=body_pos, body_ipos=body_ipos, body_mass=body_mass,
        body_inertia=body_inertia, body_iquat=body_iquat,
        armature=armature,
        jkp=np.asarray(jkp, np.float32), jkd=np.asarray(jkd, np.float32),
        torque_lim=np.asarray(tq, np.float32),
        a_scale=np.asarray(a_scale, np.float32),
        jnt_range=jnt_range, contact_point=cpoints, contact_mask=cmask,
        sc_point=sc_point, sc_radius=sc_radius)


def smplh_model_from_data(topo24: Topology, base_model: Model, smplh_data,
                          betas=None) -> Model:
    """52-body Model with EXACT joint offsets from real SMPL-H model data
    (lbs.load_smplh_data) — the path the reference takes through
    SMPLH_Parser.get_mesh_offsets -> Robot.load_from_skeleton
    (smpl_parser.py:464; smpl_robot.py:1018). With no real data present,
    callers fall back to `smplh_model`'s anthropometric defaults."""
    import jax.numpy as jnp

    from uhc_tpu.smpl.lbs import smplh_offsets_from_betas

    if betas is None:
        n_b = int(np.asarray(smplh_data.shapedirs).shape[-1])
        betas = jnp.zeros((n_b,), jnp.float32)
    offsets, _root = smplh_offsets_from_betas(smplh_data, betas)
    return smplh_model(topo24, base_model, finger_offsets=offsets)


def smplx_model_from_data(topo24: Topology, base_model: Model, smplx_data,
                          betas=None) -> Model:
    """55-body SMPL-X twin of `smplh_model_from_data`
    (SMPLX_Parser.get_mesh_offsets, smpl_parser.py:579)."""
    import jax.numpy as jnp

    from uhc_tpu.smpl.lbs import smplh_offsets_from_betas

    if betas is None:
        n_b = int(np.asarray(smplx_data.shapedirs).shape[-1])
        betas = jnp.zeros((n_b,), jnp.float32)
    offsets, _root = smplh_offsets_from_betas(smplx_data, betas)
    return smplx_model(topo24, base_model, finger_offsets=offsets)


def smplh_to_qpose(pose_aa, root_offset, trans=None, count_offset=True):
    """(T, 156) SMPL-H axis-angle (native order) + (T,3) trans ->
    (T, 7 + 51*3) qpos in MuJoCo body order (smpl_to_qpose generalization,
    smpl_mujoco.py:543 with model='smplh')."""
    import jax.numpy as jnp

    from uhc_tpu.maths import euler_zyx_from_quat, quat_from_rotvec
    from uhc_tpu.smpl.convert import DEFAULT_Z

    pose_aa = jnp.asarray(pose_aa)
    T = pose_aa.shape[0]
    if trans is None:
        trans = jnp.zeros((T, 3)).at[:, 2].set(DEFAULT_Z)
    trans = jnp.asarray(trans).reshape(T, 3)
    aa = pose_aa.reshape(T, NUM_SMPLH_BODIES, 3)
    quats = quat_from_rotvec(aa)[:, SMPLH_2_MUJOCO]
    root_quat = quats[:, 0]
    eulers = euler_zyx_from_quat(quats[:, 1:])
    pos = trans + jnp.asarray(root_offset) if count_offset else trans
    return jnp.concatenate([pos, root_quat, eulers.reshape(T, -1)], axis=1)


def smplh_diff_weights():
    """(jpos_diffw (52,), body_diffw (51,)) from SMPLH_BODY_WS (finger
    segments 0.3, toes 0)."""
    from uhc_tpu.smpl.converter import SMPLH_BODY_WS

    def w_of(name):
        if name == "Pelvis":
            return 1.0
        if name in SMPLH_BODY_WS:
            return SMPLH_BODY_WS[name]
        return SMPLH_BODY_WS[name.replace("Pinky", "pinky")]

    w = np.array([w_of(n) for n in SMPLH_MUJOCO_NAMES], np.float32)
    return w, w[1:]


def ee_indices_smplh() -> np.ndarray:
    return np.array([SMPLH_MUJOCO_NAMES.index(n) for n in SMPL_EE_NAMES],
                    np.int32)


# ---------------------------------------------------------------------------
# SMPL-X (55 articulated bodies: SMPL-H + Jaw + eyes; reference
# smpl_parser.py:97 SMPLX_BONE_ORDER_NAMES — entries past index 54 are
# surface landmarks, not articulated bodies)
# ---------------------------------------------------------------------------

SMPLX_BONE_ORDER_NAMES = (
    SMPLH_BONE_ORDER_NAMES[:22]
    + ["Jaw", "L_Eye_Smplhf", "R_Eye_Smplhf"]
    + SMPLH_BONE_ORDER_NAMES[22:])

# native parents: body chain as SMPL-H; Jaw/eyes hang off the Head (15);
# finger indices shift by the 3 inserted face joints
SMPLX_PARENTS = np.concatenate([
    SMPLH_PARENTS[:22],
    np.array([15, 15, 15], np.int32),
    np.where(SMPLH_PARENTS[22:] >= 22, SMPLH_PARENTS[22:] + 3,
             SMPLH_PARENTS[22:]),
]).astype(np.int32)

NUM_SMPLX_BODIES = 55


def _dfs_order_generic(parents):
    children = {i: [] for i in range(-1, len(parents))}
    for i, p in enumerate(parents):
        children[int(p)].append(i)
    order = []

    def visit(i):
        order.append(i)
        for c in children[i]:
            visit(c)

    visit(0)
    return np.asarray(order, np.int32)


SMPLX_2_MUJOCO = _dfs_order_generic(SMPLX_PARENTS)
MUJOCO_2_SMPLX = np.argsort(SMPLX_2_MUJOCO).astype(np.int32)
SMPLX_MUJOCO_NAMES = [SMPLX_BONE_ORDER_NAMES[i] for i in SMPLX_2_MUJOCO]
SMPLX_MUJOCO_PARENTS = np.array(
    [-1] + [int(MUJOCO_2_SMPLX[SMPLX_PARENTS[SMPLX_2_MUJOCO[i]]])
            for i in range(1, NUM_SMPLX_BODIES)], np.int32)


def smplx_topology() -> Topology:
    return Topology(nbody=NUM_SMPLX_BODIES,
                    parents=tuple(int(p) for p in SMPLX_MUJOCO_PARENTS),
                    body_names=tuple(SMPLX_MUJOCO_NAMES))


_FACE_OFFSETS = {          # defaults from the Head, body frame (m)
    "Jaw": np.array([0.0, 0.0, 0.04], np.float32),
    "L_Eye_Smplhf": np.array([0.03, 0.02, 0.06], np.float32),
    "R_Eye_Smplhf": np.array([-0.03, 0.02, 0.06], np.float32),
}


def smplx_model(topo24: Topology, base_model: Model,
                finger_offsets: dict | None = None) -> Model:
    """55-body SMPL-X Model: the SMPL-H build + jaw/eye micro-bodies
    parented to the Head (tiny mass/inertia, soft [20, 2, 1, 20] gains)."""
    import dataclasses as _dc

    m52 = smplh_model(topo24, base_model, finger_offsets)
    t52 = smplh_topology()
    topo = smplx_topology()
    names52 = list(t52.body_names)
    nb = topo.nbody
    K = np.asarray(m52.contact_point).shape[1]
    SC = np.asarray(m52.sc_point).shape[1]

    out = {f: np.zeros((nb,) + np.asarray(getattr(m52, f)).shape[1:],
                       np.float32)
           for f in ("body_pos", "body_ipos", "body_mass", "body_inertia",
                     "body_iquat", "contact_point", "contact_mask",
                     "sc_point", "sc_radius")}
    jkp, jkd, tq, a_sc = [], [], [], []
    jnt_range = []
    for i, name in enumerate(topo.body_names):
        if name in names52:
            j = names52.index(name)
            for f in out:
                out[f][i] = np.asarray(getattr(m52, f))[j]
            if i > 0:
                s = 3 * (j - 1)
                jkp += list(np.asarray(m52.jkp)[s:s + 3])
                jkd += list(np.asarray(m52.jkd)[s:s + 3])
                tq += list(np.asarray(m52.torque_lim)[s:s + 3])
                a_sc += list(np.asarray(m52.a_scale)[s:s + 3])
                jnt_range += list(np.asarray(m52.jnt_range)[s:s + 3])
        else:  # face micro-body
            out["body_pos"][i] = (
                np.asarray(finger_offsets[name], np.float32)
                if finger_offsets and name in finger_offsets
                else _FACE_OFFSETS[name])
            out["body_iquat"][i] = [1, 0, 0, 0]
            out["body_mass"][i] = 0.05
            out["body_inertia"][i] = 5e-6
            out["sc_point"][i] = _FACE_OFFSETS[name] * 0.2
            out["sc_radius"][i] = 0.01
            jkp += [20.0] * 3
            jkd += [2.0] * 3
            tq += [20.0] * 3
            a_sc += [1.0] * 3
            jnt_range += [[-np.pi / 4, np.pi / 4]] * 3

    armature = np.zeros(topo.nv, np.float32)
    armature[6:] = 0.01
    return _dc.replace(
        base_model,
        **{k: v for k, v in out.items()},
        armature=armature,
        jkp=np.asarray(jkp, np.float32), jkd=np.asarray(jkd, np.float32),
        torque_lim=np.asarray(tq, np.float32),
        a_scale=np.asarray(a_sc, np.float32),
        jnt_range=np.asarray(jnt_range, np.float32))


def smplx_to_qpose(pose_aa, root_offset, trans=None, count_offset=True):
    """(T, 165) SMPL-X axis-angle (native order) -> MuJoCo qpos."""
    import jax.numpy as jnp

    from uhc_tpu.maths import euler_zyx_from_quat, quat_from_rotvec
    from uhc_tpu.smpl.convert import DEFAULT_Z

    pose_aa = jnp.asarray(pose_aa)
    T = pose_aa.shape[0]
    if trans is None:
        trans = jnp.zeros((T, 3)).at[:, 2].set(DEFAULT_Z)
    trans = jnp.asarray(trans).reshape(T, 3)
    aa = pose_aa.reshape(T, NUM_SMPLX_BODIES, 3)
    quats = quat_from_rotvec(aa)[:, SMPLX_2_MUJOCO]
    root_quat = quats[:, 0]
    eulers = euler_zyx_from_quat(quats[:, 1:])
    pos = trans + jnp.asarray(root_offset) if count_offset else trans
    return jnp.concatenate([pos, root_quat, eulers.reshape(T, -1)], axis=1)
