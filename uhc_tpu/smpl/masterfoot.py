"""Masterfoot / bigfoot foot-model variants as programmatic Model
transforms.

Reference masterfoot (uhc/smpllib/smpl_robot.py:1336 add_masterfoot,
config/masterfoot/*.yml `masterfoot: true`): each ankle body is cloned 12
times into capsule sub-bodies laid out over the foot sole (template grid
scaled by the ankle->toe bone length), each with the ankle's 3 hinge joints
re-ranged to ±master_range degrees; the SMPLConverter remaps smpl-layout
experts onto the widened tree (unknown bodies -> zero dofs, kp 50 / kd 5 /
torque 200 defaults, diff weight 0, smpl_mujoco.py:268-281).

Reference bigfoot (config/bigfoot/*.yml) swaps in a pre-generated
`humanoid_smpl_neutral_bigfoot` XML with enlarged foot geometry; that asset
is not redistributed, so here bigfoot is the equivalent array transform:
foot collision geometry (and mass/inertia consistently) scaled about the
body origin.

TPU design: a "variant" is only a (Topology, Model, SMPLConverter) triple —
no XML round trip; the converter's static gathers run inside jit.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from uhc_tpu.physics.model import Model, Topology
from uhc_tpu.smpl.converter import SMPLConverter

# sole template grid in the reference's zero-pose global frame
# (smpl_robot.py:1343-1356); y is "up" in the SMPL zero pose
_TEMPLATE = np.array([
    [0, -0.15, 0],
    [-0.08, -0.15, 0.1],
    [0.08, -0.15, 0.1],
    [-0.1, -0.15, 0.2],
    [0.1, -0.15, 0.2],
    [-0.1, -0.15, 0.35],
    [0.1, -0.15, 0.35],
    [-0.1, -0.17, 0.6],
    [0.1, -0.17, 0.6],
    [0, -0.17, 0.6],
    [0.05, -0.17, 0.6],
    [-0.05, -0.17, 0.6],
])
_REF_BONE = 0.13432456960660616   # reference ankle->toe calibration length
_CAP_R, _CAP_L = 0.035, 0.1       # capsule radius / x-extent
_CAP_MASS = 1000.0 * (np.pi * _CAP_R**2 * _CAP_L
                      + 4.0 / 3.0 * np.pi * _CAP_R**3)
NUM_PER_FOOT = len(_TEMPLATE)


def _global_positions(topo: Topology, body_pos: np.ndarray) -> np.ndarray:
    g = np.zeros_like(body_pos)
    for i in range(topo.nbody):
        p = topo.parents[i]
        g[i] = body_pos[i] + (g[p] if p >= 0 else 0.0)
    return g


def masterfoot_topology(topo: Topology) -> Topology:
    """Insert 12 `{side}_Ankle_mfNN` bodies per foot, parented to the ankle,
    placed after the ankle's existing subtree in document (DFS) order —
    matching `body.node.append` in the reference."""
    names = list(topo.body_names)
    parents = list(topo.parents)
    out_names, out_parent_name = [], []
    for i, n in enumerate(names):
        out_names.append(n)
        out_parent_name.append(names[parents[i]] if parents[i] >= 0 else None)
        if n in ("L_Toe", "R_Toe"):  # end of each ankle's subtree
            side = n[0]
            for k in range(NUM_PER_FOOT):
                out_names.append(f"{side}_Ankle_mf{k:02d}")
                out_parent_name.append(f"{side}_Ankle")
    new_parents = tuple(
        -1 if p is None else out_names.index(p) for p in out_parent_name)
    return Topology(nbody=len(out_names), parents=new_parents,
                    body_names=tuple(out_names))


def masterfoot_model(topo: Topology, model: Model,
                     master_range_deg: float = 30.0):
    """(topo24, model24) -> (topo_mf, model_mf, SMPLConverter)."""
    new_topo = masterfoot_topology(topo)
    conv = SMPLConverter(topo, new_topo, smpl_model="smpl")

    names = list(topo.body_names)
    bp = np.asarray(model.body_pos)
    gpos = _global_positions(topo, bp)
    cp_old = np.asarray(model.contact_point)
    cm_old = np.asarray(model.contact_mask)
    K = max(cp_old.shape[1], 3)

    nb = new_topo.nbody
    body_pos = np.zeros((nb, 3), np.float32)
    body_ipos = np.zeros((nb, 3), np.float32)
    body_mass = np.zeros(nb, np.float32)
    body_inertia = np.zeros((nb, 3), np.float32)
    body_iquat = np.tile([1.0, 0, 0, 0], (nb, 1)).astype(np.float32)
    cpoints = np.zeros((nb, K, 3), np.float32)
    cmask = np.zeros((nb, K), np.float32)
    SC = np.asarray(model.sc_point).shape[1]
    sc_point = np.zeros((nb, SC, 3), np.float32)
    sc_radius = np.zeros(nb, np.float32)

    for i, name in enumerate(new_topo.body_names):
        if name in names:
            j = names.index(name)
            body_pos[i] = bp[j]
            body_ipos[i] = np.asarray(model.body_ipos)[j]
            body_mass[i] = np.asarray(model.body_mass)[j]
            body_inertia[i] = np.asarray(model.body_inertia)[j]
            body_iquat[i] = np.asarray(model.body_iquat)[j]
            cpoints[i, :cp_old.shape[1]] = cp_old[j]
            cmask[i, :cm_old.shape[1]] = cm_old[j]
            sc_point[i] = np.asarray(model.sc_point)[j]
            sc_radius[i] = np.asarray(model.sc_radius)[j]
            continue
        # masterfoot capsule body (zero offset from its ankle)
        side = name[0]
        j_ank = names.index(f"{side}_Ankle")
        j_toe = names.index(f"{side}_Toe")
        k = int(name[-2:])
        diff_mul = np.linalg.norm(bp[j_toe]) / _REF_BONE
        t = _TEMPLATE[k].copy()
        t[2] -= 0.08 * diff_mul
        t[0] -= 0.05 * diff_mul if side == "R" else -0.05 * diff_mul
        t /= 3.0 / diff_mul
        t += gpos[j_ank]
        # sole height: lowest foot-hull vertical coordinate (body frame y +
        # ankle global y, smpl_robot.py:1362)
        hull_y = cp_old[j_ank][cm_old[j_ank] > 0][:, 1] + gpos[j_ank][1]
        t[1] = hull_y.min()
        start = t - gpos[j_ank]          # ankle(body)-frame capsule start
        end = start + np.array([_CAP_L, 0.0, 0.0])
        center = 0.5 * (start + end)
        body_pos[i] = 0.0
        body_ipos[i] = center
        body_mass[i] = _CAP_MASS
        ixx = 0.5 * _CAP_MASS * _CAP_R**2
        iyy = _CAP_MASS * (_CAP_L**2 / 12.0 + _CAP_R**2 / 4.0)
        body_inertia[i] = [ixx, iyy, iyy]
        # contact proxies on the capsule underside (-y is "down" in the
        # zero-pose body frame)
        drop = np.array([0.0, _CAP_R, 0.0])
        cpoints[i, 0] = start - drop
        cpoints[i, 1] = center - drop
        cpoints[i, 2] = end - drop
        cmask[i, :3] = 1.0
        sc_point[i] = np.linspace(0.0, 1.0, SC)[:, None] * (end - start) + start
        sc_radius[i] = _CAP_R

    armature = np.zeros(new_topo.nv, np.float32)
    armature[6:] = 0.01
    mr = np.deg2rad(master_range_deg)
    jnt_range = np.zeros((new_topo.ndof, 2), np.float32)
    old_ranges = {n: np.asarray(model.jnt_range)[3 * (j - 1):3 * j]
                  for j, n in enumerate(names) if j > 0}
    for i, name in enumerate(new_topo.body_names[1:], start=1):
        s = 3 * (i - 1)
        if name in old_ranges:
            jnt_range[s:s + 3] = old_ranges[name]
        else:
            jnt_range[s:s + 3] = [-mr, mr]

    new_model = dataclasses.replace(
        model,
        body_pos=body_pos, body_ipos=body_ipos, body_mass=body_mass,
        body_inertia=body_inertia, body_iquat=body_iquat, armature=armature,
        jkp=conv.get_new_jkp().astype(np.float32),
        jkd=conv.get_new_jkd().astype(np.float32),
        torque_lim=conv.get_new_torque_limit().astype(np.float32),
        a_scale=conv.get_new_a_scale().astype(np.float32),
        jnt_range=jnt_range, contact_point=cpoints, contact_mask=cmask,
        sc_point=sc_point, sc_radius=sc_radius)
    return new_topo, new_model, conv


def bigfoot_model(topo: Topology, model: Model, scale: float = 1.6) -> Model:
    """Enlarged-feet variant (config/bigfoot lineage): ankle/toe collision
    geometry scaled about each body origin, with mass ~s^3 and inertia ~s^5
    consistency on the scaled bodies."""
    names = list(topo.body_names)
    feet = [names.index(n) for n in ("L_Ankle", "R_Ankle", "L_Toe", "R_Toe")]
    s = np.ones(topo.nbody, np.float32)
    s[feet] = scale
    return dataclasses.replace(
        model,
        contact_point=np.asarray(model.contact_point) * s[:, None, None],
        body_ipos=np.asarray(model.body_ipos) * s[:, None],
        body_mass=np.asarray(model.body_mass) * s**3,
        body_inertia=np.asarray(model.body_inertia) * s[:, None]**5)
