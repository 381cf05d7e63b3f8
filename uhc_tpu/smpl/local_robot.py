"""smpl_local_robot-style robot options as Model/Topology transforms.

Reference: uhc/smpllib/smpl_local_robot.py:1136 (Robot with
`upright_start`, `big_ankle`, `remove_toe`, box feet — the Isaac-flavored
variant family) and smpl_cap_robot.py (capsule-only geoms). The reference
implements each option as XML mutations; here they are pure array
transforms over (Topology, Model):

* upright_start — pre-rotate the rest pose by base_rot so the zero pose
  stands upright (all body-frame vectors rotated; consumers then use an
  identity base_rot),
* big_ankle    — ankle collision/self-collision geometry scaled,
* remove_toe   — Toe bodies removed from the tree, their mass/contacts
  folded into the ankles (translated by the toe offset),
* box_feet     — ankle contact points replaced by an 8-corner box grid
  spanning the foot extent (the box-geom replacement),
* capsule (smpl_cap_robot) — contact points collapsed onto the bone axis
  (2 sphere-chain ends per body), the capsule-only geometry family.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from uhc_tpu.physics.model import Model, Topology


def _rotate_all(v: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Rotate (..., 3) vectors by quat q = (w,x,y,z)."""
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return v @ R.T


def upright_start_model(model: Model,
                        base_rot=(0.7071, 0.7071, 0.0, 0.0)) -> Model:
    """Pre-rotate every body-frame vector by base_rot so the zero pose is
    upright (smpl_local_robot `upright_start`); use base_rot = identity in
    configs consuming this model."""
    q = np.asarray(base_rot, np.float64)
    q = q / np.linalg.norm(q)
    rot = lambda a: _rotate_all(np.asarray(a, np.float64), q).astype(
        np.float32)
    return dataclasses.replace(
        model,
        body_pos=rot(model.body_pos),
        body_ipos=rot(model.body_ipos),
        contact_point=rot(model.contact_point),
        sc_point=rot(model.sc_point))


def big_ankle_model(topo: Topology, model: Model,
                    scale: float = 1.5) -> Model:
    """Scaled ankle collision geometry (smpl_local_robot `big_ankle`)."""
    names = list(topo.body_names)
    s = np.ones(topo.nbody, np.float32)
    for n in ("L_Ankle", "R_Ankle"):
        if n in names:
            s[names.index(n)] = scale
    return dataclasses.replace(
        model,
        contact_point=np.asarray(model.contact_point) * s[:, None, None],
        sc_radius=np.asarray(model.sc_radius) * s)


def box_feet_model(topo: Topology, model: Model) -> Model:
    """Replace ankle contact points with the 8 corners of their bounding
    box (the box-geom feet replacement)."""
    names = list(topo.body_names)
    cp = np.asarray(model.contact_point).copy()
    cm = np.asarray(model.contact_mask).copy()
    for n in ("L_Ankle", "R_Ankle"):
        if n not in names:
            continue
        i = names.index(n)
        pts = cp[i][cm[i] > 0]
        lo, hi = pts.min(0), pts.max(0)
        corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                            for y in (lo[1], hi[1])
                            for z in (lo[2], hi[2])], np.float32)
        cp[i] = 0.0
        cm[i] = 0.0
        cp[i, :8] = corners
        cm[i, :8] = 1.0
    return dataclasses.replace(model, contact_point=cp, contact_mask=cm)


def capsule_model(topo: Topology, model: Model) -> Model:
    """Capsule-only collision family (smpl_cap_robot): contact candidates
    collapse onto the two ends of each body's self-collision sphere chain,
    dropped onto the chain surface."""
    sc = np.asarray(model.sc_point)
    r = np.asarray(model.sc_radius)
    K = np.asarray(model.contact_point).shape[1]
    cp = np.zeros_like(np.asarray(model.contact_point))
    cm = np.zeros_like(np.asarray(model.contact_mask))
    for i in range(topo.nbody):
        ends = np.stack([sc[i, 0], sc[i, -1]])
        cp[i, :2] = ends - np.array([0.0, r[i], 0.0])   # -y = down, zero pose
        cm[i, :2] = 1.0
    return dataclasses.replace(model, contact_point=cp, contact_mask=cm)


def remove_toe_model(topo: Topology, model: Model) -> Tuple[Topology, Model]:
    """Drop the Toe bodies; toe mass and contact points fold into the
    ankles (translated by the toe offset) so foot support is preserved
    (smpl_local_robot `remove_toe`)."""
    names = list(topo.body_names)
    keep = [i for i, n in enumerate(names) if n not in ("L_Toe", "R_Toe")]
    old2new = {o: n for n, o in enumerate(keep)}
    new_topo = Topology(
        nbody=len(keep),
        parents=tuple(-1 if topo.parents[o] == -1
                      else old2new[topo.parents[o]] for o in keep),
        body_names=tuple(names[o] for o in keep))

    arr = {f: np.asarray(getattr(model, f)).copy() for f in (
        "body_pos", "body_ipos", "body_mass", "body_inertia", "body_iquat",
        "contact_point", "contact_mask", "sc_point", "sc_radius",
        "jkp", "jkd", "torque_lim", "a_scale", "jnt_range")}
    K = arr["contact_point"].shape[1]
    for side in ("L", "R"):
        if f"{side}_Toe" not in names:
            continue
        it, ia = names.index(f"{side}_Toe"), names.index(f"{side}_Ankle")
        off = arr["body_pos"][it]
        m_t, m_a = arr["body_mass"][it], arr["body_mass"][ia]
        arr["body_ipos"][ia] = (
            m_a * arr["body_ipos"][ia]
            + m_t * (off + arr["body_ipos"][it])) / (m_a + m_t)
        arr["body_mass"][ia] = m_a + m_t
        # toe contact points, translated into the ankle frame, replace the
        # ankle's least-supporting points
        tpts = arr["contact_point"][it][arr["contact_mask"][it] > 0] + off
        napts = int(arr["contact_mask"][ia].sum())
        free = K - napts
        take = min(len(tpts), free) if free > 0 else 0
        if take:
            arr["contact_point"][ia, napts:napts + take] = tpts[:take]
            arr["contact_mask"][ia, napts:napts + take] = 1.0

    def sel_body(a):
        return a[keep]

    def sel_dof(a):
        idx = np.concatenate([np.arange(3 * (o - 1), 3 * o)
                              for o in keep if o > 0])
        return a[idx]

    armature = np.zeros(new_topo.nv, np.float32)
    armature[6:] = np.asarray(model.armature)[6:6 + new_topo.ndof]
    new_model = dataclasses.replace(
        model,
        body_pos=sel_body(arr["body_pos"]),
        body_ipos=sel_body(arr["body_ipos"]),
        body_mass=sel_body(arr["body_mass"]),
        body_inertia=sel_body(arr["body_inertia"]),
        body_iquat=sel_body(arr["body_iquat"]),
        contact_point=sel_body(arr["contact_point"]),
        contact_mask=sel_body(arr["contact_mask"]),
        sc_point=sel_body(arr["sc_point"]),
        sc_radius=sel_body(arr["sc_radius"]),
        jkp=sel_dof(arr["jkp"]), jkd=sel_dof(arr["jkd"]),
        torque_lim=sel_dof(arr["torque_lim"]),
        a_scale=sel_dof(arr["a_scale"]),
        jnt_range=sel_dof(arr["jnt_range"]),
        armature=armature)
    return new_topo, new_model
