"""SMPL linear blend skinning in JAX.

Replaces the reference's dependency on the torch `smplx` package
(uhc/smpllib/smpl_parser.py:7-9, get_joints_verts/get_mesh_offsets
:335-462). Only the pieces the framework needs are implemented:

* shape blendshapes + joint regression: betas -> zero-pose joints/vertices,
* full LBS: (pose_aa, betas, trans) -> posed vertices (for the
  penetration/skate eval metrics and vertex export),
* per-body vertex assignment by argmax skinning weight — the rule the
  reference uses to build per-bone collision geometry
  (uhc/smpllib/smpl_robot.py:83 get_joint_geometries).

Model data loads from the standard SMPL npz/pkl files when the user
provides them (they are not redistributable); everything is pure JAX so the
whole AMASS library can be skinned on device in one vmap.
"""
from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from uhc_tpu.maths import quat_from_rotvec, quat_mul, quat_rotate
from uhc_tpu.smpl.constants import (MUJOCO_2_SMPL, SMPL_2_MUJOCO,
                                    SMPL_BONE_ORDER_NAMES)

# SMPL kinematic parents in SMPL bone order (smplx kintree_table)
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
     19, 20, 21], np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SMPLData:
    """Static SMPL model arrays (one gender)."""

    v_template: Any   # (V, 3)
    shapedirs: Any    # (V, 3, n_betas)
    j_regressor: Any  # (24, V)
    weights: Any      # (V, 24) LBS skinning weights


def load_smpl_data(path: str, n_betas: int = 16) -> SMPLData:
    """Load a SMPL model file (.pkl or .npz) into SMPLData."""
    if path.endswith(".npz"):
        d = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="latin1")
    sd = np.asarray(d["shapedirs"])[:, :, :n_betas]
    jr = np.asarray(d["J_regressor"].todense()
                    if hasattr(d["J_regressor"], "todense")
                    else d["J_regressor"])[:24]
    return SMPLData(
        v_template=jnp.asarray(np.asarray(d["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(sd, jnp.float32),
        j_regressor=jnp.asarray(jr, jnp.float32),
        weights=jnp.asarray(np.asarray(d["weights"])[:, :24], jnp.float32),
    )


def load_smplh_data(path: str, n_betas: int = 16) -> SMPLData:
    """Load a SMPL-H (52-joint) or SMPL-X (55-joint) model file into
    SMPLData, keeping the full hand/face joint set.

    The analogue of `load_smpl_data` for the extended families (reference
    SMPLH_Parser/SMPLX_Parser, uhc/smpllib/smpl_parser.py:464,579). The
    joint count is taken from the file's J_regressor row count (52 for
    SMPL-H, 55 for SMPL-X articulated bodies; extra SMPL-X rows past 55 are
    surface landmarks and dropped)."""
    if path.endswith(".npz"):
        d = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="latin1")
    jr = np.asarray(d["J_regressor"].todense()
                    if hasattr(d["J_regressor"], "todense")
                    else d["J_regressor"])
    nj = min(jr.shape[0], 55)
    if nj not in (52, 55):
        raise ValueError(f"expected a 52/55-joint SMPL-H/X model, got {nj}")
    sd = np.asarray(d["shapedirs"])[:, :, :n_betas]
    return SMPLData(
        v_template=jnp.asarray(np.asarray(d["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(sd, jnp.float32),
        j_regressor=jnp.asarray(jr[:nj], jnp.float32),
        weights=jnp.asarray(np.asarray(d["weights"])[:, :nj], jnp.float32),
    )


def synthetic_smpl_data(rng_seed: int = 0, V: int = 512, n_betas: int = 16,
                        nj: int = 24):
    """Synthetic stand-in with SMPL's shapes, for tests without model files.

    nj=52/55 produces SMPL-H/X-shaped data (52/55-joint regressor + skin
    weights) so the extended-family loaders/LBS are testable without the
    non-redistributable model files."""
    rng = np.random.default_rng(rng_seed)
    v = rng.normal(scale=0.3, size=(V, 3)).astype(np.float32)
    v[:, 2] += 0.3
    sd = rng.normal(scale=0.01, size=(V, 3, n_betas)).astype(np.float32)
    jr = np.abs(rng.normal(size=(nj, V))).astype(np.float32)
    jr /= jr.sum(1, keepdims=True)
    w = np.abs(rng.normal(size=(V, nj))).astype(np.float32)
    w /= w.sum(1, keepdims=True)
    return SMPLData(jnp.asarray(v), jnp.asarray(sd), jnp.asarray(jr),
                    jnp.asarray(w))


def synthetic_smpl_data_like(topo, base_model, rng_seed: int = 0,
                             n_betas: int = 16, bone_sigma: float = 0.02,
                             spread_sigma: float = 0.06,
                             vert_radius: float = 0.06) -> SMPLData:
    """Anatomically-consistent synthetic SMPL stand-in: at betas=0 the
    regressed skeleton EQUALS the given base model's zero-pose skeleton, and
    each beta mode perturbs bone vectors smoothly along the kinematic chain
    (±bone_sigma per bone per unit beta) plus per-body volume spread
    (mass/hull scale).

    This replaces `synthetic_smpl_data()` as the shape-training fallback:
    the old random regressor averaged random vertices, so every regressed
    joint collapsed to the mean vertex — a centimeter-scale degenerate body
    (bone offsets 0.01-0.04 m vs the real 0.1-0.4 m). Root-translation
    control on that body is meaningless, which is what the r3
    `uhc_implicit_shape` 145 mm global-drift failure trained on.
    """
    from uhc_tpu.smpl.constants import SMPL_2_MUJOCO

    nj = topo.nbody
    rng = np.random.default_rng(rng_seed)

    # absolute zero-pose joints: mujoco order, then scatter to native order
    bp = np.asarray(base_model.body_pos, np.float64)
    abs_j = np.zeros_like(bp)
    for i in range(nj):
        p = topo.parents[i]
        abs_j[i] = bp[i] + (abs_j[p] if p >= 0 else 0.0)
    native = np.zeros_like(abs_j)
    native[np.asarray(SMPL_2_MUJOCO)] = abs_j            # native joint pos

    # 4 tetrahedral vertices per joint -> exact regressor, per-joint hulls
    tet = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                   np.float64) * (vert_radius / np.sqrt(3.0))
    V = 4 * nj
    v = (native[:, None, :] + tet[None]).reshape(V, 3)
    jr = np.zeros((nj, V))
    w = np.zeros((V, nj))
    for k in range(nj):
        jr[k, 4 * k:4 * k + 4] = 0.25
        w[4 * k:4 * k + 4, k] = 1.0

    # beta modes: random-walk bone displacement down the native tree
    # (children inherit their parent's displacement, so bones stretch
    # coherently) + per-joint isotropic spread for volume variation
    parents_native = _parents_for(nj)
    d = np.zeros((n_betas, nj, 3))
    # walk native joints parent-before-child (native order is already
    # topologically sorted for SMPL trees)
    for m in range(n_betas):
        for k in range(1, nj):
            p = int(parents_native[k])
            d[m, k] = d[m, p] + rng.normal(scale=bone_sigma, size=3)
    e = rng.normal(scale=spread_sigma, size=(n_betas, nj))
    sdirs = np.zeros((V, 3, n_betas))
    for k in range(nj):
        for t in range(4):
            i = 4 * k + t
            sdirs[i] = (d[:, k, :] + tet[t][None, :] * e[:, k:k + 1]).T
    return SMPLData(jnp.asarray(v, jnp.float32),
                    jnp.asarray(sdirs, jnp.float32),
                    jnp.asarray(jr, jnp.float32),
                    jnp.asarray(w, jnp.float32))


def _parents_for(nj: int) -> np.ndarray:
    """Native-order kinematic parents for a joint count (24/52/55)."""
    if nj == 24:
        return SMPL_PARENTS
    if nj == 52:
        from uhc_tpu.smpl.smplh import SMPLH_PARENTS
        return SMPLH_PARENTS
    if nj == 55:
        from uhc_tpu.smpl.smplh import SMPLX_PARENTS
        return SMPLX_PARENTS
    raise ValueError(f"unsupported joint count {nj}")


def shaped_vertices(data: SMPLData, betas: jnp.ndarray) -> jnp.ndarray:
    """Zero-pose vertices for shape coefficients betas (n_betas,)."""
    nb = betas.shape[-1]
    return data.v_template + jnp.einsum(
        "vcb,b->vc", data.shapedirs[:, :, :nb], betas)


def shaped_joints(data: SMPLData, betas: jnp.ndarray) -> jnp.ndarray:
    """(nj, 3) zero-pose joint locations in native bone order (nj = 24 for
    SMPL, 52 for SMPL-H, 55 for SMPL-X)."""
    return data.j_regressor @ shaped_vertices(data, betas)


def lbs(data: SMPLData, pose_aa: jnp.ndarray, betas: jnp.ndarray,
        trans: Optional[jnp.ndarray] = None):
    """Linear blend skinning.

    pose_aa: (nj, 3) axis-angle in native bone order (nj inferred from the
    model data: 24 SMPL / 52 SMPL-H / 55 SMPL-X); betas: (n_betas,);
    trans: (3,). Returns (vertices (V,3), joints (nj,3)) in world space —
    the `get_joints_verts` equivalent (smpl_parser.py:335)."""
    verts0 = shaped_vertices(data, betas)
    joints0 = data.j_regressor @ verts0
    nj = data.j_regressor.shape[0]
    parents = _parents_for(nj)

    quats = quat_from_rotvec(pose_aa)        # (nj,4) local rotations
    # accumulate global joint transforms down the native tree
    gquat = [None] * nj
    gpos = [None] * nj
    gquat[0] = quats[0]
    gpos[0] = joints0[0]
    for i in range(1, nj):
        p = int(parents[i])
        gquat[i] = quat_mul(gquat[p], quats[i])
        gpos[i] = gpos[p] + quat_rotate(gquat[p], joints0[i] - joints0[p])
    gquat = jnp.stack(gquat)
    gpos = jnp.stack(gpos)

    # skin vertices: x' = Σ_j w_j (R_j (x - j0_j) + g_j)
    rel = verts0[:, None, :] - joints0[None, :, :]          # (V,24,3)
    moved = quat_rotate(gquat[None], rel) + gpos[None]      # (V,24,3)
    verts = jnp.einsum("vj,vjc->vc", data.weights, moved)
    if trans is not None:
        verts = verts + trans
        gpos = gpos + trans
    return verts, gpos


def vertex_body_assignment(data: SMPLData) -> np.ndarray:
    """Vertex -> body assignment by argmax skinning weight, in MuJoCo body
    order (smpl_robot.py:83 builds per-bone geometries this way)."""
    a = np.argmax(np.asarray(data.weights), axis=1)  # SMPL joint index
    return np.asarray(MUJOCO_2_SMPL)[a].astype(np.int32)


def smplh_offsets_from_betas(data: SMPLData, betas: jnp.ndarray):
    """Exact per-body local offsets for the SMPL-H/X families from real
    model data: {body_name: (3,) offset} over ALL non-root bodies + the
    root joint position — the 52/55-joint analogue of
    `mujoco_offsets_from_betas` (reference SMPLH_Parser.get_mesh_offsets,
    smpl_parser.py:530-577). Feed the dict to `smpl.smplh.smplh_model` /
    `smplx_model` (their `finger_offsets` argument accepts any body name)."""
    nj = int(data.j_regressor.shape[0])
    if nj == 52:
        from uhc_tpu.smpl.smplh import SMPLH_BONE_ORDER_NAMES as NAMES
        from uhc_tpu.smpl.smplh import SMPLH_PARENTS as PARENTS
    elif nj == 55:
        from uhc_tpu.smpl.smplh import SMPLX_BONE_ORDER_NAMES as NAMES
        from uhc_tpu.smpl.smplh import SMPLX_PARENTS as PARENTS
    else:
        raise ValueError(f"expected 52/55-joint data, got {nj}")
    joints = np.asarray(shaped_joints(data, betas))      # native order
    offsets = {}
    for i in range(1, nj):
        offsets[NAMES[i]] = (joints[i] - joints[int(PARENTS[i])]).astype(
            np.float32)
    return offsets, joints[0].astype(np.float32)


def mujoco_offsets_from_betas(data: SMPLData, betas: jnp.ndarray):
    """Per-body local offsets (mujoco order) + root offset for a body shape —
    the array-level equivalent of Robot.load_from_skeleton -> MJCF body pos
    (smpl_robot.py:1018): offsets[i] = joint_i - joint_parent(i)."""
    joints = shaped_joints(data, betas)[np.asarray(SMPL_2_MUJOCO)]  # mujoco order
    from uhc_tpu.smpl.constants import MUJOCO_PARENTS

    parents = np.asarray(MUJOCO_PARENTS)
    off = joints - jnp.where(
        (parents[:, None] >= 0), joints[np.maximum(parents, 0)], 0.0)
    return off, joints[0]
