"""Humanoid model arrays — the TPU-native equivalent of MjModel.

Instead of the reference's XML round-trip per body shape
(uhc/smpllib/smpl_robot.py Robot.export_xml_string -> mujoco_py MjModel),
the model here is a pair of containers:

* `Topology` — static, hashable python/numpy data (tree, dof addressing,
  ancestor masks). Fixed per robot family (SMPL-24 / SMPL-H-52); changing it
  triggers recompilation, which is the deliberate compilation boundary.
* `Model` — a JAX pytree of arrays (offsets, inertias, gains, contact
  points). Body-shape variation (SMPL betas) only changes these arrays, so
  thousands of differently-shaped humanoids batch under one compiled program
  (SURVEY.md §7 "shape variation without recompilation").

Layouts match MuJoCo for compatibility with reference data:
qpos = [root xyz (world), root quat (wxyz), 23 × euler-ZYX triplets] (76)
qvel = [root linvel (world), root angvel (root-local), 69 joint rates] (75)
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Topology:
    """Static tree structure (not traced; safe to close over in jit)."""

    nbody: int
    parents: tuple  # len nbody, -1 for root
    body_names: tuple
    # "euler": 3 sequential z-y-x hinges per joint (qpos euler triples) —
    # the canonical SMPL humanoid. "ball": one quaternion per joint
    # (reference robot.ball=True family, SkeletonMeshV2
    # uhc/khrylib/mocap/skeleton_mesh_v2.py:258; nv is identical, only the
    # position representation differs).
    joint_kind: str = "euler"

    @property
    def nv(self) -> int:
        return 6 + 3 * (self.nbody - 1)

    @property
    def nq(self) -> int:
        per = 4 if self.joint_kind == "ball" else 3
        return 7 + per * (self.nbody - 1)

    @property
    def ndof(self) -> int:
        return 3 * (self.nbody - 1)

    def dof_body(self) -> np.ndarray:
        """Body index owning each dof (first 6 -> root)."""
        out = [0] * 6
        for i in range(1, self.nbody):
            out += [i] * 3
        return np.array(out, np.int32)

    def ancestor_mask(self) -> np.ndarray:
        """(nbody, nv) 1.0 where dof j is in the kinematic chain of body i."""
        nb, nv = self.nbody, self.nv
        mask = np.zeros((nb, nv), np.float32)
        for i in range(nb):
            chain = []
            b = i
            while b != -1:
                chain.append(b)
                b = self.parents[b]
            for b in chain:
                if b == 0:
                    mask[i, 0:6] = 1.0
                else:
                    s = 6 + 3 * (b - 1)
                    mask[i, s:s + 3] = 1.0
        return mask

    def topo_order(self):
        """Indices in parent-before-child order (the build order already is)."""
        return list(range(self.nbody))

    def levels(self):
        """Bodies grouped by tree depth (root excluded): list of
        (body_idx array, parent_idx array). FK/velocity propagation iterates
        over depth (9 for SMPL) instead of bodies (24) — every body within a
        level advances in one vectorized step."""
        import numpy as _np

        depth = [0] * self.nbody
        for i in range(1, self.nbody):
            depth[i] = depth[self.parents[i]] + 1
        out = []
        for d in range(1, max(depth) + 1):
            idx = _np.array([i for i in range(self.nbody) if depth[i] == d],
                            _np.int32)
            par = _np.array([self.parents[i] for i in idx], _np.int32)
            out.append((idx, par))
        return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Model:
    """Array data of the humanoid (a pytree; leading batch dims allowed)."""

    # kinematics
    body_pos: Any      # (nbody,3) offset from parent frame (root: world offset)
    body_ipos: Any     # (nbody,3) COM in body frame
    body_mass: Any     # (nbody,)
    body_inertia: Any  # (nbody,3) principal moments
    body_iquat: Any    # (nbody,4) principal frame orientation in body frame
    # dofs
    armature: Any      # (nv,)
    jkp: Any           # (ndof,) stable-PD kp
    jkd: Any           # (ndof,) stable-PD kd
    torque_lim: Any    # (ndof,)
    a_scale: Any       # (ndof,) torque-mode action scale
    jnt_range: Any     # (ndof,2) joint limits (radians)
    # contact: dense per-body layout (nb, K, 3) + validity mask — fixed K per
    # body so all reductions are reshape-sums (no scatter on TPU)
    contact_point: Any  # (nb, K, 3) candidate points, body frame
    contact_mask: Any   # (nb, K) 1.0 for real points, 0.0 padding
    # self-collision proxies: SC spheres per body along the bone axis
    # (sphere-chain approximation of the body hull for body-body contacts)
    sc_point: Any       # (nb, SC, 3) sphere centers, body frame
    sc_radius: Any      # (nb,) sphere radius per body
    # scalars (0-d arrays so the pytree stays uniform)
    friction: Any        # tangential friction coefficient
    contact_stiffness: Any
    contact_damping: Any
    contact_depth_cap: Any   # max spring depth (bounded restoration force —
                             # the penalty analogue of MuJoCo solimp limiting)
    contact_vreg: Any        # friction velocity regularization (explicit-
                             # integration stability bound at 450 Hz)
    gravity: Any        # (3,)
    dt: Any             # physics timestep (1/450)

    def nbody(self):
        return self.body_pos.shape[-2]


# base (unbatched) ndim of every Model leaf — used to detect leading
# batch/library dims on shape-conditioned models
MODEL_BASE_NDIM = {
    "body_pos": 2, "body_ipos": 2, "body_mass": 1, "body_inertia": 2,
    "body_iquat": 2, "armature": 1, "jkp": 1, "jkd": 1, "torque_lim": 1,
    "a_scale": 1, "jnt_range": 2, "contact_point": 3, "contact_mask": 2,
    "sc_point": 3, "sc_radius": 1,
    "friction": 0, "contact_stiffness": 0, "contact_damping": 0,
    "contact_depth_cap": 0, "contact_vreg": 0, "gravity": 1, "dt": 0,
}


def model_batch_axes(m: Model):
    """A Model of vmap in_axes: 0 for leaves carrying a leading batch dim,
    None for shared leaves. Lets `vmap` run per-env physics over a pytree
    that mixes per-shape arrays (body_pos, masses, ...) with shared tables
    (gains, limits)."""
    axes = {}
    for f in dataclasses.fields(Model):
        v = getattr(m, f.name)
        nd = jnp.ndim(v)
        axes[f.name] = 0 if nd > MODEL_BASE_NDIM[f.name] else None
    return Model(**axes)


def model_gather(lib: Model, idx) -> Model:
    """Index a model *library* (leaves with leading (S,) dims) by sequence
    index/indices. Shared leaves pass through; idx may be scalar or (B,)."""
    out = {}
    for f in dataclasses.fields(Model):
        v = getattr(lib, f.name)
        if jnp.ndim(v) > MODEL_BASE_NDIM[f.name]:
            out[f.name] = jnp.asarray(v)[idx]
        else:
            out[f.name] = v
    return Model(**out)


def model_is_batched(m: Model) -> bool:
    return any(jnp.ndim(getattr(m, f.name)) > MODEL_BASE_NDIM[f.name]
               for f in dataclasses.fields(Model))


def model_to_dtype(m: Model, dtype) -> Model:
    fields = {}
    for f in dataclasses.fields(Model):
        v = getattr(m, f.name)
        fields[f.name] = jnp.asarray(v, dtype)
    return Model(**fields)
