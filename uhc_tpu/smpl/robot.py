"""Shape-conditioned humanoid building — the `Robot.load_from_skeleton` twin.

The reference rebuilds an MJCF XML + MuJoCo model per body shape
(uhc/smpllib/smpl_robot.py:1018, humanoid_im.py:154 reset_robot ->
reload_sim_model), which costs mesh decimation + XML round-trip per episode.
Here a body shape is just *data*: `model_from_betas` maps SMPL betas to a
`Model` array pytree with the same treedef as the base model, so

  * it runs on device, inside jit, and `vmap`s over a batch of betas —
    thousands of differently-shaped humanoids in one compiled program,
  * no recompilation: the topology (and array shapes) never change.

Shape-dependent quantities:
  * joint offsets: exact, from the SMPL shape blendshapes + joint regressor,
  * COM / mass / inertia / contact points: scaled from the base (neutral)
    body by per-body linear scale factors derived from the skinned vertex
    extents (mass ~ s³, inertia ~ s⁵ under uniform density) — the array-level
    stand-in for re-running convex-hull mass properties per shape.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from uhc_tpu.physics.model import Model, Topology
from uhc_tpu.smpl.lbs import (SMPLData, mujoco_offsets_from_betas,
                              shaped_vertices, vertex_body_assignment)


def body_vertex_scale(data: SMPLData, betas, assignment: np.ndarray,
                      nbody: int):
    """Per-body rms vertex distance to the body's joint, relative to the
    zero-beta shape -> (nb,) linear scale factors."""
    from uhc_tpu.smpl.lbs import shaped_joints
    from uhc_tpu.smpl.constants import SMPL_2_MUJOCO

    one = jnp.asarray(assignment)
    onehot = jax.nn.one_hot(one, nbody, dtype=jnp.float32)    # (V, nb)
    counts = jnp.maximum(onehot.sum(0), 1.0)

    def rms(b):
        verts = shaped_vertices(data, b)
        joints = shaped_joints(data, b)[np.asarray(SMPL_2_MUJOCO)]
        d2 = jnp.sum((verts[:, None] - joints[None]) ** 2, -1)  # (V, nb)
        return jnp.sqrt(jnp.sum(d2 * onehot, 0) / counts)

    zero = jnp.zeros_like(jnp.asarray(betas))
    return rms(jnp.asarray(betas)) / jnp.maximum(rms(zero), 1e-6)


def model_from_betas(topo: Topology, base_model: Model, data: SMPLData,
                     betas, assignment: np.ndarray) -> Model:
    """Model pytree for shape `betas` (same treedef as base_model)."""
    off, _root = mujoco_offsets_from_betas(data, jnp.asarray(betas))
    s = body_vertex_scale(data, betas, assignment, topo.nbody)   # (nb,)
    return dataclasses.replace(
        base_model,
        body_pos=off.astype(base_model.body_pos.dtype),
        body_ipos=base_model.body_ipos * s[:, None],
        body_mass=base_model.body_mass * s**3,
        body_inertia=base_model.body_inertia * s[:, None]**5,
        contact_point=base_model.contact_point * s[:, None, None],
        sc_point=base_model.sc_point * s[:, None, None],
        sc_radius=base_model.sc_radius * s,
    )


def batched_models(topo: Topology, base_model: Model, data: SMPLData,
                   betas_batch, assignment: np.ndarray) -> Model:
    """vmap model_from_betas over (B, n_betas) -> Model with leading batch
    dims on the shape-dependent leaves (broadcast the rest)."""
    fn = jax.vmap(lambda b: model_from_betas(topo, base_model, data, b,
                                             assignment))
    return fn(jnp.asarray(betas_batch))


def rel_joint_ranges(topo: Topology, base_model: Model) -> jnp.ndarray:
    """Anatomical knee/ankle/toe joint-range overrides for shaped robots
    (reference rel_joint_lm, uhc/smpllib/smpl_robot.py:1087-1110): knees
    hinge one way (±π/16 off-axis, [-π/16, π] flexion), ankles ±π/2, toes
    ±π/4 (±π/2 flexion). Dof order per joint is (z, y, x); the reference's
    per-joint rows [0..2] map to the same triple."""
    jr = np.array(np.asarray(base_model.jnt_range), np.float32).copy()
    names = list(topo.body_names)
    table = {
        "Knee": [(-np.pi / 16, np.pi / 16), (-np.pi / 16, np.pi / 16),
                 (-np.pi / 16, np.pi)],
        "Ankle": [(-np.pi / 2, np.pi / 2)] * 3,
        "Toe": [(-np.pi / 4, np.pi / 4), (-np.pi / 4, np.pi / 4),
                (-np.pi / 2, np.pi / 2)],
    }
    for part, rows in table.items():
        for side in ("L", "R"):
            n = f"{side}_{part}"
            if n not in names:
                continue
            base = 3 * (names.index(n) - 1)
            for k in range(3):
                jr[base + k] = rows[k]
    return jnp.asarray(jr)


def model_from_betas_exact(topo: Topology, base_model: Model, data: SMPLData,
                           betas, assignment: np.ndarray,
                           density: float = 1000.0,
                           rel_joint_lm: bool = True) -> Model:
    """Host-side shaped model with EXACT per-body hull mass properties.

    Where `model_from_betas` scales the neutral body's mass/inertia by
    s³/s⁵ heuristics, this builds each body's convex hull from its assigned
    shaped vertices (argmax skin weight, smpl_robot.py:83) and integrates
    exact mass/COM/inertia with the Mirtich divergence-theorem integrals
    (smpl.mesh.mesh_mass_properties) — the same computation MuJoCo performs
    on the reference's hull geoms. Runs once per shape at library-build
    time (uses Qhull), not inside jit."""
    from scipy.spatial import ConvexHull

    from uhc_tpu.smpl.constants import SMPL_2_MUJOCO
    from uhc_tpu.smpl.lbs import shaped_joints
    from uhc_tpu.smpl.mesh import mesh_mass_properties, principal_inertia

    m = model_from_betas(topo, base_model, data, betas, assignment)
    if rel_joint_lm:
        m = dataclasses.replace(m, jnt_range=rel_joint_ranges(topo, m))

    verts = np.asarray(shaped_vertices(data, jnp.asarray(betas)))
    joints = np.asarray(shaped_joints(data, jnp.asarray(betas)))[
        np.asarray(SMPL_2_MUJOCO)]
    nb = topo.nbody
    mass = np.array(np.asarray(m.body_mass), np.float32)
    ipos = np.array(np.asarray(m.body_ipos), np.float32)
    iner = np.array(np.asarray(m.body_inertia), np.float32)
    iquat = np.array(np.asarray(m.body_iquat), np.float32)
    for b in range(nb):
        pts = verts[np.asarray(assignment) == b] - joints[b]
        if len(pts) < 8:
            continue
        try:
            hull = ConvexHull(pts)
        except Exception:
            continue
        tris = pts[hull.simplices]
        # outward-orient each triangle against the hull centroid
        cen = pts[hull.vertices].mean(0)
        n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
        flip = np.einsum("ij,ij->i", n, tris[:, 0] - cen) < 0
        tris[flip] = tris[flip][:, [0, 2, 1]]
        mm, com, I = mesh_mass_properties(tris, density)
        if mm <= 0 or not np.all(np.isfinite(I)):
            continue
        diag, q = principal_inertia(I)
        if np.any(diag <= 0):
            continue
        mass[b] = mm
        ipos[b] = com
        iner[b] = diag
        iquat[b] = q
    return dataclasses.replace(
        m, body_mass=jnp.asarray(mass), body_ipos=jnp.asarray(ipos),
        body_inertia=jnp.asarray(iner), body_iquat=jnp.asarray(iquat))
