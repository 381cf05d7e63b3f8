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
