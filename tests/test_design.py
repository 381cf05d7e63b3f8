"""Design-space morphology parameters (VERDICT round-1 item 6;
reference smpl_robot.py:798-949, 1654-1707 — Transform2Act lineage)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.physics.model import (model_batch_axes, model_is_batched,
                                   model_to_dtype)
from uhc_tpu.smpl.design import DesignSpace, gnn_edges
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"

SPEC = {
    "offset": {"type": "xyz", "lb": -0.4, "ub": 0.4},
    "bone_len": {"lb": 0.02, "ub": 0.7},
}


@pytest.fixture(scope="module")
def base():
    topo, model = load_mjcf_humanoid(XML)
    return topo, model_to_dtype(model, jnp.float32)


def test_layout_and_names(base):
    topo, model = base
    ds = DesignSpace(topo, SPEC)
    assert ds.n_params == 23 * 4         # 3 offset comps + 1 bone_len
    names = ds.param_names()
    assert len(names) == ds.n_params
    assert "L_Knee_offset_x" in names and "L_Knee_bone_len" in names


def test_get_set_roundtrip(base):
    topo, model = base
    ds = DesignSpace(topo, SPEC, mapping="none")
    p0 = ds.get_params(model)
    assert p0.shape == (ds.n_params,)
    assert bool(jnp.all(jnp.abs(p0) <= 1.0 + 1e-5))
    # identity: setting the current params reproduces the model offsets
    m2 = ds.set_params(model, p0)
    np.testing.assert_allclose(np.asarray(m2.body_pos),
                               np.asarray(model.body_pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ds.get_params(m2)),
                               np.asarray(p0), atol=1e-4)


def test_set_params_stretches_geometry(base):
    topo, model = base
    ds = DesignSpace(topo, {"bone_len": {"lb": 0.02, "ub": 0.7}},
                     mapping="none")
    p = ds.get_params(model)
    i_knee = ds.body_idx.index(topo.body_names.index("L_Knee"))
    lb, ub = 0.02, 0.7
    old_len = float(jnp.linalg.norm(model.body_pos[
        topo.body_names.index("L_Knee")]))
    new_len = old_len * 1.5
    p = p.at[i_knee].set((new_len - lb) / (ub - lb) * 2 - 1)
    m2 = ds.set_params(model, p)
    b = topo.body_names.index("L_Knee")
    assert float(jnp.linalg.norm(m2.body_pos[b])) == pytest.approx(
        new_len, rel=1e-4)
    # geometry/mass rescale with the bone (enforce_length_size analog)
    assert float(m2.body_mass[b]) == pytest.approx(
        float(model.body_mass[b]) * 1.5, rel=1e-4)
    np.testing.assert_allclose(np.asarray(m2.contact_point[b]),
                               np.asarray(model.contact_point[b]) * 1.5,
                               rtol=1e-4)
    # other bodies untouched
    o = topo.body_names.index("Head")
    np.testing.assert_allclose(np.asarray(m2.body_pos[o]),
                               np.asarray(model.body_pos[o]), atol=1e-7)


@pytest.mark.slow
def test_design_population_is_a_model_library(base):
    """A batch of designs vmaps into a model library usable by the batched
    env step (the Transform2Act use case)."""
    topo, model = base
    ds = DesignSpace(topo, SPEC, mapping="clip")
    rng = jax.random.PRNGKey(0)
    pop = ds.get_params(model)[None] + 0.1 * jax.random.normal(
        rng, (4, ds.n_params))
    lib = jax.vmap(lambda p: ds.set_params(model, p))(pop)
    assert model_is_batched(lib)
    assert lib.body_pos.shape == (4, topo.nbody, 3)
    axes = model_batch_axes(lib)
    # vmap batches every leaf (shared tables included); the batched env
    # step handles fully-batched libraries the same way
    assert axes.body_pos == 0 and axes.jkp == 0
    # differentiable through the morphology
    g = jax.grad(lambda p: jnp.sum(
        ds.set_params(model, p).body_pos ** 2))(pop[0])
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0


def test_gnn_edges(base):
    topo, model = base
    e = gnn_edges(topo)
    assert e.shape == (23, 2)
    assert all(topo.parents[i] == j for i, j in e)
