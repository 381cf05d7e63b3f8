"""Fast maintained-inverse/PCG solver vs the exact blocked-Cholesky path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.config.config import EnvConfig
from uhc_tpu.data.dataset import build_expert_library, load_motion_file, load_neutral
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.physics import solver as S
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.constants import default_diff_weights
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
NEUTRAL = "/root/reference/sample_data/standing_neutral.pkl"


@pytest.mark.slow
def test_pcg_solver_matches_direct():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(8, 75, 75)).astype(np.float32)
    A = X @ X.transpose(0, 2, 1) + 2 * np.eye(75, dtype=np.float32)
    b = rng.normal(size=(8, 75)).astype(np.float32)
    Xinv = S.exact_inverse(jnp.asarray(A))
    # perturb A after computing the preconditioner (stale-inverse scenario)
    A2 = A + 0.3 * np.eye(75, dtype=np.float32)
    x = S.pcg_solve(jnp.asarray(A2), jnp.asarray(b), Xinv, iters=6)
    want = np.linalg.solve(A2.astype(np.float64),
                           b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-2, atol=1e-3)


@pytest.mark.slow
def test_fast_sim_matches_exact():
    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    lib, _ = build_expert_library(topo, model, load_motion_file(NEUTRAL),
                                  max_len=30)
    nqp, nqv = load_neutral(NEUTRAL)
    jpw, bdw = default_diff_weights()
    jpw, bdw = jnp.asarray(jpw), jnp.asarray(bdw)
    cfg = EnvConfig()
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(
        lambda k: H.env_reset(topo, model, cfg, k, jnp.zeros((), jnp.int32),
                              lib, nqp, nqv, train=False))(keys)
    ndof, vf, meta = H.action_dims(topo, cfg)
    acts = jax.random.normal(jax.random.PRNGKey(1), (B, ndof + vf + meta)) * 0.05

    fast = H.make_env_step_batched(topo, cfg, use_fast_solver=True)
    exact = H.make_env_step_batched(topo, cfg, use_fast_solver=False)

    sf, se = states, states
    for _ in range(3):
        sf, _, rf, _, _ = jax.jit(
            lambda s: fast(model, s, acts, lib, jpw, bdw))(sf)
        se, _, re, _, _ = jax.jit(
            lambda s: exact(model, s, acts, lib, jpw, bdw))(se)
    assert bool(jnp.all(jnp.isfinite(sf.qpos)))
    np.testing.assert_allclose(np.asarray(sf.qpos), np.asarray(se.qpos),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(re), atol=5e-3)
