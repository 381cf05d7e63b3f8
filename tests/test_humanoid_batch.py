"""Humanoid_Batch (camera-projection fitting) tests."""
import numpy as np

import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.smpl import humanoid_batch as HB
from uhc_tpu.smpl.lbs import mujoco_offsets_from_betas, synthetic_smpl_data

SMPL2OP = np.array([24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4,
                    7, 25, 26, 27, 28])  # standard SMPL->OP25 joint map


def _setup():
    data = synthetic_smpl_data()
    offsets, root = mujoco_offsets_from_betas(
        data, jnp.zeros(data.shapedirs.shape[-1]))
    offsets = offsets.at[0].set(root)
    return offsets


def test_fk_batch_zero_pose_matches_offsets():
    offsets = _setup()
    out = HB.fk_batch(offsets, jnp.zeros((2, 72)), jnp.zeros((2, 3)),
                      count_offset=False)
    assert out["wbpos"].shape == (2, 24, 3)
    assert out["wbquat"].shape == (2, 24, 4)
    # zero pose: world positions are cumulative offsets down the tree
    from uhc_tpu.smpl.constants import MUJOCO_PARENTS

    expected = np.zeros((24, 3))
    for i in range(1, 24):
        expected[i] = expected[MUJOCO_PARENTS[i]] + np.asarray(offsets[i])
    np.testing.assert_allclose(np.asarray(out["wbpos"][0, 1:]),
                               expected[1:], atol=1e-5)


@pytest.mark.slow
def test_proj_losses_finite_and_differentiable():
    offsets = _setup()
    K = jnp.asarray([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]])
    fit = HB.CameraFit(offsets=offsets, full_R=jnp.eye(3),
                       full_t=jnp.asarray([0.0, 0.0, 3.0]), K=K,
                       img_w=1920, img_h=1080, smpl2op_map=SMPL2OP)
    T = 4
    J2d = fit.proj2d(HB.fk_batch(offsets, jnp.zeros((1, 72)),
                                 jnp.zeros((1, 3)))["wbpos"]).shape[-2]
    rng = np.random.default_rng(0)
    fit.update_tgt_joints(rng.uniform(300, 900, (T, J2d, 2)),
                          np.ones((T, J2d, 2)))

    input_vec = jnp.zeros((T, 75)).at[:, 2].set(0.9)
    for fn in (fit.proj_2d_loss, fit.proj_2d_body_loss):
        loss = fn(input_vec)
        assert np.isfinite(float(loss)), fn
        g = jax.grad(lambda v: fn(v))(input_vec)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0
    r = fit.proj_2d_root_loss(jnp.zeros(6).at[2].set(0.9))
    assert np.isfinite(float(r))


def test_gradient_descent_reduces_loss():
    """A few gradient steps on the 2D loss reduce it — the fitting loop the
    reference runs via autograd+L-BFGS (eval_scene/fit pipelines)."""
    offsets = _setup()
    K = jnp.asarray([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]])
    fit = HB.CameraFit(offsets=offsets, full_R=jnp.eye(3),
                       full_t=jnp.asarray([0.0, 0.0, 3.0]), K=K,
                       img_w=1920, img_h=1080, smpl2op_map=SMPL2OP)
    # target = projection of a known pose; start from a perturbed pose
    true_vec = jnp.zeros((1, 75)).at[:, 2].set(0.9)
    gt2d = fit.proj2d(HB.fk_batch(offsets, true_vec[:, 3:],
                                  true_vec[:, :3])["wbpos"])
    fit.update_tgt_joints(np.asarray(gt2d), np.ones(gt2d.shape))
    vec = true_vec.at[:, 0].add(0.3).at[:, 10].add(0.2)
    loss_fn = jax.jit(lambda v: fit.proj_2d_loss(v))
    g_fn = jax.jit(jax.grad(lambda v: fit.proj_2d_loss(v)))
    l0 = float(loss_fn(vec))
    for _ in range(25):
        vec = vec - 1e-3 * g_fn(vec)
    l1 = float(loss_fn(vec))
    assert l1 < l0, (l0, l1)
