"""Supervised-loss parity vs the REFERENCE'S OWN loss code
(uhc/losses/loss_function.py imports without mujoco_py)."""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.append("/root/reference")

torch = pytest.importorskip("torch")
lf = pytest.importorskip("uhc.losses.loss_function")

from uhc_tpu.learn import losses as L

RNG = np.random.RandomState(5)


def _rand_qpos(B=9, nq=76):
    q = RNG.randn(B, nq)
    q[:, 3:7] /= np.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    return q


def test_pose_and_root_losses():
    gt, pred = _rand_qpos(), _rand_qpos()
    tg, tp = torch.from_numpy(gt), torch.from_numpy(pred)
    np.testing.assert_allclose(
        np.asarray(L.pose_rot_loss(jnp.asarray(gt), jnp.asarray(pred))),
        lf.pose_rot_loss(tg, tp).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(L.root_pos_loss(jnp.asarray(gt), jnp.asarray(pred))),
        lf.root_pos_loss(tg, tp).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(L.root_orientation_loss(jnp.asarray(gt),
                                           jnp.asarray(pred))),
        lf.root_orientation_loss(tg, tp).numpy(), atol=1e-5)


def test_vector_losses():
    a, b = RNG.randn(9, 24, 3), RNG.randn(9, 24, 3)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    np.testing.assert_allclose(
        np.asarray(L.end_effector_pos_loss(jnp.asarray(a), jnp.asarray(b))),
        lf.end_effector_pos_loss(ta, tb).numpy(), atol=1e-5)
    v, w = RNG.randn(9, 75), RNG.randn(9, 75)
    np.testing.assert_allclose(
        np.asarray(L.velocity_distance_loss(jnp.asarray(v), jnp.asarray(w))),
        lf.velocity_distance_loss(torch.from_numpy(v),
                                  torch.from_numpy(w)).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(L.action_loss(jnp.asarray(v), jnp.asarray(w))),
        lf.action_loss(torch.from_numpy(v),
                       torch.from_numpy(w)).numpy(), atol=1e-5)
