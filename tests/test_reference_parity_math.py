"""Direct numerical parity vs the REFERENCE'S OWN math code.

The reference's pure-math modules (uhc/utils/math_utils.py,
uhc/utils/transformation.py) import cleanly without mujoco_py, so instead
of only testing against re-derived formulas we execute the reference
functions themselves and compare elementwise. This pins the exact
conventions the obs builders and rewards depend on: quaternion product
order, heading extraction, root-vs-heading frame transforms, and the
finite-difference qvel the expert featurization uses.
"""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from uhc_tpu import maths as M

sys.path.append("/root/reference")

mu = pytest.importorskip("uhc.utils.math_utils")
tf = pytest.importorskip("uhc.utils.transformation")

RNG = np.random.RandomState(3)


def rand_quats(n):
    q = RNG.randn(n, 4)
    return (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float64)


def test_quaternion_multiply():
    qa, qb = rand_quats(32), rand_quats(32)
    ours = np.asarray(M.quat_mul(jnp.asarray(qa), jnp.asarray(qb)))
    for i in range(32):
        ref = tf.quaternion_multiply(qa[i], qb[i])
        np.testing.assert_allclose(ours[i], ref, atol=1e-6)


def test_quaternion_inverse():
    qa = rand_quats(16)
    ours = np.asarray(M.quat_inv(jnp.asarray(qa)))
    for i in range(16):
        np.testing.assert_allclose(ours[i], tf.quaternion_inverse(qa[i]),
                                   atol=1e-6)


def test_heading_q_and_de_heading():
    qa = rand_quats(16)
    for i in range(16):
        ref_h = mu.get_heading_q(qa[i])
        our_h = np.asarray(M.heading_quat(jnp.asarray(qa[i])))
        np.testing.assert_allclose(our_h, ref_h, atol=1e-6)
        ref_d = mu.de_heading(qa[i])
        our_d = np.asarray(M.de_heading(jnp.asarray(qa[i])))
        np.testing.assert_allclose(our_d, ref_d, atol=1e-6)
        ref_a = mu.get_heading(qa[i])
        our_a = float(M.heading_angle(jnp.asarray(qa[i])))
        np.testing.assert_allclose(our_a, ref_a, atol=1e-5)  # f32 vs f64


def test_heading_new_variants():
    qa = rand_quats(16)
    for i in range(16):
        np.testing.assert_allclose(
            np.asarray(M.de_heading_new(jnp.asarray(qa[i]))),
            mu.de_heading_new(qa[i]), atol=1e-6)
        np.testing.assert_allclose(
            float(M.heading_angle_new(jnp.asarray(qa[i]))),
            mu.get_heading_new(qa[i]), atol=1e-6)


def test_transform_vec_root_and_heading():
    qa = rand_quats(12)
    vs = RNG.randn(12, 3)
    for trans in ("root", "heading"):
        for i in range(12):
            ref = mu.transform_vec(vs[i], qa[i], trans)
            ours = np.asarray(M.transform_vec(jnp.asarray(vs[i]),
                                              jnp.asarray(qa[i]), trans))
            np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_quaternion_from_euler_rzyx():
    """The qpos euler triple convention: quaternion_from_euler(z,y,x,'rzyx')
    is what smpl_to_qpose inverts (smpl_mujoco.py:543)."""
    es = RNG.uniform(-1.5, 1.5, (16, 3))
    ours = np.asarray(M.quat_from_euler_zyx(jnp.asarray(es)))
    for i, (z, y, x) in enumerate(es):
        ref = tf.quaternion_from_euler(z, y, x, "rzyx")
        # sign-free comparison (q and -q are the same rotation)
        d = min(np.abs(ours[i] - ref).max(), np.abs(ours[i] + ref).max())
        assert d < 1e-6


def test_multi_quat_diff_and_norm():
    qa, qb = rand_quats(8).reshape(-1), rand_quats(8).reshape(-1)
    ref = mu.multi_quat_diff(qa, qb)
    ours = np.asarray(M.multi_quat_diff(jnp.asarray(qa.reshape(8, 4)),
                                        jnp.asarray(qb.reshape(8, 4))))
    np.testing.assert_allclose(ours.reshape(-1), ref, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(M.multi_quat_norm(jnp.asarray(ref.reshape(8, 4)))
                   ).reshape(-1),
        mu.multi_quat_norm(ref), atol=1e-6)


def test_get_qvel_fd_new():
    """The expert featurization's finite-difference velocity
    (math_utils.py:45, used by torch_smpl_humanoid qpos_fk)."""
    nq = 76
    q0 = RNG.randn(nq); q1 = RNG.randn(nq)
    for q in (q0, q1):
        q[3:7] /= np.linalg.norm(q[3:7])
        q[7:] = np.clip(q[7:], -1.2, 1.2)
    dt = 1.0 / 30.0
    ref = np.asarray(mu.get_qvel_fd_new(q0, q1, dt))
    ours = np.asarray(M.qvel_fd(jnp.asarray(q0), jnp.asarray(q1), dt))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
