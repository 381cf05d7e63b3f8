"""Math layer vs. scipy ground truth.

The reference's conventions (verified numerically against
uhc/utils/transformation.py): wxyz quats, Hamilton product, intrinsic-ZYX
euler for 'rzyx'. scipy.spatial.transform.Rotation is the independent oracle.
"""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as sRot

import jax
import jax.numpy as jnp
from uhc_tpu import maths as M

RNG = np.random.default_rng(42)


def rand_quats(n):
    q = RNG.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q):  # wxyz -> xyzw
    return sRot.from_quat(np.roll(np.asarray(q), -1, axis=-1))


def from_scipy(r):  # xyzw -> wxyz
    return np.roll(r.as_quat(), 1, axis=-1)


def quat_close(a, b, tol=1e-5):
    a, b = np.asarray(a), np.asarray(b)
    flip = np.sign(np.sum(a * b, axis=-1, keepdims=True))
    np.testing.assert_allclose(a, b * flip, atol=tol)


def test_quat_mul_inv():
    a, b = rand_quats(64), rand_quats(64)
    got = M.quat_mul(jnp.asarray(a), jnp.asarray(b))
    want = from_scipy(to_scipy(a) * to_scipy(b))
    quat_close(got, want)
    ident = M.quat_mul(jnp.asarray(a), M.quat_inv(jnp.asarray(a)))
    quat_close(ident, np.tile([1.0, 0, 0, 0], (64, 1)))


def test_quat_rotate_matches_matrix():
    q = rand_quats(64)
    v = RNG.normal(size=(64, 3))
    got = M.quat_rotate(jnp.asarray(q), jnp.asarray(v))
    want = to_scipy(q).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-5)
    got_inv = M.quat_rotate_inv(jnp.asarray(q), jnp.asarray(v))
    np.testing.assert_allclose(got_inv, to_scipy(q).inv().apply(v), atol=1e-5)


def test_mat_quat_roundtrip():
    q = rand_quats(128)
    m = M.quat_to_mat(jnp.asarray(q))
    np.testing.assert_allclose(m, to_scipy(q).as_matrix(), atol=1e-5)
    q2 = M.mat_to_quat(m)
    quat_close(q2, q, tol=1e-4)


def test_euler_zyx():
    e = RNG.uniform(-np.pi + 0.2, np.pi - 0.2, size=(64, 3))
    e[:, 1] = np.clip(e[:, 1], -1.5, 1.5)  # avoid gimbal edge for roundtrip
    got = M.quat_from_euler_zyx(jnp.asarray(e))
    want = from_scipy(sRot.from_euler("ZYX", e))
    quat_close(got, want)
    back = M.euler_zyx_from_quat(got)
    np.testing.assert_allclose(back, e, atol=1e-5)


def test_rotvec_roundtrip_and_scipy():
    q = rand_quats(128)
    rv = M.quat_to_rotvec(jnp.asarray(q))
    want = to_scipy(q).as_rotvec()
    np.testing.assert_allclose(rv, want, atol=1e-4)
    q2 = M.quat_from_rotvec(jnp.asarray(np.asarray(rv)))
    quat_close(q2, q, tol=1e-4)


def test_heading():
    q = rand_quats(64)
    yaw = M.heading_angle_new(jnp.asarray(q))
    # scipy intrinsic-ZYX first angle is the yaw
    want = to_scipy(q).as_euler("ZYX")[:, 0]
    np.testing.assert_allclose(yaw, want, atol=1e-5)
    hq = M.heading_quat_new(jnp.asarray(q))
    want_q = from_scipy(sRot.from_euler("Z", want[:, None]))
    quat_close(hq, want_q)
    # de_heading_new removes all yaw
    deh = M.de_heading_new(jnp.asarray(q))
    np.testing.assert_allclose(M.heading_angle_new(deh), 0.0, atol=1e-5)


def test_heading_quat_zeroxy():
    # get_heading_q zeroes x/y components then normalizes
    q = rand_quats(32)
    hq = np.asarray(M.heading_quat(jnp.asarray(q)))
    assert np.allclose(hq[:, 1:3], 0)
    np.testing.assert_allclose(np.linalg.norm(hq, axis=-1), 1.0, atol=1e-6)
    hand = q.copy()
    hand[:, 1:3] = 0
    hand /= np.linalg.norm(hand, axis=-1, keepdims=True)
    np.testing.assert_allclose(hq, hand, atol=1e-6)


def test_quat_integrate():
    q = rand_quats(16)
    w_local = RNG.normal(size=(16, 3))
    dt = 1.0 / 450.0
    got = M.quat_integrate(jnp.asarray(q), jnp.asarray(w_local), dt)
    want = from_scipy(to_scipy(q) * sRot.from_rotvec(w_local * dt))
    quat_close(got, want)


def test_qvel_fd_inverts_integration():
    """integrating a qvel by dt then finite-differencing recovers it."""
    dt = 1 / 30.0
    nq, nv = 76, 75
    qpos = np.zeros(nq)
    qpos[3:7] = rand_quats(1)[0]
    qpos[7:] = RNG.uniform(-1, 1, nq - 7)
    qvel = RNG.normal(size=nv) * 0.5
    nxt = qpos.copy()
    nxt[:3] = qpos[:3] + qvel[:3] * dt
    nxt[3:7] = np.asarray(
        M.quat_mul(M.quat_from_rotvec(jnp.asarray(
            np.asarray(M.quat_rotate(jnp.asarray(qpos[3:7]), jnp.asarray(qvel[3:6]))) * dt)),
            jnp.asarray(qpos[3:7]))
    )
    nxt[7:] = qpos[7:] + qvel[6:] * dt
    got = M.qvel_fd(jnp.asarray(qpos), jnp.asarray(nxt), dt)
    np.testing.assert_allclose(got, qvel, atol=1e-3)


def test_multi_quat_norm_diff():
    q0, q1 = rand_quats(24), rand_quats(24)
    d = M.multi_quat_diff(jnp.asarray(q1.ravel()), jnp.asarray(q0.ravel()))
    want = from_scipy(to_scipy(q1) * to_scipy(q0).inv()).ravel()
    quat_close(np.asarray(d).reshape(-1, 4), want.reshape(-1, 4))
    n = M.multi_quat_norm(jnp.asarray(d))
    np.testing.assert_allclose(
        n, np.arccos(np.clip(np.asarray(d).reshape(-1, 4)[:, 0], -1, 1)), atol=1e-6
    )


def test_wrap_to_pi():
    x = np.array([0.0, np.pi - 1e-3, -np.pi + 1e-3, 3 * np.pi, -3 * np.pi, 7.0])
    got = np.asarray(M.wrap_to_pi(jnp.asarray(x)))
    assert np.all(got <= np.pi + 1e-6) and np.all(got >= -np.pi - 1e-6)
    np.testing.assert_allclose(np.cos(got), np.cos(x), atol=1e-6)
    np.testing.assert_allclose(np.sin(got), np.sin(x), atol=1e-6)


def test_gradient_poles_at_identity():
    """Backward-pass regression (r4): heading_angle used acos whose gradient
    is infinite at w=±1, and quat_to_rotvec's vector norm has a NaN gradient
    at the exact-identity quaternion. Both states occur EXACTLY in training
    whenever scheduled sampling resets the integrator to a GT frame built
    from the same float constants (q ⊗ q⁻¹ cancels bitwise), and the NaN
    survives jnp.where selection (0·NaN) — observed as a stochastic
    supervised-loss NaN in the UHM env_obs runs."""
    ident = jnp.asarray([1.0, 0.0, 0.0, 0.0])

    g = jax.grad(lambda q: M.heading_angle(q))(ident)
    assert np.all(np.isfinite(np.asarray(g)))

    g = jax.grad(lambda q: jnp.sum(M.quat_to_rotvec(q)))(ident)
    assert np.all(np.isfinite(np.asarray(g)))

    g = jax.grad(lambda q: jnp.sum(M.quat_normalize(q)))(jnp.zeros(4))
    assert np.all(np.isfinite(np.asarray(g)))

    # the exact training-path composition: obs features of a root quat that
    # cancels to identity, reached through a jnp.where GT-reset select
    base = jnp.asarray([0.7071, 0.7071, 0.0, 0.0])

    def f(q):
        cur = M.quat_mul(q, M.quat_inv(base))
        rel = M.heading_angle(cur) + jnp.sum(M.heading_quat(cur))
        return jnp.sum(jnp.where(True, 0.0, rel))  # unselected branch

    g = jax.grad(f)(base)
    assert np.all(np.isfinite(np.asarray(g)))

    # value parity of the atan2 form vs 2*acos(w) on generic quats
    q = rand_quats(64)
    hq = q * np.array([1.0, 0, 0, 1.0])
    hq *= np.where(hq[:, 3:4] < 0, -1.0, 1.0)
    hq /= np.linalg.norm(hq, axis=1, keepdims=True)
    want = 2.0 * np.arccos(np.clip(hq[:, 0], -1, 1))
    got = np.asarray(M.heading_angle(jnp.asarray(q)))
    np.testing.assert_allclose(got, want, atol=1e-5)
