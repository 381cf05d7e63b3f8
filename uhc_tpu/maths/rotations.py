"""Quaternion / rotation math for the TPU humanoid stack.

Conventions (identical to the reference framework so that data files,
qpos layouts and observation features are bit-compatible):

* quaternions are ``(..., 4)`` arrays in **wxyz** order (MuJoCo order),
  Hamilton product (matches reference uhc/utils/transformation.py:
  quaternion_multiply, quaternion_inverse semantics);
* joint euler angles are **intrinsic Z-Y-X** ("rzyx"): ``R = Rz @ Ry @ Rx``
  with qpos storing ``[z, y, x]`` per joint
  (reference uhc/smpllib/smpl_mujoco.py:594 `as_euler("ZYX")`,
  uhc/smpllib/torch_smpl_humanoid.py:184 `axes="rzyx"`);
* "heading" is the yaw component of a quaternion, extracted either by
  zeroing the x/y imaginary parts (`heading_quat`, reference
  uhc/utils/math_utils.py:134 get_heading_q) or via atan2 yaw
  (`heading_quat_new`, math_utils.py:169 get_heading_q_new).

Every function broadcasts over leading batch dimensions and is safe under
`jit`/`vmap`/`grad` (no data-dependent control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Basic quaternion algebra
# ---------------------------------------------------------------------------


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b, wxyz order."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Full quaternion inverse conj(q)/|q|² (reference transformation.py
    quaternion_inverse); equals `quat_conj` for unit quaternions."""
    return quat_conj(q) / jnp.maximum(
        jnp.sum(q * q, axis=-1, keepdims=True), jnp.finfo(q.dtype).tiny
    )


def _safe_norm(v: jnp.ndarray, eps: float) -> jnp.ndarray:
    """‖v‖ with a NaN-free gradient at v=0 (double-where): the plain
    norm's backward is v/‖v‖ = 0/0 there, and even an unselected
    `jnp.where` branch propagates that NaN (0·NaN). Forward value is
    identical to jnp.linalg.norm for ‖v‖² > eps² and eps below it."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    safe = sq > eps * eps
    return jnp.where(safe, jnp.sqrt(jnp.where(safe, sq, 1.0)), eps)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / _safe_norm(q, eps)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q: R(q) @ v.

    Uses the expanded 15-mul formula (cheaper than building the matrix).
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of unit quaternion q: R(q)^T @ v."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> (...,3,3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (wxyz), branchless Shepperd."""
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    # Four candidate constructions, pick the numerically best via where.
    qw = jnp.stack(
        [
            1.0 + tr,
            1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
            1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
            1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
        ],
        axis=-1,
    )
    case = jnp.argmax(qw, axis=-1)
    s = 2.0 * jnp.sqrt(jnp.maximum(jnp.take_along_axis(qw, case[..., None], -1)[..., 0], 1e-12))

    def build(i):
        if i == 0:
            return jnp.stack(
                [s / 4.0,
                 (m[..., 2, 1] - m[..., 1, 2]) / s,
                 (m[..., 0, 2] - m[..., 2, 0]) / s,
                 (m[..., 1, 0] - m[..., 0, 1]) / s], axis=-1)
        if i == 1:
            return jnp.stack(
                [(m[..., 2, 1] - m[..., 1, 2]) / s,
                 s / 4.0,
                 (m[..., 0, 1] + m[..., 1, 0]) / s,
                 (m[..., 0, 2] + m[..., 2, 0]) / s], axis=-1)
        if i == 2:
            return jnp.stack(
                [(m[..., 0, 2] - m[..., 2, 0]) / s,
                 (m[..., 0, 1] + m[..., 1, 0]) / s,
                 s / 4.0,
                 (m[..., 1, 2] + m[..., 2, 1]) / s], axis=-1)
        return jnp.stack(
            [(m[..., 1, 0] - m[..., 0, 1]) / s,
             (m[..., 0, 2] + m[..., 2, 0]) / s,
             (m[..., 1, 2] + m[..., 2, 1]) / s,
             s / 4.0], axis=-1)

    cands = jnp.stack([build(i) for i in range(4)], axis=-2)  # (...,4cand,4)
    q = jnp.take_along_axis(cands, case[..., None, None].repeat(4, -1), -2)[..., 0, :]
    # canonical sign: w >= 0
    return quat_normalize(q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0))


# ---------------------------------------------------------------------------
# Axis-angle / exponential map
# ---------------------------------------------------------------------------


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = angle * 0.5
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )


def quat_from_rotvec(rv: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Exponential map: rotation vector (axis*angle) -> quaternion.

    Gradient-safe at rv=0: the norm is taken through a double-where so
    d/d rv does not produce NaN (sqrt'(0)) — required by the camera-fitting
    losses (smpl/humanoid_batch.py) that differentiate through zero poses."""
    sq = jnp.sum(rv * rv, axis=-1, keepdims=True)
    safe = sq > eps * eps
    angle = jnp.where(safe, jnp.sqrt(jnp.where(safe, sq, 1.0)), 0.0)
    half = 0.5 * angle
    # sin(x)/x is stable around 0 via the small-angle series
    k = jnp.where(safe, jnp.sin(half) / jnp.where(safe, angle, 1.0),
                  0.5 - sq / 48.0)
    return jnp.concatenate([jnp.cos(half), rv * k], axis=-1)


def quat_to_rotvec(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Log map: quaternion -> rotation vector with |rv| <= pi.

    Matches reference semantics of rotation_from_quaternion + the ±2π wrap
    applied in uhc/utils/math_utils.py:45-54 (get_qvel_fd_new): flipping the
    sign so w >= 0 yields the same axis*angle vector as their while-loop wrap.
    """
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    # _safe_norm: identity dq (v=0 exactly — e.g. fd-velocity of a
    # scheduled-sampling GT reset) must not NaN the backward pass
    vn = _safe_norm(q[..., 1:4], 1e-12)
    angle = 2.0 * jnp.arctan2(vn, q[..., 0:1])
    k = jnp.where(vn < eps, 2.0 / jnp.maximum(q[..., 0:1], eps), angle / jnp.maximum(vn, eps))
    return q[..., 1:4] * k


def quat_integrate(q: jnp.ndarray, omega_local: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by body-frame angular velocity over dt.

    MuJoCo semantics (mju_quatIntegrate): free-joint angular velocity lives
    in the child body frame, so q_{t+1} = q_t ⊗ exp(ω_local · dt).
    """
    return quat_normalize(quat_mul(q, quat_from_rotvec(omega_local * dt)))


# ---------------------------------------------------------------------------
# Euler (intrinsic ZYX / "rzyx")
# ---------------------------------------------------------------------------


def quat_from_euler_zyx(e: jnp.ndarray) -> jnp.ndarray:
    """Euler [z, y, x] (intrinsic ZYX) -> quaternion. R = Rz(e0) Ry(e1) Rx(e2).

    Reference: transformation.quaternion_from_euler(·,·,·, "rzyx")."""
    hz, hy, hx = e[..., 0] * 0.5, e[..., 1] * 0.5, e[..., 2] * 0.5
    cz, sz = jnp.cos(hz), jnp.sin(hz)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    cx, sx = jnp.cos(hx), jnp.sin(hx)
    return jnp.stack(
        [
            cz * cy * cx + sz * sy * sx,
            cz * cy * sx - sz * sy * cx,
            cz * sy * cx + sz * cy * sx,
            sz * cy * cx - cz * sy * sx,
        ],
        axis=-1,
    )


def euler_zyx_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> intrinsic-ZYX euler [z, y, x] (inverse of the above)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ez = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    sy_arg = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    ey = jnp.arcsin(sy_arg)
    ex = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    return jnp.stack([ez, ey, ex], axis=-1)


# ---------------------------------------------------------------------------
# Heading helpers (reference uhc/utils/math_utils.py)
# ---------------------------------------------------------------------------


def heading_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Zero x/y imaginary parts and renormalize (math_utils.get_heading_q)."""
    hq = q * jnp.asarray([1.0, 0.0, 0.0, 1.0], dtype=q.dtype)
    return quat_normalize(hq)


def heading_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Heading as 2*acos(w) of the sign-fixed heading quat
    (math_utils.get_heading). Range [0, 2π).

    Computed as 2·atan2(z, w) with z sign-fixed ≥ 0 — identical value
    (acos(w/‖(w,z)‖) == atan2(z, w) for z ≥ 0) but with a finite gradient
    at zero heading, where acos'(±1) = ∞ would NaN any training loss that
    differentiates an observation built from a GT-reset root quat."""
    w = q[..., 0]
    z = q[..., 3]
    w = w * jnp.where(z < 0, -1.0, 1.0)
    z = jnp.abs(z)
    sq = w * w + z * z
    safe = sq > 1e-16
    ang = 2.0 * jnp.arctan2(jnp.where(safe, z, 0.0),
                            jnp.where(safe, w, 1.0))
    return ang


def heading_angle_new(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw via atan2 (math_utils.get_heading_new). Range (-π, π]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def heading_quat_new(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion about +z by the atan2 yaw (math_utils.get_heading_q_new)."""
    yaw = heading_angle_new(q)
    half = 0.5 * yaw
    zeros = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)


def de_heading(q: jnp.ndarray) -> jnp.ndarray:
    """Remove heading: h⁻¹ ⊗ q (math_utils.de_heading)."""
    return quat_mul(quat_inv(heading_quat(q)), q)


def de_heading_new(q: jnp.ndarray) -> jnp.ndarray:
    return quat_mul(quat_inv(heading_quat_new(q)), q)


def wrap_to_pi(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle(s) to (-π, π]. Branchless twin of the reference's
    while-loop ±2π wraps."""
    return x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))


# ---------------------------------------------------------------------------
# Frame transforms (math_utils.transform_vec / transform_vec_batch)
# ---------------------------------------------------------------------------


def transform_vec(v: jnp.ndarray, q: jnp.ndarray, trans: str = "root") -> jnp.ndarray:
    """Express world vector v in the frame of q ("root") or its heading frame
    ("heading": zeroed-xy heading; "heading_new": atan2 heading).

    Equals R(q_frame)^T @ v (math_utils.transform_vec)."""
    if trans == "root":
        fq = q
    elif trans == "heading":
        fq = heading_quat(q)
    elif trans == "heading_new":
        fq = heading_quat_new(q)
    else:
        raise ValueError(f"unknown trans {trans!r}")
    return quat_rotate_inv(fq, v)


# ---------------------------------------------------------------------------
# Quaternion-sequence helpers (velocities, diffs)
# ---------------------------------------------------------------------------


def multi_quat_diff(nq1: jnp.ndarray, nq0: jnp.ndarray) -> jnp.ndarray:
    """Relative quaternions q1 ⊗ q0⁻¹ over a flat (..., 4*J) layout
    (math_utils.multi_quat_diff)."""
    s = nq1.shape
    q1 = nq1.reshape(s[:-1] + (-1, 4))
    q0 = nq0.reshape(s[:-1] + (-1, 4))
    return quat_mul(q1, quat_inv(q0)).reshape(s)


def multi_quat_norm(nq: jnp.ndarray) -> jnp.ndarray:
    """Scalar rotation magnitude per joint: arccos(clip(w)) over a flat
    (..., 4*J) layout (math_utils.multi_quat_norm)."""
    s = nq.shape
    w = nq.reshape(s[:-1] + (-1, 4))[..., 0]
    return jnp.arccos(jnp.clip(w, -1.0, 1.0))


def multi_quat_norm_v2(nq: jnp.ndarray) -> jnp.ndarray:
    """Distance-from-identity per joint: ‖(|w|−1, x, y, z)‖ over a flat
    (..., 4*J) layout (math_utils.multi_quat_norm_v2 — used by the UHM
    dynamic-supervision rewards)."""
    s = nq.shape
    q = nq.reshape(s[:-1] + (-1, 4))
    d = q.at[..., 0].set(jnp.abs(q[..., 0]) - 1.0)
    return jnp.linalg.norm(d, axis=-1)


def angvel_fd(prev_q: jnp.ndarray, cur_q: jnp.ndarray, dt) -> jnp.ndarray:
    """Finite-difference angular velocity of per-joint quats, flat (...,4J) ->
    (...,3J) (math_utils.get_angvel_fd): rotvec(q_cur ⊗ q_prev⁻¹)/dt."""
    s = cur_q.shape
    dq = quat_mul(cur_q.reshape(s[:-1] + (-1, 4)),
                  quat_inv(prev_q.reshape(s[:-1] + (-1, 4))))
    rv = quat_to_rotvec(dq) / dt
    return rv.reshape(s[:-1] + (-1,))


def qvel_fd(cur_qpos: jnp.ndarray, next_qpos: jnp.ndarray, dt) -> jnp.ndarray:
    """Finite-difference generalized velocity between two qpos frames
    (math_utils.get_qvel_fd_new): world-frame linear velocity, root-frame
    angular velocity, ±π-wrapped joint-angle differences."""
    v = (next_qpos[..., :3] - cur_qpos[..., :3]) / dt
    dq = quat_mul(next_qpos[..., 3:7], quat_inv(cur_qpos[..., 3:7]))
    rv = quat_to_rotvec(dq) / dt
    rv = transform_vec(rv, cur_qpos[..., 3:7], "root")
    diff = wrap_to_pi(next_qpos[..., 7:] - cur_qpos[..., 7:])
    return jnp.concatenate([v, rv, diff / dt], axis=-1)


def qvel_fd_ball(cur_qpos: jnp.ndarray, next_qpos: jnp.ndarray, dt) -> jnp.ndarray:
    """Finite-difference generalized velocity for ball-joint qpos
    (trans 3 + root quat 4 + nj joint quats): root part as `qvel_fd`;
    joint part is the child-local angular velocity
    rotvec(q_prevⁱⁿᵛ ⊗ q_next)/dt — the coordinates `quat_integrate`
    advances, so fd velocities round-trip through the ball integrator."""
    v = (next_qpos[..., :3] - cur_qpos[..., :3]) / dt
    dq = quat_mul(next_qpos[..., 3:7], quat_inv(cur_qpos[..., 3:7]))
    rv = quat_to_rotvec(dq) / dt
    rv = transform_vec(rv, cur_qpos[..., 3:7], "root")
    s = cur_qpos.shape
    jq_c = cur_qpos[..., 7:].reshape(s[:-1] + (-1, 4))
    jq_n = next_qpos[..., 7:].reshape(s[:-1] + (-1, 4))
    dql = quat_mul(quat_inv(jq_c), jq_n)
    w_local = (quat_to_rotvec(dql) / dt).reshape(s[:-1] + (-1,))
    return jnp.concatenate([v, rv, w_local], axis=-1)
