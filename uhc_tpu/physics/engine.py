"""TPU-native rigid-body engine for reduced-coordinate humanoids.

This is the `mj_step`/`mj_forward`/`mj_fullM` replacement (reference hot loop:
uhc/envs/humanoid_im.py:1014-1190 calling the MuJoCo C engine). Design is
deliberately *dense* instead of recursive-sparse: body Jacobians are built as
full (nbody, 3, nv) tensors so the mass matrix, bias force and contact
projection become large matmuls that map onto the MXU, and everything
`vmap`s cleanly over thousands of humanoids.

Per substep (450 Hz):
  1. FK: body world poses from qpos (matches torch_smpl_humanoid.py:303
     forward_kinematics_batch conventions).
  2. Velocity/bias-acceleration propagation (exact per-dof recursion over the
     z-y-x gimbal hinges; free-joint angular dofs live in the root frame as
     in MuJoCo).
  3. Dense dof Jacobians -> mass matrix M = GᵀG + armature (composite-rigid-
     body in Jacobian form) and bias force C (RNEA with q̈=0): the same
     quantities mujoco_py exposes as mj_fullM/qfrc_bias
     (humanoid_im.py:1019-1022).
  4. Stable-PD torque (humanoid_im.py:1014-1076 semantics, LAPACK cho_solve
     -> batched jnp Cholesky), residual-force (RFC) wrench, penalty ground
     contacts, joint-limit penalties.
  5. Forward dynamics M q̈ = qfrc, semi-implicit Euler integration with
     quaternion root integration.

State is a bare (qpos, qvel) pair; the engine is purely functional.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from uhc_tpu.maths import (
    quat_from_euler_zyx,
    quat_from_rotvec,
    quat_integrate,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
    wrap_to_pi,
)
from uhc_tpu.physics.model import Model, Topology

# TPU f32 matmuls default to bf16 multiplications; the mass matrix feeds a
# Cholesky whose smallest pivots sit at armature scale (1e-2), so the Gram
# contractions here must run at full f32 precision.
HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Kinematics
# ---------------------------------------------------------------------------


def fk(topo: Topology, model: Model, qpos: jnp.ndarray):
    """Forward kinematics of a single humanoid, level-vectorized.

    All per-joint trig/quaternion work is batched over the 23 joints first;
    the only sequential dependency is the parent chain, walked by tree depth
    (9 levels for SMPL) with all bodies of a level advancing in one step.

    Returns dict with xpos (nb,3), xquat (nb,4), xipos (nb,3 COM world),
    and the per-dof world axes (nv,3) / anchors (nv,3) needed by dynamics.
    """
    nb = topo.nbody
    dtype = qpos.dtype
    root_q = quat_normalize(qpos[3:7])
    ball = topo.joint_kind == "ball"

    if ball:
        # one quaternion per joint (SkeletonMeshV2 ball joints); dof order
        # per joint is the (x, y, z) components of the child-local angular
        # velocity, matching quat ⊗ exp(ω dt) integration
        q_local = quat_normalize(qpos[7:].reshape(nb - 1, 4))
    else:
        # vectorized per-joint partial quats: q_z, q_z⊗q_y, q_z⊗q_y⊗q_x
        e = qpos[7:].reshape(nb - 1, 3) * 0.5
        cz, sz = jnp.cos(e[:, 0]), jnp.sin(e[:, 0])
        cy, sy = jnp.cos(e[:, 1]), jnp.sin(e[:, 1])
        cx, sx = jnp.cos(e[:, 2]), jnp.sin(e[:, 2])
        zero = jnp.zeros_like(cz)
        q_z = jnp.stack([cz, zero, zero, sz], 1)
        q_y = jnp.stack([cy, zero, sy, zero], 1)
        q_x = jnp.stack([cx, sx, zero, zero], 1)
        q_zy = quat_mul(q_z, q_y)
        q_local = quat_mul(q_zy, q_x)

    xpos = jnp.zeros((nb, 3), dtype).at[0].set(qpos[0:3])
    xquat = jnp.zeros((nb, 4), dtype).at[0].set(root_q)
    for idx, par in topo.levels():
        qp = xquat[par]
        pos = xpos[par] + quat_rotate(qp, model.body_pos[idx])
        qi = quat_mul(qp, q_local[idx - 1])
        xpos = xpos.at[idx].set(pos)
        xquat = xquat.at[idx].set(qi)

    xipos = xpos + quat_rotate(xquat, model.body_ipos)

    eye = jnp.eye(3, dtype=dtype)
    if ball:
        # ball-joint motion subspace: the child body's world frame columns
        # (ω_local expressed in the child frame, as MuJoCo integrates it)
        jq_all = xquat[1:]
        a_x = quat_rotate(jq_all, eye[0])
        a_y = quat_rotate(jq_all, eye[1])
        a_z = quat_rotate(jq_all, eye[2])
        joint_axes = jnp.stack([a_x, a_y, a_z], axis=1).reshape(-1, 3)
    else:
        # per-dof world axes, vectorized over all joints:
        # a_z in the parent frame, a_y after q_z, a_x after q_z⊗q_y
        parents = jnp.asarray(topo.parents[1:])
        qp_all = xquat[parents]                       # (nb-1, 4)
        a_z = quat_rotate(qp_all, eye[2])
        a_y = quat_rotate(quat_mul(qp_all, q_z), eye[1])
        a_x = quat_rotate(quat_mul(qp_all, q_zy), eye[0])
        joint_axes = jnp.stack([a_z, a_y, a_x], axis=1).reshape(-1, 3)
    R0 = quat_to_mat(root_q)
    axes = jnp.concatenate([eye, R0.T, joint_axes], axis=0)  # (nv, 3)
    anchors = xpos[topo.dof_body()]  # (nv, 3)
    return dict(xpos=xpos, xquat=xquat, xipos=xipos, axes=axes, anchors=anchors)


def velocities(topo: Topology, kin, qvel):
    """Propagate body angular/linear velocities and bias (q̈=0) accelerations,
    level-vectorized over the tree.

    Exact treatment of the sequential z-y-x hinges: each axis is fixed in the
    frame accumulated so far, so its derivative is ω_sofar × axis.
    Returns omega (nb,3), v (nb,3 body-origin velocity), alpha_bias (nb,3),
    a_bias (nb,3 body-origin bias accel), acom_bias (nb,3).
    """
    nb = topo.nbody
    xpos, xipos, axes = kin["xpos"], kin["xipos"], kin["axes"]
    dtype = qvel.dtype

    jaxes = axes[6:].reshape(nb - 1, 3, 3)          # per joint: 3 dof axes
    jdq = qvel[6:].reshape(nb - 1, 3)
    ball = topo.joint_kind == "ball"
    if ball:
        # world joint angular velocity: Σ_k a_k ω_k (axes = child frame cols)
        jw = jnp.einsum("jkc,jk->jc", jaxes, jdq)

    omega = jnp.zeros((nb, 3), dtype).at[0].set(
        axes[3] * qvel[3] + axes[4] * qvel[4] + axes[5] * qvel[5])
    v = jnp.zeros((nb, 3), dtype).at[0].set(qvel[0:3])
    alpha = jnp.zeros((nb, 3), dtype)
    a = jnp.zeros((nb, 3), dtype)

    for idx, par in topo.levels():
        w0 = omega[par]
        if ball:
            # S rotates with the child frame: S˚q̇ = ω_parent × (S q̇)
            wj = jw[idx - 1]
            wi = w0 + wj
            al = alpha[par] + jnp.cross(w0, wj)
        else:
            az, ay, ax = (jaxes[idx - 1, 0], jaxes[idx - 1, 1],
                          jaxes[idx - 1, 2])
            dz = jdq[idx - 1, 0:1]
            dy = jdq[idx - 1, 1:2]
            dx = jdq[idx - 1, 2:3]
            w1 = w0 + az * dz
            w2 = w1 + ay * dy
            wi = w2 + ax * dx
            al = (alpha[par] + jnp.cross(w0, az) * dz + jnp.cross(w1, ay) * dy
                  + jnp.cross(w2, ax) * dx)
        d = xpos[idx] - xpos[par]
        vi = v[par] + jnp.cross(w0, d)
        ai = (a[par] + jnp.cross(alpha[par], d)
              + jnp.cross(w0, jnp.cross(w0, d)))
        omega = omega.at[idx].set(wi)
        alpha = alpha.at[idx].set(al)
        v = v.at[idx].set(vi)
        a = a.at[idx].set(ai)

    r = xipos - xpos
    acom = a + jnp.cross(alpha, r) + jnp.cross(omega, jnp.cross(omega, r))
    return dict(omega=omega, vel=v, alpha_bias=alpha, a_bias=a, acom_bias=acom)


# ---------------------------------------------------------------------------
# Dynamics quantities
# ---------------------------------------------------------------------------


def jacobians(topo: Topology, kin):
    """Dense COM Jacobians. Returns Jlin, Jang with shape (nb, 3, nv).

    Built component-wise so every materialized intermediate is
    (nb, nv)-shaped — trailing dim nv, not 3. TPU tiles the two minor
    dims to (8, 128); a trailing dim of 3 wastes ~97% of the HBM
    bandwidth these (B·nb·nv)-sized tensors consume, and this chain is
    the measured throughput wall of `assemble` (r2 profile)."""
    mask = jnp.asarray(topo.ancestor_mask(), kin["axes"].dtype)  # (nb, nv)
    axes, anchors, xipos = kin["axes"], kin["anchors"], kin["xipos"]
    nv = axes.shape[0]
    is_lin = jnp.zeros((nv,), axes.dtype).at[0:3].set(1.0)

    ax, ay, az = axes[:, 0], axes[:, 1], axes[:, 2]            # (nv,)
    # r = c_i − p_j, per component: (nb, nv)
    rx = xipos[:, 0:1] - anchors[None, :, 0]
    ry = xipos[:, 1:2] - anchors[None, :, 1]
    rz = xipos[:, 2:3] - anchors[None, :, 2]
    # rotational columns a_j × r, per component
    rcx = ay[None, :] * rz - az[None, :] * ry
    rcy = az[None, :] * rx - ax[None, :] * rz
    rcz = ax[None, :] * ry - ay[None, :] * rx
    lin = is_lin[None, :]
    Jlin = jnp.stack([
        mask * (lin * ax[None, :] + (1.0 - lin) * rcx),
        mask * (lin * ay[None, :] + (1.0 - lin) * rcy),
        mask * (lin * az[None, :] + (1.0 - lin) * rcz),
    ], axis=1)                                                  # (nb, 3, nv)
    rot = mask * (1.0 - lin)
    Jang = jnp.stack([rot * ax[None, :], rot * ay[None, :],
                      rot * az[None, :]], axis=1)
    return Jlin, Jang


def world_inertia_factors(model: Model, xquat):
    """Principal world rotation R·R_iquat (nb,3,3) and √diag inertia (nb,3)."""
    Rtot = quat_to_mat(quat_mul(xquat, model.body_iquat))
    sq = jnp.sqrt(model.body_inertia)
    return Rtot, sq


def mass_matrix(model: Model, Jlin, Jang, Rtot, sqI):
    """Composite-rigid-body mass matrix via one stacked Gram matmul:
    M = Gᵀ G + diag(armature), G = [√mᵢ·Jlinᵢ ; √Iᵢ·Rᵢᵀ·Jangᵢ]ᵢ.
    Equals MuJoCo's mj_fullM output (humanoid_im.py:1019)."""
    nb, _, nv = Jlin.shape
    Glin = jnp.sqrt(model.body_mass)[:, None, None] * Jlin
    Gang = sqI[:, :, None] * jnp.einsum("nab,naj->nbj", Rtot, Jang,
                                        precision=HI)
    G = jnp.concatenate([Glin, Gang], axis=1).reshape(nb * 6, nv)
    M = jnp.matmul(G.T, G, precision=HI)
    return M + jnp.diag(model.armature)


def bias_force(model: Model, vel, Jlin, Jang, Rtot):
    """qfrc_bias (Coriolis + centrifugal + gravity), same sign convention as
    mujoco_py data.qfrc_bias (humanoid_im.py:1022): M q̈ + C = qfrc_applied."""
    Iw = jnp.einsum("nab,nb,ncb->nac", Rtot, model.body_inertia, Rtot,
                    precision=HI)
    f = model.body_mass[:, None] * (vel["acom_bias"] - model.gravity)
    t = (jnp.einsum("nab,nb->na", Iw, vel["alpha_bias"], precision=HI)
         + jnp.cross(vel["omega"], jnp.einsum("nab,nb->na", Iw, vel["omega"],
                                              precision=HI)))
    return (jnp.einsum("naj,na->j", Jlin, f, precision=HI)
            + jnp.einsum("naj,na->j", Jang, t, precision=HI))


# ---------------------------------------------------------------------------
# Contacts (ground plane z=0) and joint limits
# ---------------------------------------------------------------------------


def contact_terms(topo: Topology, model: Model, kin, vel):
    """Ground contacts at precomputed hull points: explicit normal springs +
    IMPLICIT damping/friction.

    Explicit spring-dampers are unstable at 450 Hz for light end bodies
    (toes): any per-point damping stiff enough to stop sliding exceeds the
    explicit stability bound c·dt/m_eff < 2. Instead the normal damping and
    (clamped-coefficient viscous Coulomb) friction enter the forward
    dynamics as a velocity-implicit term: per-point 3×3 damping matrices are
    lumped into per-body 6×6 contact-damping wrenches W_b, and the solve
    becomes (M + dt·Σ J6ᵀ W J6) q̈ = rhs — unconditionally stable for any
    damping magnitude, and W projects through the same Gram-matmul pattern
    as the mass matrix (MXU-friendly, contact-count independent).

    The spring force is depth-capped so deep initial interpenetration gives a
    bounded restoring force (MuJoCo bounds constraint forces via solimp;
    humanoid_im.py scenes regularly start slightly penetrated).

    Returns (F (nb,3) spring forces, T (nb,3) spring torques about body COMs,
    W (nb,6,6) implicit damping wrenches), all in world frame.
    """
    cp, cmask = model.contact_point, model.contact_mask   # (nb,K,3), (nb,K)
    xpos, xquat, xipos = kin["xpos"], kin["xquat"], kin["xipos"]
    dtype = xpos.dtype

    # All (nb, K)-shaped component arrays — no trailing-3 tensors (a
    # trailing dim of 3 wastes ~97% of HBM bandwidth under (8,128) tiling).
    cpx, cpy, cpz = cp[..., 0], cp[..., 1], cp[..., 2]
    qw, qx = xquat[:, 0:1], xquat[:, 1:2]
    qy, qz = xquat[:, 2:3], xquat[:, 3:4]
    # quat_rotate component form: t = 2 q_v × v; out = v + q_w t + q_v × t
    tx = 2.0 * (qy * cpz - qz * cpy)
    ty = 2.0 * (qz * cpx - qx * cpz)
    tz = 2.0 * (qx * cpy - qy * cpx)
    dx = cpx + qw * tx + (qy * tz - qz * ty)              # wp − xpos
    dy = cpy + qw * ty + (qz * tx - qx * tz)
    dz = cpz + qw * tz + (qx * ty - qy * tx)
    wpz = xpos[:, 2:3] + dz
    ox, oy, oz = (vel["omega"][:, 0:1], vel["omega"][:, 1:2],
                  vel["omega"][:, 2:3])
    vpx = vel["vel"][:, 0:1] + (oy * dz - oz * dy)
    vpy = vel["vel"][:, 1:2] + (oz * dx - ox * dz)

    active = (wpz < 0.0).astype(dtype) * cmask
    pen = jnp.clip(-wpz, 0.0, model.contact_depth_cap)
    fn = model.contact_stiffness * pen * active           # (nb,K)

    # implicit damping coefficients per point: normal damping, and viscous
    # friction whose coefficient saturates the tangential force near μ·fn
    # once |v_t| reaches contact_vreg (approximate cone), capped to keep
    # cond(M + dt·J6ᵀWJ6) within f32 Cholesky range
    vt_norm = jnp.sqrt(vpx**2 + vpy**2 + 1e-12)
    b = model.contact_damping * active                    # normal coeff
    a = active * jnp.minimum(
        model.friction * fn / jnp.maximum(vt_norm, model.contact_vreg),
        2000.0)                                           # tangential coeff

    # spring wrench about the COM: force is fn·ẑ at point wp, so
    # F = (0,0,Σfn), T = Σ fn·(r × ẑ) = (Σ fn·ry, -Σ fn·rx, 0)
    # r = wp − xipos, per component
    rx = xpos[:, 0:1] + dx - xipos[:, 0:1]
    ry = xpos[:, 1:2] + dy - xipos[:, 1:2]
    rz = wpz - xipos[:, 2:3]
    zsum = jnp.zeros((topo.nbody,), dtype)
    F = jnp.stack([zsum, zsum, jnp.sum(fn, -1)], axis=-1)
    T = jnp.stack([jnp.sum(fn * ry, -1), -jnp.sum(fn * rx, -1), zsum], -1)

    # per-body 6x6 damping wrench W_b = Σ_pt S_ptᵀ D S_pt, assembled in
    # closed form from masked reductions (S = [I | -skew(r)], D=diag(a,a,b)):
    # no per-point 6x6 tensors, no scatter.
    sa = jnp.sum(a, -1)
    sb = jnp.sum(b, -1)
    sarx, sary, sarz = (jnp.sum(a * rx, -1), jnp.sum(a * ry, -1),
                        jnp.sum(a * rz, -1))
    sbrx, sbry = jnp.sum(b * rx, -1), jnp.sum(b * ry, -1)
    z = jnp.zeros_like(sa)
    Wll = jnp.stack([
        jnp.stack([sa, z, z], -1),
        jnp.stack([z, sa, z], -1),
        jnp.stack([z, z, sb], -1)], -2)
    # D·(-skew r) summed: rows scale by (a, a, b)
    Wla = jnp.stack([
        jnp.stack([z, sarz, -sary], -1),
        jnp.stack([-sarz, z, sarx], -1),
        jnp.stack([sbry, -sbrx, z], -1)], -2)
    # Waa = Nᵀ D N with N = -skew(r): symmetric 3x3 assembled from masked
    # point reductions:
    #   [ a·rz² + b·ry²,  -b·rx·ry,        -a·rx·rz       ]
    #   [ -b·rx·ry,       a·rz² + b·rx²,   -a·ry·rz       ]
    #   [ -a·rx·rz,       -a·ry·rz,        a·(rx² + ry²)  ]
    arz2 = jnp.sum(a * rz * rz, -1)
    arx2 = jnp.sum(a * rx * rx, -1)
    ary2 = jnp.sum(a * ry * ry, -1)
    arxz = jnp.sum(a * rx * rz, -1)
    aryz = jnp.sum(a * ry * rz, -1)
    brx2 = jnp.sum(b * rx * rx, -1)
    bry2 = jnp.sum(b * ry * ry, -1)
    brxy = jnp.sum(b * rx * ry, -1)
    Waa = jnp.stack([
        jnp.stack([arz2 + bry2, -brxy, -arxz], -1),
        jnp.stack([-brxy, arz2 + brx2, -aryz], -1),
        jnp.stack([-arxz, -aryz, arx2 + ary2], -1)], -2)
    top = jnp.concatenate([Wll, Wla], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(Wla, -1, -2), Waa], axis=-1)
    W = jnp.concatenate([top, bot], axis=-2)              # (nb, 6, 6)
    return F, T, W


def contact_qfrc(topo, model, kin, vel, Jlin, Jang):
    """Spring-only generalized contact force (implicit part handled in
    `substep` via the damping wrench W)."""
    F, T, W = contact_terms(topo, model, kin, vel)
    q = (jnp.einsum("naj,na->j", Jlin, F, precision=HI)
         + jnp.einsum("naj,na->j", Jang, T, precision=HI))
    return q, W


def self_collision_terms(topo: Topology, model: Model, kin, vel,
                         k: float = 3000.0, d: float = 50.0):
    """Body-body contacts over the curated pair set
    (smpl.constants.self_collision_pairs): each body is a chain of SC
    spheres (model.sc_point/sc_radius); penetrating sphere pairs get a
    penalty normal force with clamped explicit damping (d·dt/m stays well
    under the 450 Hz stability bound for limb masses).

    Returns (F (nb,3), T (nb,3)) world-frame force/torque-about-COM sums —
    added to the ground-contact wrench before the Jacobian projection.
    MuJoCo reference behavior: geoms share one contype/conaffinity group and
    collide unless excluded (smpl_parser.py:315-329)."""
    from uhc_tpu.smpl.constants import self_collision_pairs

    pairs = self_collision_pairs(topo)
    nb = topo.nbody
    if len(pairs) == 0:
        z = jnp.zeros((nb, 3), kin["xpos"].dtype)
        return z, z
    pi, pj = pairs[:, 0], pairs[:, 1]              # static (P,)
    P = len(pi)
    xpos, xquat, xipos = kin["xpos"], kin["xquat"], kin["xipos"]

    def world_spheres(idx):
        cp = model.sc_point[idx]                   # (P, SC, 3)
        return xpos[idx][:, None] + quat_rotate(xquat[idx][:, None], cp)

    wi = world_spheres(pi)                         # (P, SC, 3)
    wj = world_spheres(pj)
    ri = model.sc_radius[pi][:, None, None]
    rj = model.sc_radius[pj][:, None, None]
    diff = wi[:, :, None, :] - wj[:, None, :, :]   # (P, SC, SC, 3)
    dist = jnp.sqrt(jnp.sum(diff**2, -1) + 1e-12)  # (P, SC, SC)
    depth = (ri + rj[:, :, 0][:, None]) - dist
    act = (depth > 0.0).astype(dist.dtype)
    n = diff / dist[..., None]
    # contact-point velocity difference projected on the normal
    vel_i = (vel["vel"][pi][:, None] + jnp.cross(
        vel["omega"][pi][:, None], wi - xpos[pi][:, None]))
    vel_j = (vel["vel"][pj][:, None] + jnp.cross(
        vel["omega"][pj][:, None], wj - xpos[pj][:, None]))
    vrel = vel_i[:, :, None, :] - vel_j[:, None, :, :]
    vn = jnp.sum(vrel * n, -1)
    fn = jnp.maximum(k * depth - d * vn, 0.0) * act      # (P, SC, SC)
    Fp = fn[..., None] * n                               # on body i; -F on j
    pt = 0.5 * (wi[:, :, None, :] + wj[:, None, :, :])

    Fi = jnp.sum(Fp, axis=(1, 2))                        # (P, 3)
    Ti = jnp.sum(jnp.cross(pt - xipos[pi][:, None, None], Fp), axis=(1, 2))
    Tj = jnp.sum(jnp.cross(pt - xipos[pj][:, None, None], -Fp), axis=(1, 2))

    # scatter per-pair wrenches to bodies with static one-hot matmuls
    Oi = jnp.asarray(np.eye(nb, dtype=np.float32)[pi])   # (P, nb)
    Oj = jnp.asarray(np.eye(nb, dtype=np.float32)[pj])
    F = Oi.T @ Fi - Oj.T @ Fi
    T = Oi.T @ Ti + Oj.T @ Tj
    return F, T


def limit_qfrc(model: Model, qpos, qvel, k: float = 500.0, d: float = 20.0):
    """Joint-range penalty (MuJoCo limited=true hinge ranges).

    Returns (spring force (nv,), implicit per-dof damping diag (nv,)) — the
    damping joins the velocity-implicit system matrix so stiff limits stay
    stable on armature-only dofs.

    Ball-joint topologies carry no joint ranges (SkeletonMeshV2 writes
    unlimited ball joints) -> zero forces."""
    nv = qvel.shape[0]
    if qpos.shape[0] != nv + 1:                    # ball joints: no limits
        z = jnp.zeros(nv, qpos.dtype)
        return z, z
    q = qpos[7:]
    lo, hi = model.jnt_range[:, 0], model.jnt_range[:, 1]
    below = jnp.maximum(lo - q, 0.0)
    above = jnp.maximum(q - hi, 0.0)
    out = ((below > 0) | (above > 0)).astype(qpos.dtype)
    tau = k * (below - above)
    zeros6 = jnp.zeros(6, qpos.dtype)
    return (jnp.concatenate([zeros6, tau]),
            jnp.concatenate([zeros6, out * d]))


# ---------------------------------------------------------------------------
# Stable PD (humanoid_im.py:1014-1076)
# ---------------------------------------------------------------------------


def stable_pd_errors(model: Model, qpos, qvel, target_pos, kp, kd, C):
    """Stable-PD quantities (humanoid_im.py:1014-1076): returns
    (rhs of the q̈_des system, qpos_err, kd_full). The solve itself is
    batched together with the forward-dynamics solve in `substep`."""
    dt = model.dt
    kp_full = jnp.concatenate([jnp.zeros(6, qpos.dtype), kp])
    kd_full = jnp.concatenate([jnp.zeros(6, qpos.dtype), kd])
    qpos_err = jnp.concatenate(
        [jnp.zeros(6, qpos.dtype), qpos[7:] + qvel[6:] * dt - target_pos])
    rhs = -C - kp_full * qpos_err - kd_full * qvel
    return rhs, qpos_err, kd_full


# ---------------------------------------------------------------------------
# Integration + full substep
# ---------------------------------------------------------------------------


def integrate(model: Model, qpos, qvel, qacc):
    """Semi-implicit Euler with quaternion root integration (MuJoCo default).

    Ball-joint topologies (nq = 7 + 4·nj, inferred from the static shapes)
    integrate every joint quaternion like the root: q ⊗ exp(ω_local·dt)."""
    dt = model.dt
    qvel_new = qvel + dt * qacc
    root_pos = qpos[0:3] + dt * qvel_new[0:3]
    root_quat = quat_integrate(qpos[3:7], qvel_new[3:6], dt)
    nj = (qvel.shape[0] - 6) // 3
    if qpos.shape[0] == 7 + 4 * nj and nj > 0:     # ball joints
        jq = qpos[7:].reshape(nj, 4)
        w = qvel_new[6:].reshape(nj, 3)
        joints = quat_integrate(jq, w, dt).reshape(-1)
    else:
        joints = qpos[7:] + dt * qvel_new[6:]
    return jnp.concatenate([root_pos, root_quat, joints]), qvel_new


def project_vf_cp(model: Model, cp):
    """Clamp explicit-RFC contact points (nb,3 body frame) into each body's
    hull AABB — the TPU-native stand-in for the reference's hull projection
    (smpl_robot.py:1262 project_to_body: inside-hull points pass through;
    outside points snap to the hull). The AABB contains the hull, so interior
    points are untouched and the residual-force lever arm stays bounded by
    the body extent."""
    pts, m = model.contact_point, model.contact_mask[..., None]
    big = jnp.asarray(1e9, pts.dtype)
    lo = jnp.min(jnp.where(m > 0, pts, big), axis=-2)
    hi = jnp.max(jnp.where(m > 0, pts, -big), axis=-2)
    return jnp.clip(cp, lo, hi)


def prep_explicit_vf(model: Model, cfg, vf_flat, nbody: int):
    """Explicit-RFC action prep shared by the XLA solver, the host
    env_step, and the lane-kernel wrapper: reshape the raw action segment
    to (nbody, num_each, bvd), hull-project each slot's contact point,
    scale force/torque by residual_force_scale ALONE (the reference's
    rfc_explicit, humanoid_im.py:1110 — rfc_rate applies only to
    rfc_implicit :1137), and return one (nbody, 9) [cp|f|τ] wrench per
    body.

    num_each > 1: the reference applies each slot at its OWN contact
    point (mj_applyFT per idx, :1106-1131). Because rotation preserves
    cross products, that equals one summed wrench with the slot
    cross-terms folded into the body-frame torque:
    τ_eff = Σ_idx (t_idx + cp_idx × f_idx), applied at cp = 0."""
    import jax

    bvd = vf_flat.shape[0] // (nbody * cfg.residual_force_bodies_num)
    v = vf_flat.reshape(nbody, -1, bvd)
    scale = cfg.residual_force_scale
    if v.shape[1] > 1:
        cp = v[:, :, 0:3]
        if cfg.residual_contact_projection:
            cp = jax.vmap(lambda c: project_vf_cp(model, c),
                          in_axes=1, out_axes=1)(cp)
        f = v[:, :, 3:6] * scale
        t = (v[:, :, 6:9] * scale if cfg.residual_force_torque
             else jnp.zeros_like(f))
        f_sum = jnp.sum(f, axis=1)
        t_eff = jnp.sum(t + jnp.cross(cp, f), axis=1)
        return jnp.concatenate(
            [jnp.zeros_like(f_sum), f_sum, t_eff], axis=1)
    v1 = v[:, 0]
    cp = v1[:, 0:3]
    if cfg.residual_contact_projection:
        cp = project_vf_cp(model, cp)
    f = v1[:, 3:6] * scale
    t = (v1[:, 6:9] * scale if cfg.residual_force_torque
         else jnp.zeros_like(f))
    return jnp.concatenate([cp, f, t], axis=1)


def vf_contact_gate(model: Model, kin, mode: str):
    """Per-body 0/1 gate for explicit RFC (humanoid_im.py:1089-1105
    rfc_explicit): 'height' = body origin z <= 0.12 (the reference default
    when residual_contact_only_ground is false), 'ground' = the body has an
    actual active ground contact."""
    if mode == "height":
        return (kin["xpos"][:, 2] <= 0.12).astype(kin["xpos"].dtype)
    wp = kin["xpos"][:, None] + quat_rotate(kin["xquat"][:, None],
                                            model.contact_point)
    touch = (wp[..., 2] < 0.0).astype(wp.dtype) * model.contact_mask
    return jnp.max(touch, axis=-1)


def assemble(topo: Topology, model: Model, qpos, qvel, target_pos, kp, kd,
             qfrc_applied, vf_body=None, vf_gate=None,
             self_collision: bool = False, obj=None):
    """Phase 1 of a substep: everything except the linear solves.

    Returns a dict with the two SPD system matrices (A_pd for stable-PD,
    A_fd for forward dynamics), the PD right-hand side, and the force terms
    needed to build the FD right-hand side once the PD torque is known.
    Split out so batch-level solvers (Newton-maintained inverses,
    uhc_tpu.physics.solver) can own the solves."""
    kin = fk(topo, model, qpos)
    vel = velocities(topo, kin, qvel)
    Jlin, Jang = jacobians(topo, kin)
    Rtot, sqI = world_inertia_factors(model, kin["xquat"])
    M = mass_matrix(model, Jlin, Jang, Rtot, sqI)
    C = bias_force(model, vel, Jlin, Jang, Rtot)

    qfrc_con, W = contact_qfrc(topo, model, kin, vel, Jlin, Jang)
    if self_collision:
        Fsc, Tsc = self_collision_terms(topo, model, kin, vel)
        qfrc_con = qfrc_con + (
            jnp.einsum("naj,na->j", Jlin, Fsc, precision=HI)
            + jnp.einsum("naj,na->j", Jang, Tsc, precision=HI))
    obj_wrench = None
    if obj is not None:
        # dynamic scene objects (humanoid_im.py:1284-1287): humanoid SC
        # spheres vs object primitives; humanoid side joins the contact
        # wrench here, object side returns for obj_substep integration
        from uhc_tpu.physics import objects as OBJ

        om, obj_qpos, obj_qvel = obj
        Fob, Tob, F_obj, T_obj = OBJ.humanoid_obj_contacts(
            topo, model, kin, vel, om, obj_qpos[:, :3], obj_qpos[:, 3:7],
            obj_qvel[:, :3], obj_qvel[:, 3:6])
        qfrc_con = qfrc_con + (
            jnp.einsum("naj,na->j", Jlin, Fob, precision=HI)
            + jnp.einsum("naj,na->j", Jang, Tob, precision=HI))
        obj_wrench = (F_obj, T_obj)
    qfrc_lim, lim_damp = limit_qfrc(model, qpos, qvel)

    nv = topo.nv
    J6 = jnp.concatenate([Jlin, Jang], axis=1)
    K = jnp.einsum("nab,nbj->naj", W, J6, precision=HI)
    CD = jnp.matmul(J6.reshape(-1, nv).T, K.reshape(-1, nv), precision=HI)
    v6 = jnp.concatenate([
        vel["vel"] + jnp.cross(vel["omega"], kin["xipos"] - kin["xpos"]),
        vel["omega"]], axis=1)
    qfrc_damp = (-jnp.matmul(K.reshape(-1, nv).T, v6.reshape(-1),
                             precision=HI) - lim_damp * qvel)

    if topo.joint_kind == "ball":
        # ball family drives joints with direct torques (action_type
        # "torque", humanoid_im.py:1158) — no stable-PD system
        nv_ = topo.nv
        pd_rhs = jnp.zeros(nv_, qpos.dtype)
        qpos_err = jnp.zeros(nv_, qpos.dtype)
        A_pd = M
    else:
        pd_rhs, qpos_err, kd_full = stable_pd_errors(
            model, qpos, qvel, target_pos, kp, kd, C)
        A_pd = M + jnp.diag(kd_full) * model.dt
    A_fd = M + model.dt * (CD + jnp.diag(lim_damp))

    rhs_base = qfrc_applied + qfrc_con + qfrc_lim + qfrc_damp - C
    if vf_body is not None:
        cp_w = quat_rotate(kin["xquat"], vf_body[:, 0:3])
        f_w = quat_rotate(kin["xquat"], vf_body[:, 3:6])
        t_w = quat_rotate(kin["xquat"], vf_body[:, 6:9])
        if vf_gate is not None:
            gate = vf_contact_gate(model, kin, vf_gate)[:, None]
            f_w = f_w * gate
            t_w = t_w * gate
        p_w = kin["xpos"] + cp_w
        T = jnp.cross(p_w - kin["xipos"], f_w) + t_w
        rhs_base = rhs_base + (jnp.einsum("naj,na->j", Jlin, f_w, precision=HI)
                               + jnp.einsum("naj,na->j", Jang, T, precision=HI))
    return dict(A_pd=A_pd, A_fd=A_fd, pd_rhs=pd_rhs, qpos_err=qpos_err,
                rhs_base=rhs_base, obj_wrench=obj_wrench)


def substep_torque(topo: Topology, model: Model, qpos, qvel, tau,
                   qfrc_applied, vf_body=None, vf_gate=None,
                   self_collision: bool = False):
    """One 450 Hz substep with direct joint torques (action_type "torque",
    humanoid_im.py:1158: τ = ctrl·a_scale·100, no stable-PD) — the control
    mode of the ball-joint family (config/copycat_ball). One SPD solve."""
    from uhc_tpu.physics import linalg as LA

    out = assemble(topo, model, qpos, qvel, jnp.zeros(topo.ndof, qpos.dtype),
                   model.jkp, model.jkd, qfrc_applied, vf_body, vf_gate,
                   self_collision)
    rhs = out["rhs_base"] + jnp.concatenate([jnp.zeros(6, qpos.dtype), tau])
    LL = LA.blocked_cholesky(out["A_fd"])
    qacc = LA.blocked_cho_solve(LL, rhs)
    qpos_n, qvel_n = integrate(model, qpos, qvel, qacc)
    return qpos_n, qvel_n, tau


def pd_torque_from_accel(model: Model, qvel, qpos_err, kp, kd, qacc_des):
    """τ = -Kp e - Kd(ė + q̈_des·dt), clipped (humanoid_im.py:1075)."""
    tau = -kp * qpos_err[6:] - kd * (qvel[6:] + qacc_des[6:] * model.dt)
    return jnp.clip(tau, -model.torque_lim, model.torque_lim)


def substep(topo: Topology, model: Model, qpos, qvel, target_pos, kp, kd,
            qfrc_applied, vf_body=None, vf_gate=None,
            self_collision: bool = False, obj=None):
    """One 450 Hz physics substep with stable-PD actuation.

    `qfrc_applied` is the residual-force wrench already mapped to generalized
    coordinates (rfc_implicit writes the first 6 entries, humanoid_im.py:1143).
    Returns (qpos', qvel', torque).

    The stable-PD q̈_des system (M + Kd·dt) and the forward-dynamics system
    (M + dt·(contact damping + limit damping)) are factored as ONE stacked
    blocked-Cholesky batch — two 75×75 SPD factorizations per substep, done
    in 16×16 panels on the MXU (uhc_tpu.physics.linalg). This is the exact
    reference path; `uhc_tpu.physics.solver` provides the fast batched path
    that amortizes factorizations across substeps.
    """
    from uhc_tpu.physics import linalg as LA

    out = assemble(topo, model, qpos, qvel, target_pos, kp, kd,
                   qfrc_applied, vf_body, vf_gate, self_collision, obj)
    LL = LA.blocked_cholesky(jnp.stack([out["A_pd"], out["A_fd"]]))
    qacc_des = LA.blocked_cho_solve(
        jax.tree.map(lambda x: x[0], LL), out["pd_rhs"])
    tau = pd_torque_from_accel(model, qvel, out["qpos_err"], kp, kd, qacc_des)
    rhs = out["rhs_base"] + jnp.concatenate([jnp.zeros(6, qpos.dtype), tau])
    qacc = LA.blocked_cho_solve(jax.tree.map(lambda x: x[1], LL), rhs)
    qpos_n, qvel_n = integrate(model, qpos, qvel, qacc)
    if obj is not None:
        from uhc_tpu.physics import objects as OBJ

        om, obj_qpos, obj_qvel = obj
        F_obj, T_obj = out["obj_wrench"]
        obj_qpos_n, obj_qvel_n = OBJ.obj_substep(model, om, obj_qpos,
                                                 obj_qvel, F_obj, T_obj)
        return qpos_n, qvel_n, tau, (obj_qpos_n, obj_qvel_n)
    return qpos_n, qvel_n, tau
