"""Dynamic scene objects — free rigid bodies coupled to the humanoid.

The reference embeds scene-object geoms in the robot XML and gives each
object a free joint in the MuJoCo sim (uhc/envs/humanoid_im.py:159-175
objs_info -> robot XML; :1284-1287 obj qpos+qvel appended to the sim state;
uhc/envs/humanoid_kin_v1.py:477 get_obj_qpos). MuJoCo then handles
humanoid<->object and object<->ground contacts inside mj_step.

TPU-native design: objects do NOT join the humanoid's kinematic tree (that
would change nq/nv and retrigger Mosaic compiles of the fused kernels).
Each object is an independent 6-dof rigid body — box or sphere primitive —
integrated by its own closed-form free-body step, coupled to the humanoid
through penalty contacts:

* humanoid side: the per-body self-collision sphere chains
  (model.sc_point/sc_radius) test against each object primitive; the
  resulting world wrenches join the ground-contact wrench before the
  Jacobian projection in `engine.assemble` (exactly the self-collision
  pattern, engine.py self_collision_terms).
* object side: the equal-and-opposite wrench plus its own ground contact
  (box corners / sphere bottom) integrate in `obj_substep`.

Everything is branch-free and vmaps over envs; the number of objects is a
static shape. The explicit contact damping is stability-clamped per object
(c·dt/m < 1/2) so the 450 Hz step never blows up for light props.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from uhc_tpu.maths import quat_integrate, quat_rotate, quat_to_mat
from uhc_tpu.physics.model import Model, Topology

HI = jax.lax.Precision.HIGHEST

KIND_BOX = 0
KIND_SPHERE = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ObjModel:
    """Scene-object array data (a pytree; NO = number of objects)."""

    kind: Any          # (NO,) int32 — KIND_BOX | KIND_SPHERE
    half_extents: Any  # (NO, 3) box half sizes (box only)
    radius: Any        # (NO,) sphere radius (sphere only)
    mass: Any          # (NO,)
    inertia: Any       # (NO, 3) body-frame principal moments

    def nobj(self):
        return self.mass.shape[-1]


def make_obj_model(specs, dtype=jnp.float32) -> ObjModel:
    """Build an ObjModel from a list of dicts
    [{"kind": "box"|"sphere", "size": [hx,hy,hz] | r, "mass": m}, ...]
    (the array analogue of the reference's objs_info -> XML geoms)."""
    kinds, he, rad, mass, inertia = [], [], [], [], []
    for s in specs:
        m = float(s.get("mass", 1.0))
        if s.get("kind", "box") == "sphere":
            r = float(np.atleast_1d(s["size"])[0])
            kinds.append(KIND_SPHERE)
            he.append([r, r, r])
            rad.append(r)
            i = 0.4 * m * r * r
            inertia.append([i, i, i])
        else:
            h = np.asarray(s["size"], np.float64).reshape(3)
            kinds.append(KIND_BOX)
            he.append(list(h))
            rad.append(float(np.min(h)))
            fx, fy, fz = (2 * h) ** 2
            inertia.append([m / 12 * (fy + fz), m / 12 * (fx + fz),
                            m / 12 * (fx + fy)])
        mass.append(m)
    return ObjModel(
        kind=jnp.asarray(kinds, jnp.int32),
        half_extents=jnp.asarray(he, dtype),
        radius=jnp.asarray(rad, dtype),
        mass=jnp.asarray(mass, dtype),
        inertia=jnp.asarray(inertia, dtype))


# unit-cube corner signs, static
_CORNERS = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                     for sz in (-1, 1)], np.float32)  # (8, 3)


def obj_ground_terms(model: Model, om: ObjModel, pos, quat, linv, angv):
    """Ground-plane (z=0) contact terms per object.

    Boxes contact at their 8 corners, spheres at the bottom point (a sphere's
    'corners' all sit at the center so only the radius term penetrates).
    Same spring/damping/friction constants as the humanoid's ground model —
    and the same IMPLICIT treatment of damping/friction: explicit damping at
    4 simultaneous corners exceeds the 450 Hz stability bound
    (4·c·dt/m ≈ 2 for a 2 kg box) and pumps energy, so the per-point damping
    matrices lump into a 6×6 wrench W that joins the object's own implicit
    velocity solve in obj_substep (cf. engine.contact_terms).

    Returns (F (NO,3) spring forces, T (NO,3) spring torques about the
    object origin, W (NO,6,6) implicit damping wrench), world frame.
    """
    dtype = pos.dtype
    corners = jnp.asarray(_CORNERS, dtype)                    # (8, 3)
    is_box = (om.kind == KIND_BOX).astype(dtype)[:, None]     # (NO, 1)
    # contact candidates: box corners, or the sphere center (8x duplicated,
    # de-weighted to 1/8 so the sphere's single contact isn't counted 8x)
    local = corners[None] * om.half_extents[:, None, :] * is_box[..., None]
    wp = pos[:, None] + quat_rotate(quat[:, None], local)     # (NO, 8, 3)
    # spheres penetrate by radius below the center
    eff_z = wp[..., 2] - (1.0 - is_box) * om.radius[:, None]
    weight = is_box + (1.0 - is_box) / 8.0                    # (NO, 1)

    r = wp - pos[:, None]
    vp = linv[:, None] + jnp.cross(angv[:, None], r)          # (NO, 8, 3)
    active = (eff_z < 0.0).astype(dtype) * weight
    pen = jnp.clip(-eff_z, 0.0, model.contact_depth_cap)
    fn = model.contact_stiffness * pen * active               # (NO, 8)
    # implicit coefficients: normal damping b, viscous Coulomb friction a
    # saturating the tangential force near mu*fn once |vt| reaches vreg
    b = model.contact_damping * active
    vt = vp[..., :2]
    vt_norm = jnp.sqrt(jnp.sum(vt**2, -1) + 1e-12)
    a = active * jnp.minimum(
        model.friction * fn / jnp.maximum(vt_norm, model.contact_vreg),
        2000.0)

    Fp = jnp.concatenate([jnp.zeros_like(vt), fn[..., None]], -1)
    F = jnp.sum(Fp, axis=1)
    T = jnp.sum(jnp.cross(r, Fp), axis=1)

    # W = Σ_pt S_ptᵀ D S_pt, S = [I | -skew(r)], D = diag(a, a, b):
    # same closed form as engine.contact_terms, batched over objects
    rx, ry, rz = r[..., 0], r[..., 1], r[..., 2]
    sa, sb = jnp.sum(a, -1), jnp.sum(b, -1)
    sarx, sary, sarz = (jnp.sum(a * rx, -1), jnp.sum(a * ry, -1),
                        jnp.sum(a * rz, -1))
    sbrx, sbry = jnp.sum(b * rx, -1), jnp.sum(b * ry, -1)
    z = jnp.zeros_like(sa)
    Wll = jnp.stack([
        jnp.stack([sa, z, z], -1),
        jnp.stack([z, sa, z], -1),
        jnp.stack([z, z, sb], -1)], -2)
    Wla = jnp.stack([
        jnp.stack([z, sarz, -sary], -1),
        jnp.stack([-sarz, z, sarx], -1),
        jnp.stack([sbry, -sbrx, z], -1)], -2)
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
    W = jnp.concatenate([top, bot], axis=-2)                  # (NO, 6, 6)
    return F, T, W


def _obj_sdf(om: ObjModel, pos, quat, p):
    """Signed distance of world points p (NO, S, 3) to each object's
    surface, and the outward world-frame unit normal — defined for interior
    points too (branch-free box SDF: |max(q,0)| + min(max_i q_i, 0))."""
    R = quat_to_mat(quat)                                     # (NO, 3, 3)
    lp = jnp.einsum("nab,nsa->nsb", R, p - pos[:, None], precision=HI)
    # --- box SDF ---
    q = jnp.abs(lp) - om.half_extents[:, None]                # (NO, S, 3)
    qpos_part = jnp.maximum(q, 0.0)
    d_out = jnp.sqrt(jnp.sum(qpos_part**2, -1) + 1e-12)
    qmax = jnp.max(q, -1)
    sdf_box = d_out + jnp.minimum(qmax, 0.0)
    # normal: outside = (lp - clamp)/d_out; inside = one-hot of the nearest
    # face, signed by which side of the box center the point sits on
    n_out = jnp.sign(lp) * qpos_part / d_out[..., None]
    inside_axis = (q == qmax[..., None]).astype(p.dtype)
    n_in = jnp.sign(lp) * inside_axis
    n_in = n_in / jnp.sqrt(jnp.sum(n_in**2, -1, keepdims=True) + 1e-12)
    n_box = jnp.where((qmax > 0.0)[..., None], n_out, n_in)
    # --- sphere SDF ---
    ln = jnp.sqrt(jnp.sum(lp**2, -1) + 1e-12)
    sdf_sph = ln - om.radius[:, None]
    n_sph = lp / ln[..., None]
    is_box = (om.kind == KIND_BOX).astype(p.dtype)[:, None]
    sdf = is_box * sdf_box + (1.0 - is_box) * sdf_sph
    n_local = jnp.where(is_box[..., None] > 0, n_box, n_sph)
    n_world = jnp.einsum("nab,nsb->nsa", R, n_local, precision=HI)
    return sdf, n_world


def humanoid_obj_contacts(topo: Topology, model: Model, kin, vel,
                          om: ObjModel, obj_pos, obj_quat, obj_linv,
                          obj_angv, k: float = 6000.0, d: float = 60.0):
    """Humanoid SC spheres vs object primitives -> penalty wrenches.

    Returns (F_body (nb,3), T_body (nb,3) about body COMs,
             F_obj (NO,3), T_obj (NO,3) about object origins), world frame.
    """
    nb = topo.nbody
    xpos, xquat, xipos = kin["xpos"], kin["xquat"], kin["xipos"]
    dtype = xpos.dtype
    # all humanoid SC spheres flattened: (nb*SC, 3) world centers
    sc = model.sc_point                                       # (nb, SC, 3)
    SC = sc.shape[-2]
    wc = (xpos[:, None] + quat_rotate(xquat[:, None], sc)).reshape(-1, 3)
    rad = jnp.broadcast_to(model.sc_radius[:, None], (nb, SC)).reshape(-1)
    vc = (vel["vel"][:, None] + jnp.cross(
        vel["omega"][:, None],
        quat_rotate(xquat[:, None], sc))).reshape(-1, 3)

    NO = om.mass.shape[-1]
    p = jnp.broadcast_to(wc[None], (NO,) + wc.shape)          # (NO, S, 3)
    sdf, nvec = _obj_sdf(om, obj_pos, obj_quat, p)
    depth = rad[None] - sdf                                   # (NO, S)
    act = (depth > 0.0).astype(dtype)
    # contact point: the deepest point of the sphere along the normal
    pt = p - nvec * rad[None, :, None]
    r_obj = pt - obj_pos[:, None]
    v_obj = obj_linv[:, None] + jnp.cross(obj_angv[:, None], r_obj)
    vrel = vc[None] - v_obj
    vn = jnp.sum(vrel * nvec, -1)
    d_cl = jnp.minimum(d, 0.5 * jnp.minimum(
        om.mass[:, None], 1.0) / model.dt)                    # light-prop safe
    fn = jnp.maximum(k * depth - d_cl * vn, 0.0) * act        # (NO, S)
    # tangential viscous friction (same clamped-cone form as ground)
    vt = vrel - vn[..., None] * nvec
    vt_norm = jnp.sqrt(jnp.sum(vt**2, -1) + 1e-12)
    a = jnp.minimum(model.friction * fn / jnp.maximum(vt_norm,
                                                      model.contact_vreg),
                    d_cl)
    Fp = fn[..., None] * nvec - a[..., None] * vt             # on the sphere

    # humanoid side: sum over objects, reshape back to (nb, SC)
    F_sph = jnp.sum(Fp, axis=0).reshape(nb, SC, 3)
    T_sph = jnp.sum(jnp.cross(pt - wc[None], Fp), axis=0).reshape(nb, SC, 3)
    F_body = jnp.sum(F_sph, axis=1)
    wc_b = wc.reshape(nb, SC, 3)
    T_body = jnp.sum(T_sph + jnp.cross(wc_b - xipos[:, None], F_sph), axis=1)

    # object side: equal and opposite, torque about the object origin
    F_obj = -jnp.sum(Fp, axis=1)
    T_obj = -jnp.sum(jnp.cross(r_obj, Fp), axis=1)
    return F_body, T_body, F_obj, T_obj


def obj_substep(model: Model, om: ObjModel, obj_qpos, obj_qvel,
                F_ext, T_ext):
    """One 450 Hz free-body step for all objects.

    obj_qpos (NO,7) = [xyz, wxyz quat]; obj_qvel (NO,6) = [linv, world angv].
    F_ext/T_ext: coupling wrench from the humanoid (world, about origin).
    Semi-implicit Euler with gyroscopic torque and velocity-IMPLICIT ground
    damping: (A0 + dt·W) v' = A0 v + dt·(f_spring+ext − gyro), A0 =
    blockdiag(m·I, I_world) — a 6×6 solve per object, unconditionally
    stable for any damping magnitude. Matches MuJoCo's free-joint
    integration conventions (world linear, body-integrated quaternion).
    """
    pos, quat = obj_qpos[:, :3], obj_qpos[:, 3:7]
    linv, angv = obj_qvel[:, :3], obj_qvel[:, 3:6]
    Fg, Tg, W = obj_ground_terms(model, om, pos, quat, linv, angv)
    F = F_ext + Fg + om.mass[:, None] * model.gravity
    T = T_ext + Tg

    R = quat_to_mat(quat)
    Iw = jnp.einsum("nab,nb,ncb->nac", R, om.inertia, R, precision=HI)
    gyro = jnp.cross(angv, jnp.einsum("nab,nb->na", Iw, angv, precision=HI))

    dt = model.dt
    NO = om.mass.shape[-1]
    eye3 = jnp.eye(3, dtype=pos.dtype)
    A0 = jnp.zeros((NO, 6, 6), pos.dtype)
    A0 = A0.at[:, :3, :3].set(om.mass[:, None, None] * eye3)
    A0 = A0.at[:, 3:, 3:].set(Iw)
    rhs = (jnp.einsum("nab,nb->na", A0,
                      jnp.concatenate([linv, angv], -1), precision=HI)
           + dt * jnp.concatenate([F, T - gyro], -1))
    v_new = jnp.linalg.solve(A0 + dt * W, rhs[..., None])[..., 0]
    linv_n, angv_n = v_new[:, :3], v_new[:, 3:]
    pos_n = pos + dt * linv_n
    # quat_integrate expects local angular velocity; ours is world-frame
    w_local = jnp.einsum("nba,nb->na", R, angv_n, precision=HI)
    quat_n = quat_integrate(quat, w_local, dt)
    return (jnp.concatenate([pos_n, quat_n], -1),
            jnp.concatenate([linv_n, angv_n], -1))
