"""Fused 15-substep control-step kernel (Pallas TPU).

The XLA substep chain (engine.assemble + solver PCG) dispatches hundreds of
small kernels per 450 Hz substep and round-trips every Jacobian-sized
intermediate through HBM — measured at ~178 ms per control step at B=2048
(r2 profile). This kernel runs the ENTIRE 30 Hz control step — FK,
velocities, dense Jacobians, CRB mass matrix, bias force, ground contacts,
joint limits, stable-PD, implicit RFC, two SPD solves per substep and
semi-implicit integration, 15 substeps — inside ONE Pallas program per tile
of E envs. HBM sees the state in and the state out; everything else lives
in VMEM/registers.

Layout: the env tile E=8 sits in sublanes; per-body quantities are
component-form (E, nb) lane vectors; per-dof quantities are (E, NP) with
NP = nv padded to the 16-wide Cholesky blocking. Tree gathers are one-hot
matmuls (MXU), the mass matrix / contact-damping Gram products are batched
dots over a row-permuted stacked G (M = GᵀG is row-order invariant), and
the substep-0 exact inverses come from an in-kernel blocked Cholesky +
triangular inverse; substeps then solve by preconditioned CG exactly like
uhc_tpu.physics.solver.

Scope: implicit (or no) residual forces, shared (non per-env) model, plain
or meta-PD gains, with or without self-collision (the curated sphere-pair
contacts run in-kernel as lane-packed combo lanes) — the flagship
uhc_implicit family incl. the MuJoCo-matching self_collision default.
meta_pd_joint / explicit RFC / per-env shaped models fall back to the XLA
path. Model arrays are baked as compile-time constants at factory time.

Split mode (`split=True`): substep 0 (with the in-kernel blocked-Cholesky
exact inverses) runs as its own "head" program at env_tile, and substeps
1..14 run as a "tail" program free of the Cholesky code — the Mosaic
compile-time/VMEM driver — so the tail can use a larger tile
(`tail_tile`). Xp/Xf round-trip HBM once per control step (~100 MB/s-class
traffic, negligible).

Reference unit being accelerated: uhc/envs/humanoid_im.py:1145-1190
do_simulation (mj_step + stable-PD cho_solve at 450 Hz).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uhc_tpu.physics.model import Model, Topology

F32 = jnp.float32
BS = 16  # Cholesky block width


# ---------------------------------------------------------------------------
# component-form quaternion helpers (each component (E, nb) or (E, 1))
# ---------------------------------------------------------------------------


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def _qrot(q, v):
    """Rotate vector comps v=(x,y,z) by quat comps q: 15-mul form."""
    w, qx, qy, qz = q
    vx, vy, vz = v
    ux = qy * vz - qz * vy
    uy = qz * vx - qx * vz
    uz = qx * vy - qy * vx
    return (vx + 2.0 * (w * ux + qy * uz - qz * uy),
            vy + 2.0 * (w * uy + qz * ux - qx * uz),
            vz + 2.0 * (w * uz + qx * uy - qy * ux))


def _rcol_x(q):
    w, x, y, z = q
    return (1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y))


def _rcol_y(q):
    w, x, y, z = q
    return (2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x))


def _rcol_z(q):
    w, x, y, z = q
    return (2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y))


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _dotg(A, B, ta=False, tb=False):
    """Batched (E, m, k) x (E, k, n) matmul on MXU, f32 accumulate."""
    ca = 1 if ta else 2
    cb = 2 if tb else 1
    return jax.lax.dot_general(
        A, B, dimension_numbers=(((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=F32,
        precision=jax.lax.Precision.HIGHEST)


def _mv(A, x):
    """(E, n, n) @ (E, n) -> (E, n). Mosaic needs non-empty non-contracting
    dims on both operands, so the vector carries a unit column."""
    out = jax.lax.dot_general(
        A, jnp.expand_dims(x, -1),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=F32,
        precision=jax.lax.Precision.HIGHEST)
    return out.reshape(x.shape)


# Mosaic cannot lower scatter (int-indexed .at[].set) or the gathers that
# jnp emits for int indexing mixed with None/ellipsis — all row/column
# reads and writes below go through iota masks + reductions.
def _lane1():
    return jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)


def _row2():
    return jax.lax.broadcasted_iota(jnp.int32, (1, BS, BS), 1)


def _col2():
    return jax.lax.broadcasted_iota(jnp.int32, (1, BS, BS), 2)


def _row_sel(M, j):
    """(E, BS, BS) -> row j as (E, BS)."""
    return jnp.sum(jnp.where(_row2() == j, M, 0.0), axis=-2)


def _col_sel(M, j):
    """(E, BS, BS) -> column j as (E, BS)."""
    return jnp.sum(jnp.where(_col2() == j, M, 0.0), axis=-1)


def _lane_sel(v, j):
    """(E, BS) -> element j as (E, 1)."""
    return jnp.sum(jnp.where(_lane1() == j, v, 0.0), axis=-1, keepdims=True)


def _chol_block(D):
    """Unrolled Cholesky of (E, BS, BS) SPD blocks (linalg._chol_block)."""
    L = jnp.zeros_like(D)
    for j in range(BS):
        if j == 0:
            s = _col_sel(D, 0)
        else:
            rowj = jnp.expand_dims(_row_sel(L, j)[:, :j], -1)  # (E, j, 1)
            upd = jax.lax.dot_general(
                L[..., :, :j], rowj,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=F32,
                precision=jax.lax.Precision.HIGHEST)
            s = _col_sel(D, j) - upd.reshape(upd.shape[:-1])
        d = jnp.sqrt(jnp.maximum(_lane_sel(s, j), 1e-12))  # (E, 1)
        col = s / d
        rmask = (_lane1() >= j).astype(D.dtype)
        L = jnp.where(_col2() == j, jnp.expand_dims(col * rmask, -1), L)
    return L


def _tri_inv_lower(L):
    """Inverse of lower-triangular (E, BS, BS) blocks."""
    X = jnp.zeros_like(L)
    diag = jnp.sum(jnp.where(_row2() == _col2(), L, 0.0), axis=-1)     # (E, BS)
    inv_diag = 1.0 / diag
    for i in range(BS):
        if i == 0:
            row = jnp.zeros(L.shape[:-2] + (BS,), L.dtype)
        else:
            rowi = jnp.expand_dims(_row_sel(L, i)[:, :i], 1)  # (E, 1, i)
            row3 = jax.lax.dot_general(
                rowi, X[..., :i, :],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=F32,
                precision=jax.lax.Precision.HIGHEST)
            row = row3.reshape(row3.shape[0], row3.shape[2])
        e_i = (_lane1() == i).astype(L.dtype)
        new_row = (e_i - row) * _lane_sel(inv_diag, i)
        X = jnp.where(_row2() == i, jnp.expand_dims(new_row, -2), X)
    return X


def _chol_inverse(A, NP):
    """(E, NP, NP) SPD -> exact inverse via blocked Cholesky, all in VMEM.

    Mosaic lowers neither scatter nor dynamic_update_slice on values, so
    the factorization works on a python grid of (E, BS, BS) blocks (reads
    are plain slices, writes are list rebinds) and the result is assembled
    with concatenates."""
    nbk = NP // BS

    def blk(M, i, j):
        return M[:, i * BS:(i + 1) * BS, j * BS:(j + 1) * BS]

    S = [[blk(A, i, j) for j in range(nbk)] for i in range(nbk)]
    L = [[None] * nbk for _ in range(nbk)]
    Ld_inv = [None] * nbk
    for k in range(nbk):
        Lkk = _chol_block(S[k][k])
        Ld_inv[k] = _tri_inv_lower(Lkk)
        L[k][k] = Lkk
        for i in range(k + 1, nbk):
            L[i][k] = _dotg(S[i][k], Ld_inv[k], tb=True)
        for i in range(k + 1, nbk):
            for j in range(k + 1, i + 1):
                S[i][j] = S[i][j] - _dotg(L[i][k], L[j][k], tb=True)
    # blocked lower-triangular inverse
    Linv = [[None] * nbk for _ in range(nbk)]
    for i in range(nbk):
        Linv[i][i] = Ld_inv[i]
        for j in range(i - 1, -1, -1):
            acc = None
            for k in range(j, i):
                t = _dotg(L[i][k], Linv[k][j])
                acc = t if acc is None else acc + t
            Linv[i][j] = -_dotg(Ld_inv[i], acc)
    # X = Linv^T Linv blockwise: X[i][j] = sum_{k >= max(i,j)} Linv[k][i]^T Linv[k][j]
    rows = []
    for i in range(nbk):
        row = []
        for j in range(nbk):
            acc = None
            for k in range(max(i, j), nbk):
                t = _dotg(Linv[k][i], Linv[k][j], ta=True)
                acc = t if acc is None else acc + t
            row.append(acc)
        rows.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(rows, axis=1)


def _mv_pre(X, x):
    """Preconditioner matvec: X may be stored bf16 (PCG self-corrects any
    preconditioner error, so reduced precision here changes only the
    convergence constant, not the solution); accumulate f32."""
    out = jax.lax.dot_general(
        X, jnp.expand_dims(x.astype(X.dtype), -1),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=F32,
        precision=jax.lax.Precision.DEFAULT)
    return out.reshape(x.shape)


def _pcg(A, b, X, iters):
    """Preconditioned CG, warm start x0 = X b (solver.pcg_solve)."""
    x = _mv_pre(X, b)
    r = b - _mv(A, x)
    z = _mv_pre(X, r)
    p = z
    rz = jnp.sum(r * z, axis=-1, keepdims=True)
    for it in range(iters):
        Ap = _mv(A, p)
        alpha = rz / (jnp.sum(p * Ap, axis=-1, keepdims=True) + 1e-12)
        x = x + alpha * p
        if it + 1 == iters:
            break  # r/z/beta of the final iteration are dead work
        r = r - alpha * Ap
        z = _mv_pre(X, r)
        rz_new = jnp.sum(r * z, axis=-1, keepdims=True)
        beta = rz_new / (rz + 1e-12)
        p = z + beta * p
        rz = rz_new
    return x


# ---------------------------------------------------------------------------
# factory
# ---------------------------------------------------------------------------


def make_fused_do_simulation(topo: Topology, cfg, model: Model,
                             env_tile: int = 8, pcg_iters: int = 3,
                             interpret: bool = False,
                             vmem_limit_mb: int = 100,
                             split: bool = False, tail_tile: int = 16,
                             precond_bf16: bool = False):
    """Build the fused control-step function.

    Returns fn(qpos (B,nq), qvel (B,nv), actions (B,act), target_base
    (B,ndof), rfc_rate) -> (qpos', qvel'). The model is baked statically;
    rebuild the function if the model changes.

    Requirements: implicit (or no) residual force, meta_pd or plain PD
    (no meta_pd_joint), shared model. Callers must fall back to
    uhc_tpu.physics.solver otherwise.
    """
    if cfg.residual_force and cfg.residual_force_mode != "implicit":
        raise ValueError("fused path supports implicit RFC only")
    if cfg.meta_pd_joint:
        raise ValueError("fused path does not support meta_pd_joint")
    # self-collision IS supported in-kernel (lane-packed sphere-pair
    # combos over the curated pair set, engine.self_collision_terms law)

    from uhc_tpu.envs import humanoid_im as H

    nb, nv, ndof = topo.nbody, topo.nv, topo.ndof
    NP = -(-nv // BS) * BS
    E = env_tile
    FS = cfg.frame_skip
    ndof_, vf_dim, meta_dim = H.action_dims(topo, cfg)
    assert ndof_ == ndof

    m = {f: np.asarray(jax.device_get(getattr(model, f)), np.float32)
         for f in ("body_pos", "body_ipos", "body_mass", "body_inertia",
                   "body_iquat", "armature", "jkp", "jkd", "torque_lim",
                   "jnt_range", "contact_point", "contact_mask")}
    dt = float(np.asarray(jax.device_get(model.dt)))
    grav_z = float(np.asarray(jax.device_get(model.gravity))[2])
    c_stiff = float(np.asarray(jax.device_get(model.contact_stiffness)))
    c_damp = float(np.asarray(jax.device_get(model.contact_damping)))
    c_cap = float(np.asarray(jax.device_get(model.contact_depth_cap)))
    c_vreg = float(np.asarray(jax.device_get(model.contact_vreg)))
    mu = float(np.asarray(jax.device_get(model.friction)))
    K = m["contact_point"].shape[1]

    # ---- static structure matrices -------------------------------------
    parents = np.asarray(topo.parents)
    P_par = np.zeros((nb, nb), np.float32)   # gather = arr @ P_par
    for b in range(1, nb):
        P_par[parents[b], b] = 1.0
    levels = topo.levels()
    level_masks = []
    for idx, _ in levels:
        lm = np.zeros((1, nb), np.float32)
        lm[0, idx] = 1.0
        level_masks.append(lm)
    mask0 = np.zeros((1, nb), np.float32)
    mask0[0, 0] = 1.0

    S_k = []                                  # (nb, NP) per hinge axis z,y,x
    for k in range(3):
        S = np.zeros((nb, NP), np.float32)
        for b in range(1, nb):
            S[b, 6 + 3 * (b - 1) + k] = 1.0
        S_k.append(S)
    Sz, Sy, Sx = S_k
    S_all = Sz + Sy + Sx
    root6 = np.zeros((1, NP), np.float32)
    root6[0, :6] = 1.0
    lane = np.arange(NP)
    lin_m = (lane < 3).astype(np.float32)[None]            # (1, NP)
    rot_root = [(lane == 3 + k).astype(np.float32)[None] for k in range(3)]
    joint_m = ((lane >= 6) & (lane < nv)).astype(np.float32)[None]
    valid_m = (lane < nv).astype(np.float32)[None]
    Amask = np.zeros((nb, NP), np.float32)
    Amask[:, :nv] = topo.ancestor_mask()

    # per-dof model tables padded to NP
    def pad_dof(x, fill=0.0):
        out = np.full((1, NP), fill, np.float32)
        out[0, 6:6 + ndof] = x
        return out

    jkp_p = pad_dof(m["jkp"])
    jkd_p = pad_dof(m["jkd"])
    tl_p = pad_dof(m["torque_lim"])
    lo_p = pad_dof(m["jnt_range"][:, 0], fill=-1e9)
    hi_p = pad_dof(m["jnt_range"][:, 1], fill=1e9)
    lo_p[0, :6] = -1e9
    hi_p[0, :6] = 1e9
    arm_p = np.zeros((1, NP), np.float32)
    arm_p[0, :nv] = m["armature"]
    pad_eye = np.zeros((NP, NP), np.float32)
    for i in range(nv, NP):
        pad_eye[i, i] = 1.0
    eyeNP = np.eye(NP, dtype=np.float32)

    bpx, bpy, bpz = [m["body_pos"][:, c][None] for c in range(3)]   # (1, nb)
    ipx, ipy, ipz = [m["body_ipos"][:, c][None] for c in range(3)]
    mass = m["body_mass"][None]
    sqm = np.sqrt(m["body_mass"])[None]
    sqI = np.sqrt(m["body_inertia"])                                 # (nb, 3)
    sqIx, sqIy, sqIz = sqI[:, 0][None], sqI[:, 1][None], sqI[:, 2][None]
    Ix, Iy, Iz = [m["body_inertia"][:, c][None] for c in range(3)]
    iqw, iqx, iqy, iqz = [m["body_iquat"][:, c][None] for c in range(4)]
    cpx, cpy, cpz = [np.ascontiguousarray(m["contact_point"][:, :, c])
                     for c in range(3)]                              # (nb, K)
    cmask = m["contact_mask"]                                        # (nb, K)
    base_rot = np.asarray(cfg.base_rot, np.float32)
    # q ⊗ base_rot⁻¹ with base_rot = (w,x,0,0): precompute inverse comps
    br_w, br_x = float(base_rot[0]), -float(base_rot[1])
    rf_lim = float(cfg.residual_force_lim)

    LIM_K, LIM_D = 500.0, 20.0

    # ---- constant packs (Pallas kernels cannot capture traced constants;
    # everything static enters as replicated VMEM inputs) ----------------
    nlev = len(level_masks)
    cb_rows = ([mask0, bpx, bpy, bpz, ipx, ipy, ipz, mass, sqm,
                sqIx, sqIy, sqIz, Ix, Iy, Iz, iqw, iqx, iqy, iqz]
               + level_masks)
    CB = np.concatenate(cb_rows, axis=0).astype(np.float32)   # (19+nlev, nb)
    lane_eq = [(lane == k).astype(np.float32)[None] for k in range(6)]
    cl_rows = [jkp_p, jkd_p, tl_p, lo_p, hi_p, lin_m, joint_m, valid_m,
               root6] + rot_root + lane_eq
    CL = np.concatenate(cl_rows, axis=0).astype(np.float32)   # (18, NP)
    CS = np.concatenate([Sz, Sy, Sx, S_all, Amask], 0).astype(np.float32)
    CPar = P_par.astype(np.float32)                           # (nb, nb)
    CE = np.concatenate([np.diag(arm_p[0]) + pad_eye, eyeNP],
                        0).astype(np.float32)                 # (2NP, NP)
    CC = np.concatenate([cpx, cpy, cpz, cmask], 0).astype(np.float32)
    CST = np.concatenate([Sz.T, Sy.T, Sx.T], 1).astype(np.float32)

    # ---- self-collision statics (engine.self_collision_terms port) ------
    # Sphere-pair combos are lane-packed: combo c = (pair p, sphere si of
    # body a, sphere sj of body b). Row order of the flattened per-sphere
    # arrays is s-major: r = s*nb + body.
    from uhc_tpu.smpl.constants import self_collision_pairs
    sc_pairs = self_collision_pairs(topo)
    scp = np.asarray(jax.device_get(model.sc_point), np.float32)  # (nb,SC,3)
    scr = np.asarray(jax.device_get(model.sc_radius), np.float32)
    SCN = scp.shape[1]
    PN = len(sc_pairs)
    CN = max(PN * SCN * SCN, 1)
    GA = np.zeros((SCN * nb, CN), np.float32)
    GB = np.zeros((SCN * nb, CN), np.float32)
    PAc = np.zeros((nb, CN), np.float32)
    PBc = np.zeros((nb, CN), np.float32)
    RSc = np.zeros((1, CN), np.float32)
    for p, (a, b) in enumerate(sc_pairs):
        for si in range(SCN):
            for sj in range(SCN):
                c = (p * SCN + si) * SCN + sj
                GA[si * nb + a, c] = 1.0
                GB[sj * nb + b, c] = 1.0
                PAc[a, c] = 1.0
                PBc[b, c] = 1.0
                RSc[0, c] = scr[a] + scr[b]
    if PN:
        # local sphere offsets per sphere index, padded to the combo lanes
        def _pad(rows):
            out = np.zeros((SCN, CN), np.float32)
            out[:, :nb] = rows
            return out

        scpx = _pad(scp[:, :, 0].T)
        scpy = _pad(scp[:, :, 1].T)
        scpz = _pad(scp[:, :, 2].T)
        CSC = np.concatenate(
            [GA, GB, PAc, PBc, RSc, scpx, scpy, scpz],
            axis=0).astype(np.float32)
    else:
        CSC = np.zeros((1, 8), np.float32)
    SC_K, SC_D = 3000.0, 50.0    # engine.self_collision_terms defaults

    # ---- the kernel ------------------------------------------------------
    # `mode`: "full" (substep 0 incl. exact inverse + substeps 1..FS-1 in
    # one program), "head" (substep 0 only, Xp/Xf written to HBM), "tail"
    # (substeps 1..FS-1, Xp/Xf read from HBM). The head/tail split frees
    # the tail program of the blocked-Cholesky code — the Mosaic-compile
    # and VMEM driver — so the tail can run at larger env tiles.
    # `E` is the env-tile of the specific kernel instance.

    def make_kernel(mode, E):
      def kernel(*refs):
        (root_ref, jz_ref, jy_ref, jx_ref, vz_ref, vy_ref, vx_ref,
         ctrl_ref, tb_ref, kps_ref, kds_ref, vf_ref) = refs[:12]
        if mode == "tail":
            xp_ref, xf_ref = refs[12:14]
            (cb_ref, cl_ref, cs_ref, cpar_ref, ce_ref, cc_ref,
             cst_ref, csc_ref) = refs[14:22]
            outs = refs[22:]
        else:
            (cb_ref, cl_ref, cs_ref, cpar_ref, ce_ref, cc_ref,
             cst_ref, csc_ref) = refs[12:20]
            outs = refs[20:]
        (root_o, jz_o, jy_o, jx_o, vz_o, vy_o, vx_o) = outs[:7]
        if mode == "head":
            xp_o, xf_o = outs[7:9]
        root = root_ref[:]            # (E, 16): pos3 quat4 linv3 angv3
        jz, jy, jx = jz_ref[:], jy_ref[:], jx_ref[:]
        vz, vy, vx = vz_ref[:], vy_ref[:], vx_ref[:]
        ctrl = ctrl_ref[:]            # (E, NP) dof lanes
        tb = tb_ref[:]                # (E, NP)
        kps, kds = kps_ref[:], kds_ref[:]   # (E, FS) padded to 16
        vf = vf_ref[:]                # (E, 8): wrench pre-scaled

        # ---- unpack replicated constant packs ----
        cb = cb_ref[:]
        cl = cl_ref[:]
        cs = cs_ref[:]
        Cpar = cpar_ref[:]
        ce = ce_ref[:]
        cc = cc_ref[:]
        cst = cst_ref[:]
        K_M0 = cb[0:1]
        K_BP = (cb[1:2], cb[2:3], cb[3:4])
        K_IP = (cb[4:5], cb[5:6], cb[6:7])
        K_MASS, K_SQM = cb[7:8], cb[8:9]
        K_SQI = (cb[9:10], cb[10:11], cb[11:12])
        K_I = (cb[12:13], cb[13:14], cb[14:15])
        K_IQ = (cb[15:16], cb[16:17], cb[17:18], cb[18:19])
        K_LEV = [cb[19 + li:20 + li] for li in range(nlev)]
        K_JKP, K_JKD, K_TL = cl[0:1], cl[1:2], cl[2:3]
        K_LO, K_HI = cl[3:4], cl[4:5]
        K_LIN, K_JNT, K_VAL, K_R6 = cl[5:6], cl[6:7], cl[7:8], cl[8:9]
        K_RR = [cl[9 + k:10 + k] for k in range(3)]
        K_LEQ = [cl[12 + k:13 + k] for k in range(6)]
        K_SZ, K_SY, K_SX = cs[0:nb], cs[nb:2 * nb], cs[2 * nb:3 * nb]
        K_SALL, K_AMASK = cs[3 * nb:4 * nb], cs[4 * nb:5 * nb]
        K_ARMEYE, K_EYE = ce[0:NP], ce[NP:2 * NP]
        K_CPX, K_CPY, K_CPZ = cc[0:nb], cc[nb:2 * nb], cc[2 * nb:3 * nb]
        K_CM = cc[3 * nb:4 * nb]
        K_SZT, K_SYT = cst[:, 0:nb], cst[:, nb:2 * nb]
        K_SXT = cst[:, 2 * nb:3 * nb]
        if cfg.self_collision and CN > 1:
            csc = csc_ref[:]
            K_GA = csc[0:SCN * nb]
            K_GB = csc[SCN * nb:2 * SCN * nb]
            K_PA = csc[2 * SCN * nb:2 * SCN * nb + nb]
            K_PB = csc[2 * SCN * nb + nb:2 * SCN * nb + 2 * nb]
            _o = 2 * SCN * nb + 2 * nb
            K_RS = csc[_o:_o + 1]
            K_SCPX = csc[_o + 1:_o + 1 + SCN, :nb]
            K_SCPY = csc[_o + 1 + SCN:_o + 1 + 2 * SCN, :nb]
            K_SCPZ = csc[_o + 1 + 2 * SCN:_o + 1 + 3 * SCN, :nb]

        rp = (root[:, 0:1], root[:, 1:2], root[:, 2:3])
        rq = (root[:, 3:4], root[:, 4:5], root[:, 5:6], root[:, 6:7])
        rv = (root[:, 7:8], root[:, 8:9], root[:, 9:10])
        rw = (root[:, 10:11], root[:, 11:12], root[:, 12:13])

        def pgather(arrs):
            """Parent gather of a list of (E, nb) arrays via one matmul."""
            S = jnp.concatenate(arrs, axis=0)              # (n·E, nb)
            G = jnp.dot(S, Cpar, preferred_element_type=F32,
                        precision=jax.lax.Precision.HIGHEST)
            n = len(arrs)
            return [G[i * E:(i + 1) * E] for i in range(n)]

        def one_substep(state, Xp, Xf, kscale, dscale, compute_inv):
            (jz, jy, jx, vz, vy, vx, rp, rq, rv, rw) = state
            # ---------- FK ------------------------------------------------
            rqn = rq
            nrm = jax.lax.rsqrt(rqn[0]**2 + rqn[1]**2 + rqn[2]**2
                                + rqn[3]**2 + 1e-12)
            rqn = tuple(x * nrm for x in rqn)
            hz, hy, hx = jz * 0.5, jy * 0.5, jx * 0.5
            czj, szj = jnp.cos(hz), jnp.sin(hz)
            cyj, syj = jnp.cos(hy), jnp.sin(hy)
            cxj, sxj = jnp.cos(hx), jnp.sin(hx)
            zeros = jnp.zeros_like(czj)
            q_z = (czj, zeros, zeros, szj)
            q_y = (cyj, zeros, syj, zeros)
            q_x = (cxj, sxj, zeros, zeros)
            q_zy = _qmul(q_z, q_y)
            q_loc = _qmul(q_zy, q_x)

            m0 = K_M0
            qw = m0 * rqn[0]
            qx_ = m0 * rqn[1]
            qy_ = m0 * rqn[2]
            qz_ = m0 * rqn[3]
            px = m0 * rp[0]
            py = m0 * rp[1]
            pz = m0 * rp[2]
            for lm in K_LEV:
                pqw, pqx, pqy, pqz, ppx, ppy, ppz = pgather(
                    [qw, qx_, qy_, qz_, px, py, pz])
                pq = (pqw, pqx, pqy, pqz)
                cqw, cqx, cqy, cqz = _qmul(pq, q_loc)
                ox, oy, oz = _qrot(pq, K_BP)
                qw = qw + lm * cqw
                qx_ = qx_ + lm * cqx
                qy_ = qy_ + lm * cqy
                qz_ = qz_ + lm * cqz
                px = px + lm * (ppx + ox)
                py = py + lm * (ppy + oy)
                pz = pz + lm * (ppz + oz)
            q = (qw, qx_, qy_, qz_)
            ipw = _qrot(q, K_IP)
            cx_, cy_, cz_ = px + ipw[0], py + ipw[1], pz + ipw[2]  # xipos

            # per-joint world hinge axes (parent-frame z, then y, x)
            pqw, pqx, pqy, pqz = pgather([qw, qx_, qy_, qz_])
            pq = (pqw, pqx, pqy, pqz)
            azc = _rcol_z(pq)
            pq_z = _qmul(pq, q_z)
            ayc = _rcol_y(pq_z)
            pq_zy = _qmul(pq, q_zy)
            axc = _rcol_x(pq_zy)

            # ---------- velocities ---------------------------------------
            R0x = _rcol_x(rqn)
            R0y = _rcol_y(rqn)
            R0z = _rcol_z(rqn)
            w0c = tuple(R0x[k] * rw[0] + R0y[k] * rw[1] + R0z[k] * rw[2]
                        for k in range(3))
            om = tuple(m0 * w0c[k] for k in range(3))
            vl = tuple(m0 * rv[k] for k in range(3))
            al = (zeros, zeros, zeros)
            ab = (zeros, zeros, zeros)
            for lm in K_LEV:
                g = pgather([om[0], om[1], om[2], al[0], al[1], al[2],
                             vl[0], vl[1], vl[2], ab[0], ab[1], ab[2],
                             px, py, pz])
                w0 = (g[0], g[1], g[2])
                a0 = (g[3], g[4], g[5])
                v0 = (g[6], g[7], g[8])
                ac0 = (g[9], g[10], g[11])
                d = (px - g[12], py - g[13], pz - g[14])
                w1 = tuple(w0[k] + azc[k] * vz for k in range(3))
                w2 = tuple(w1[k] + ayc[k] * vy for k in range(3))
                wi = tuple(w2[k] + axc[k] * vx for k in range(3))
                cz0 = _cross(w0, azc)
                cy1 = _cross(w1, ayc)
                cx2 = _cross(w2, axc)
                ai_ = tuple(a0[k] + cz0[k] * vz + cy1[k] * vy + cx2[k] * vx
                            for k in range(3))
                cwd = _cross(w0, d)
                vi = tuple(v0[k] + cwd[k] for k in range(3))
                cad = _cross(a0, d)
                cwwd = _cross(w0, cwd)
                aci = tuple(ac0[k] + cad[k] + cwwd[k] for k in range(3))
                om = tuple(om[k] + lm * wi[k] for k in range(3))
                al = tuple(al[k] + lm * ai_[k] for k in range(3))
                vl = tuple(vl[k] + lm * vi[k] for k in range(3))
                ab = tuple(ab[k] + lm * aci[k] for k in range(3))
            # bias accel at COM
            r_ip = (cx_ - px, cy_ - py, cz_ - pz)
            c1 = _cross(al, r_ip)
            c2 = _cross(om, _cross(om, r_ip))
            acom = tuple(ab[k] + c1[k] + c2[k] for k in range(3))

            # ---------- dof-ified axes / anchors --------------------------
            def dofify(za, ya, xa):
                return (jnp.dot(za, K_SZ, preferred_element_type=F32)
                        + jnp.dot(ya, K_SY, preferred_element_type=F32)
                        + jnp.dot(xa, K_SX, preferred_element_type=F32))

            axd = []
            for comp in range(3):
                a_j = dofify(azc[comp], ayc[comp], axc[comp])
                rootrot = (R0x[comp] * K_RR[0]
                           + R0y[comp] * K_RR[1]
                           + R0z[comp] * K_RR[2])
                lin_basis = K_LEQ[comp]
                axd.append(a_j + rootrot + lin_basis)
            anc = []
            for comp, parr in zip(range(3), (px, py, pz)):
                a_j = jnp.dot(parr, K_SALL, preferred_element_type=F32)
                anc.append(a_j + parr[:, 0:1] * K_R6)

            # ---------- Jacobians (E, nb, NP) ------------------------------
            Am = K_AMASK[None]
            lin = K_LIN[None]
            rxj = cx_[:, :, None] - anc[0][:, None, :]
            ryj = cy_[:, :, None] - anc[1][:, None, :]
            rzj = cz_[:, :, None] - anc[2][:, None, :]
            a0_ = axd[0][:, None, :]
            a1_ = axd[1][:, None, :]
            a2_ = axd[2][:, None, :]
            rcx = a1_ * rzj - a2_ * ryj
            rcy = a2_ * rxj - a0_ * rzj
            rcz = a0_ * ryj - a1_ * rxj
            Jl = [Am * (lin * a0_ + (1.0 - lin) * rcx),
                  Am * (lin * a1_ + (1.0 - lin) * rcy),
                  Am * (lin * a2_ + (1.0 - lin) * rcz)]
            rot = Am * (1.0 - lin)
            Ja = [rot * a0_, rot * a1_, rot * a2_]

            # ---------- G, M ----------------------------------------------
            qi = _qmul(q, K_IQ)
            Rt = [_rcol_x(qi), _rcol_y(qi), _rcol_z(qi)]  # cols; Rt[k][c]
            sqIc = K_SQI
            Gl = [K_SQM[:, :, None] * Jl[k] for k in range(3)]
            Ga = [sqIc[k][:, :, None]
                  * (Rt[k][0][:, :, None] * Ja[0]
                     + Rt[k][1][:, :, None] * Ja[1]
                     + Rt[k][2][:, :, None] * Ja[2]) for k in range(3)]
            G = jnp.concatenate(Gl + Ga, axis=1)          # (E, 6nb, NP)
            M = _dotg(G, G, ta=True) + K_ARMEYE[None]

            # ---------- bias force C ---------------------------------------
            fb = [K_MASS * acom[0], K_MASS * acom[1],
                  K_MASS * (acom[2] - grav_z)]
            # Iw = R diag(I) R^T, cols Rt[k]; Iw[c,c'] = Σ_k Rt[k][c] I_k Rt[k][c']
            Iw = [[sum(Rt[k][ci] * K_I[k] * Rt[k][cj]
                       for k in range(3)) for cj in range(3)]
                  for ci in range(3)]
            Iwal = [sum(Iw[ci][cj] * al[cj] for cj in range(3))
                    for ci in range(3)]
            Iwom = [sum(Iw[ci][cj] * om[cj] for cj in range(3))
                    for ci in range(3)]
            wIw = _cross(om, tuple(Iwom))
            tb_ = [Iwal[ci] + wIw[ci] for ci in range(3)]
            C = sum(jnp.sum(Jl[k] * fb[k][:, :, None], axis=1)
                    + jnp.sum(Ja[k] * tb_[k][:, :, None], axis=1)
                    for k in range(3))                     # (E, NP)

            # ---------- ground contacts ------------------------------------
            tcx = 2.0 * (qy_[:, :, None] * K_CPZ[None]
                         - qz_[:, :, None] * K_CPY[None])
            tcy = 2.0 * (qz_[:, :, None] * K_CPX[None]
                         - qx_[:, :, None] * K_CPZ[None])
            tcz = 2.0 * (qx_[:, :, None] * K_CPY[None]
                         - qy_[:, :, None] * K_CPX[None])
            dxp = (K_CPX[None] + qw[:, :, None] * tcx
                   + qy_[:, :, None] * tcz - qz_[:, :, None] * tcy)
            dyp = (K_CPY[None] + qw[:, :, None] * tcy
                   + qz_[:, :, None] * tcx - qx_[:, :, None] * tcz)
            dzp = (K_CPZ[None] + qw[:, :, None] * tcz
                   + qx_[:, :, None] * tcy - qy_[:, :, None] * tcx)
            wpz = pz[:, :, None] + dzp
            vpx = vl[0][:, :, None] + (om[1][:, :, None] * dzp
                                       - om[2][:, :, None] * dyp)
            vpy = vl[1][:, :, None] + (om[2][:, :, None] * dxp
                                       - om[0][:, :, None] * dzp)
            act = (wpz < 0.0).astype(F32) * K_CM[None]
            pen = jnp.clip(-wpz, 0.0, c_cap)
            fn = c_stiff * pen * act                       # (E, nb, K)
            vt = jnp.sqrt(vpx**2 + vpy**2 + 1e-12)
            bco = c_damp * act
            aco = act * jnp.minimum(mu * fn / jnp.maximum(vt, c_vreg),
                                    2000.0)
            rxc = px[:, :, None] + dxp - cx_[:, :, None]
            ryc = py[:, :, None] + dyp - cy_[:, :, None]
            rzc = wpz - cz_[:, :, None]
            Fz = jnp.sum(fn, -1)
            Tx = jnp.sum(fn * ryc, -1)
            Ty = -jnp.sum(fn * rxc, -1)
            sa = jnp.sum(aco, -1)
            sb = jnp.sum(bco, -1)
            sarx = jnp.sum(aco * rxc, -1)
            sary = jnp.sum(aco * ryc, -1)
            sarz = jnp.sum(aco * rzc, -1)
            sbrx = jnp.sum(bco * rxc, -1)
            sbry = jnp.sum(bco * ryc, -1)
            arz2 = jnp.sum(aco * rzc * rzc, -1)
            arx2 = jnp.sum(aco * rxc * rxc, -1)
            ary2 = jnp.sum(aco * ryc * ryc, -1)
            arxz = jnp.sum(aco * rxc * rzc, -1)
            aryz = jnp.sum(aco * ryc * rzc, -1)
            brx2 = jnp.sum(bco * rxc * rxc, -1)
            bry2 = jnp.sum(bco * ryc * ryc, -1)
            brxy = jnp.sum(bco * rxc * ryc, -1)
            # W blocks (engine.contact_terms)
            Wll = [[sa, zeros, zeros], [zeros, sa, zeros], [zeros, zeros, sb]]
            Wla = [[zeros, sarz, -sary], [-sarz, zeros, sarx],
                   [sbry, -sbrx, zeros]]
            Waa = [[arz2 + bry2, -brxy, -arxz],
                   [-brxy, arz2 + brx2, -aryz],
                   [-arxz, -aryz, arx2 + ary2]]
            Klin = [sum(Wll[ci][cj][:, :, None] * Jl[cj] for cj in range(3))
                    + sum(Wla[ci][cj][:, :, None] * Ja[cj] for cj in range(3))
                    for ci in range(3)]
            Kang = [sum(Wla[cj][ci][:, :, None] * Jl[cj] for cj in range(3))
                    + sum(Waa[ci][cj][:, :, None] * Ja[cj] for cj in range(3))
                    for ci in range(3)]
            J6cat = jnp.concatenate(Jl + Ja, axis=1)
            Kcat = jnp.concatenate(Klin + Kang, axis=1)
            CD = _dotg(J6cat, Kcat, ta=True)               # (E, NP, NP)
            # COM-point velocity for the damping rhs
            v6l = [vl[k] + _cross(om, r_ip)[k] for k in range(3)]
            qfrc_damp = -(sum(jnp.sum(Klin[k] * v6l[k][:, :, None], axis=1)
                              + jnp.sum(Kang[k] * om[k][:, :, None], axis=1)
                              for k in range(3)))
            qfrc_con = (jnp.sum(Jl[2] * Fz[:, :, None], axis=1)
                        + jnp.sum(Ja[0] * Tx[:, :, None], axis=1)
                        + jnp.sum(Ja[1] * Ty[:, :, None], axis=1))

            # ---------- self-collision (engine.self_collision_terms) ------
            if cfg.self_collision and CN > 1:
                # world sphere positions/velocities, (E, SCN*nb) s-major
                ws, vs = [], []
                for s in range(SCN):
                    sx, sy, sz = _qrot(q, (K_SCPX[s:s + 1],
                                           K_SCPY[s:s + 1],
                                           K_SCPZ[s:s + 1]))
                    wx_, wy_, wz_ = px + sx, py + sy, pz + sz
                    ws.append((wx_, wy_, wz_))
                    vs.append((vl[0] + om[1] * sz - om[2] * sy,
                               vl[1] + om[2] * sx - om[0] * sz,
                               vl[2] + om[0] * sy - om[1] * sx))

                def sc_gather(mat, arrs):
                    cat = jnp.concatenate(arrs, axis=1)
                    return jnp.dot(cat, mat, preferred_element_type=F32,
                                   precision=jax.lax.Precision.HIGHEST)

                def sc_scatter(v, mat):           # (E,CN)x(nb,CN)->(E,nb)
                    return jax.lax.dot_general(
                        v, mat, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=F32,
                        precision=jax.lax.Precision.HIGHEST)

                wa = [sc_gather(K_GA, [w[c] for w in ws]) for c in range(3)]
                wb = [sc_gather(K_GB, [w[c] for w in ws]) for c in range(3)]
                va = [sc_gather(K_GA, [v[c] for v in vs]) for c in range(3)]
                vb = [sc_gather(K_GB, [v[c] for v in vs]) for c in range(3)]
                ca = [jnp.dot(t, K_PA, preferred_element_type=F32)
                      for t in (cx_, cy_, cz_)]
                cb2 = [jnp.dot(t, K_PB, preferred_element_type=F32)
                       for t in (cx_, cy_, cz_)]
                dxc = wa[0] - wb[0]
                dyc = wa[1] - wb[1]
                dzc = wa[2] - wb[2]
                dist = jnp.sqrt(dxc * dxc + dyc * dyc + dzc * dzc + 1e-12)
                depth = K_RS - dist
                actc = (depth > 0.0).astype(F32)
                nxc, nyc, nzc = dxc / dist, dyc / dist, dzc / dist
                vnc = ((va[0] - vb[0]) * nxc + (va[1] - vb[1]) * nyc
                       + (va[2] - vb[2]) * nzc)
                fnc = jnp.maximum(SC_K * depth - SC_D * vnc, 0.0) * actc
                Fc = [fnc * nxc, fnc * nyc, fnc * nzc]
                pt = [0.5 * (wa[c] + wb[c]) for c in range(3)]
                ra = [pt[c] - ca[c] for c in range(3)]
                rb = [pt[c] - cb2[c] for c in range(3)]
                Ta = [ra[1] * Fc[2] - ra[2] * Fc[1],
                      ra[2] * Fc[0] - ra[0] * Fc[2],
                      ra[0] * Fc[1] - ra[1] * Fc[0]]
                Tb = [-(rb[1] * Fc[2] - rb[2] * Fc[1]),
                      -(rb[2] * Fc[0] - rb[0] * Fc[2]),
                      -(rb[0] * Fc[1] - rb[1] * Fc[0])]
                Fbody = [sc_scatter(Fc[c], K_PA) - sc_scatter(Fc[c], K_PB)
                         for c in range(3)]
                Tbody = [sc_scatter(Ta[c], K_PA) + sc_scatter(Tb[c], K_PB)
                         for c in range(3)]
                qfrc_con = qfrc_con + sum(
                    jnp.sum(Jl[c] * Fbody[c][:, :, None], axis=1)
                    + jnp.sum(Ja[c] * Tbody[c][:, :, None], axis=1)
                    for c in range(3))

            # ---------- joint limits ---------------------------------------
            qd = dofify(jz, jy, jx)                        # (E, NP)
            qveld = (dofify(vz, vy, vx)
                     + rv[0] * K_LEQ[0] + rv[1] * K_LEQ[1]
                     + rv[2] * K_LEQ[2]
                     + rw[0] * K_RR[0] + rw[1] * K_RR[1]
                     + rw[2] * K_RR[2])
            below = jnp.maximum(K_LO - qd, 0.0)
            above = jnp.maximum(qd - K_HI, 0.0)
            out_ = ((below > 0) | (above > 0)).astype(F32) * K_JNT
            qfrc_lim = LIM_K * (below - above) * K_JNT
            lim_damp = out_ * LIM_D
            qfrc_damp = qfrc_damp - lim_damp * qveld

            # ---------- implicit RFC ---------------------------------------
            qfrc_app = jnp.zeros_like(C)
            if cfg.residual_force:
                cr = _qmul((rqn[0], rqn[1], rqn[2], rqn[3]),
                           (jnp.full_like(rqn[0], br_w),
                            jnp.full_like(rqn[0], br_x),
                            jnp.zeros_like(rqn[0]), jnp.zeros_like(rqn[0])))
                hw = cr[0]
                hzq = cr[3]
                hn = jax.lax.rsqrt(hw * hw + hzq * hzq + 1e-12)
                hq = (hw * hn, jnp.zeros_like(hw), jnp.zeros_like(hw),
                      hzq * hn)
                fx, fy, fz_ = _qrot(hq, (vf[:, 0:1], vf[:, 1:2], vf[:, 2:3]))
                wrench = [fx, fy, fz_, vf[:, 3:4], vf[:, 4:5], vf[:, 5:6]]
                for lane_i, wv in enumerate(wrench):
                    wvc = jnp.clip(wv, -rf_lim, rf_lim)
                    qfrc_app = qfrc_app + wvc * K_LEQ[lane_i]

            # ---------- stable PD + systems --------------------------------
            kp_i = K_JKP * kscale
            kd_i = K_JKD * dscale
            base = qd + (tb - qd - 2.0 * np.pi * jnp.round(
                (tb - qd) / (2.0 * np.pi))) if cfg.action_v == 1 \
                else jnp.zeros_like(qd)
            target = (base + ctrl) * K_JNT
            qpos_err = (qd + qveld * dt - target) * K_JNT
            rhs_pd = -C - kp_i * qpos_err - kd_i * qveld
            A_pd = M + dt * K_EYE[None] * kd_i[:, None, :]
            A_fd = M + dt * (CD + K_EYE[None] * lim_damp[:, None, :])

            if compute_inv:
                Xp = _chol_inverse(A_pd, NP)
                Xf = _chol_inverse(A_fd, NP)
                if precond_bf16:
                    Xp = Xp.astype(jnp.bfloat16)
                    Xf = Xf.astype(jnp.bfloat16)

            qacc_des = _pcg(A_pd, rhs_pd * K_VAL, Xp, pcg_iters)
            tau = jnp.clip(-kp_i * qpos_err - kd_i * (qveld + qacc_des * dt),
                           -K_TL, K_TL) * K_JNT
            rhs = (qfrc_app + qfrc_con + qfrc_lim + qfrc_damp - C + tau)
            qacc = _pcg(A_fd, rhs * K_VAL, Xf, pcg_iters)

            # ---------- integrate ------------------------------------------
            qveld_new = (qveld + dt * qacc) * K_VAL
            vz = jnp.dot(qveld_new, K_SZT, preferred_element_type=F32)
            vy = jnp.dot(qveld_new, K_SYT, preferred_element_type=F32)
            vx = jnp.dot(qveld_new, K_SXT, preferred_element_type=F32)
            rv = (qveld_new[:, 0:1], qveld_new[:, 1:2], qveld_new[:, 2:3])
            rw = (qveld_new[:, 3:4], qveld_new[:, 4:5], qveld_new[:, 5:6])
            jz = jz + dt * vz
            jy = jy + dt * vy
            jx = jx + dt * vx
            rp = (rp[0] + dt * rv[0], rp[1] + dt * rv[1], rp[2] + dt * rv[2])
            # root quat ⊗ exp(ω_local dt)
            angx = rw[0] * dt
            angy = rw[1] * dt
            angz = rw[2] * dt
            ang = jnp.sqrt(angx**2 + angy**2 + angz**2 + 1e-24)
            sa_ = jnp.sin(0.5 * ang) / ang
            dq = (jnp.cos(0.5 * ang), angx * sa_, angy * sa_, angz * sa_)
            rq2 = _qmul(rqn, dq)
            n2 = jax.lax.rsqrt(rq2[0]**2 + rq2[1]**2 + rq2[2]**2
                               + rq2[3]**2 + 1e-12)
            rq = tuple(t * n2 for t in rq2)

            return (jz, jy, jx, vz, vy, vx, rp, rq, rv, rw), Xp, Xf

        state = (jz, jy, jx, vz, vy, vx, rp, rq, rv, rw)
        if mode == "tail":
            X_pd, X_fd = xp_ref[:], xf_ref[:]
        else:
            state, X_pd, X_fd = one_substep(state, None, None,
                                            kps[:, 0:1], kds[:, 0:1], True)

        if mode != "head":
            def loop_body(it, carry):
                st, Xp, Xf = carry
                # masked lane select (Mosaic lowers neither dynamic_slice
                # nor gather on values)
                lane_fs = jax.lax.broadcasted_iota(jnp.int32, (1, FSP), 1)
                ks = jnp.sum(jnp.where(lane_fs == it, kps, 0.0), axis=1,
                             keepdims=True)
                ds = jnp.sum(jnp.where(lane_fs == it, kds, 0.0), axis=1,
                             keepdims=True)
                st, Xp, Xf = one_substep(st, Xp, Xf, ks, ds, False)
                return (st, Xp, Xf)

            state, X_pd, X_fd = jax.lax.fori_loop(
                1, FS, loop_body, (state, X_pd, X_fd))
        (jz, jy, jx, vz, vy, vx, rp, rq, rv, rw) = state

        root_o[:] = jnp.concatenate(
            [rp[0], rp[1], rp[2], rq[0], rq[1], rq[2], rq[3],
             rv[0], rv[1], rv[2], rw[0], rw[1], rw[2],
             jnp.zeros((E, 3), F32)], axis=1)
        jz_o[:] = jz
        jy_o[:] = jy
        jx_o[:] = jx
        vz_o[:] = vz
        vy_o[:] = vy
        vx_o[:] = vx
        if mode == "head":
            xp_o[:] = X_pd
            xf_o[:] = X_fd
      return kernel

    # ---- host-side wrapper ----------------------------------------------

    FSP = -(-FS // 16) * 16   # pad the meta-scale lane dim

    @jax.jit
    def do_simulation(qpos, qvel, actions, target_base, rfc_rate):
        B = qpos.shape[0]
        tile = max(E, tail_tile) if split else E
        Bp = -(-B // tile) * tile
        dtype = F32

        # meta-PD per-substep gain scales (humanoid_im.py:1053-1064)
        if cfg.meta_pd:
            meta = actions[:, ndof + vf_dim: ndof + vf_dim + meta_dim]
            kps = jnp.clip(meta[:, :FS] + 1.0, 0.0, 10.0)
            kds = jnp.clip(meta[:, FS:] + 1.0, 0.0, 10.0)
        else:
            kps = jnp.ones((B, FS), dtype)
            kds = jnp.ones((B, FS), dtype)
        kps = jnp.pad(kps, ((0, 0), (0, FSP - FS)))
        kds = jnp.pad(kds, ((0, 0), (0, FSP - FS)))

        if cfg.residual_force and vf_dim:
            vf = actions[:, ndof:ndof + vf_dim] * (
                cfg.residual_force_scale * rfc_rate)
        else:
            vf = jnp.zeros((B, 6), dtype)
        vf = jnp.pad(vf, ((0, 0), (0, 8 - vf.shape[1])))

        # component decomposition
        j = qpos[:, 7:7 + ndof].reshape(B, nb - 1, 3)
        zcol = jnp.zeros((B, 1), dtype)
        jz = jnp.concatenate([zcol, j[:, :, 0]], axis=1)
        jy = jnp.concatenate([zcol, j[:, :, 1]], axis=1)
        jx = jnp.concatenate([zcol, j[:, :, 2]], axis=1)
        v = qvel[:, 6:6 + ndof].reshape(B, nb - 1, 3)
        vz = jnp.concatenate([zcol, v[:, :, 0]], axis=1)
        vy = jnp.concatenate([zcol, v[:, :, 1]], axis=1)
        vx = jnp.concatenate([zcol, v[:, :, 2]], axis=1)
        root = jnp.concatenate([qpos[:, 0:7], qvel[:, 0:6],
                                jnp.zeros((B, 3), dtype)], axis=1)
        ctrl = jnp.zeros((B, NP), dtype).at[:, 6:6 + ndof].set(
            actions[:, :ndof])
        tbd = jnp.zeros((B, NP), dtype).at[:, 6:6 + ndof].set(target_base)

        args = [root, jz, jy, jx, vz, vy, vx, ctrl, tbd, kps, kds, vf]
        if Bp != B:
            args = [jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (Bp - B,) + a.shape[1:])], 0)
                for a in args]
        args = [a.astype(dtype) for a in args]

        widths = [16, nb, nb, nb, nb, nb, nb, NP, NP, FSP, FSP, 8]
        state_w = [16, nb, nb, nb, nb, nb, nb]
        packs = [jnp.asarray(pk)
                 for pk in (CB, CL, CS, CPar, CE, CC, CST, CSC)]
        # the default scoped-VMEM budget (~16 MB) is a compiler default, not
        # the v5e hardware limit (128 MB) — raising it is what allows env
        # tiles beyond E=8 to schedule
        cparams = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)

        def call(mode, E_k, extra_in=(), extra_in_w=()):
            specs = [pl.BlockSpec((E_k, w), lambda g: (g, 0),
                                  memory_space=pltpu.VMEM) for w in widths]
            specs += [pl.BlockSpec((E_k,) + w,
                                   lambda g, n=len(w): (g,) + (0,) * n,
                                   memory_space=pltpu.VMEM)
                      for w in extra_in_w]
            # replicated constant packs (same block for every program)
            specs += [pl.BlockSpec(pk.shape, lambda g: (0,) * pk.ndim,
                                   memory_space=pltpu.VMEM) for pk in packs]
            out_w = [(w,) for w in state_w]
            out_dt = [dtype] * len(out_w)
            if mode == "head":
                pdt = jnp.bfloat16 if precond_bf16 else dtype
                out_w += [(NP, NP), (NP, NP)]
                out_dt += [pdt, pdt]
            out_specs = [pl.BlockSpec((E_k,) + w,
                                      lambda g, n=len(w): (g,) + (0,) * n,
                                      memory_space=pltpu.VMEM)
                         for w in out_w]
            return pl.pallas_call(
                make_kernel(mode, E_k),
                grid=(Bp // E_k,),
                in_specs=specs,
                out_specs=out_specs,
                out_shape=[jax.ShapeDtypeStruct((Bp,) + w, dt)
                           for w, dt in zip(out_w, out_dt)],
                compiler_params=cparams,
                interpret=interpret,
            )(*(args + list(extra_in) + packs))

        if split:
            houts = call("head", E)
            state_h, xp, xf = houts[:7], houts[7], houts[8]
            args = list(state_h) + args[7:]
            outs = call("tail", tail_tile, extra_in=(xp, xf),
                        extra_in_w=((NP, NP), (NP, NP)))
        else:
            outs = call("full", E)
        root_o, jz_o, jy_o, jx_o, vz_o, vy_o, vx_o = [
            o[:B] for o in outs[:7]]

        qpos_out = jnp.concatenate(
            [root_o[:, 0:7],
             jnp.stack([jz_o[:, 1:], jy_o[:, 1:], jx_o[:, 1:]],
                       axis=2).reshape(B, ndof)], axis=1)
        qvel_out = jnp.concatenate(
            [root_o[:, 7:13],
             jnp.stack([vz_o[:, 1:], vy_o[:, 1:], vx_o[:, 1:]],
                       axis=2).reshape(B, ndof)], axis=1)
        return qpos_out.astype(qpos.dtype), qvel_out.astype(qvel.dtype)

    return do_simulation
