"""Lane-major fused control-step kernel (Pallas TPU, "v3").

Same physics contract as `pallas_substep.make_fused_do_simulation` (the
entire 15-substep / 450 Hz control step fused into one Pallas program;
reference unit: uhc/envs/humanoid_im.py:1145-1190 do_simulation), but with
the data layout rotated 90°: **envs live in the lane dimension**.

Why: the v2 kernel keeps an env tile E=8/16 in sublanes and per-body
quantities as (E, nb=24) lane vectors — every elementwise FK/velocity/
contact op uses 24 of each vreg's 128 lanes (~19 % utilization, the
measured ceiling in PERF.md). Here the same quantities are (nb, EL=128):
full lanes for every VPU op, and the tree gathers become plain
(nb, nb) x (nb, n·EL) MXU matmuls.

The parts that genuinely need per-env matrices — the mass matrix, the
contact-damping matrix CD, the blocked-Cholesky exact inverses, and the
PCG solves — run env-major over sub-tiles of ET=16 envs inside an
in-kernel `fori_loop` (the heavy Cholesky code is compiled ONCE regardless
of EL — the v2 E=32 experiments showed Mosaic's compile wall is
instruction count, not VMEM). Lane→env handoffs go through VMEM scratch
via MXU-identity transposes. Per-dof force/bias vectors are computed on
the lane side directly with masked ancestor contractions
(Σ_b Am[b,p]·w[b,e] as one matmul), so the dense Jacobian is only
materialized env-major, where it feeds M = J6ᵀ·[mass·Jl ; Iw·Ja] and
CD = J6ᵀ·K in a single concatenated MXU product. The per-body world
inertia Iw = R·diag(I)·Rᵀ is computed lane-side (the bias force needs it
anyway) and handed over as its 6 unique entries.

Scope (round 4+): implicit AND explicit RFC (per-body [cp,f,τ] operands,
rotated/gated/projected in-kernel), plain PD, meta-PD, and meta_pd_joint
(per-dof gain scales as (NP, EL) operand tiles), shared AND per-env
(shape-library) models, optional self-collision (lane-packed combo rows).
Still falls back to `uhc_tpu.physics.solver`: explicit RFC combined with
per-env models (hull-projection tables are per-shape), and dynamic scene
objects (physics/objects.py couples through engine.assemble only).

Tree size: the 24-body SMPL tree (NP=80) runs the full production config
(pcg_vpu=True, ET=32). Large trees (masterfoot 48 / SMPL-H 52, NP=160)
run with pcg_vpu=False — the two (EL,NP,NP) A-staging buffers the deferred
VPU-PCG needs are only allocated when it is on, and skipping them is what
fits NP=160 in v5e VMEM; the solves then run env-major per ET=8 sub-tile.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uhc_tpu.physics.model import Model, Topology
from uhc_tpu.physics.pallas_substep import (
    BS, _chol_inverse, _cross, _dotg, _pcg, _qmul, _qrot, _rcol_x, _rcol_y,
    _rcol_z)

F32 = jnp.float32
HI = jax.lax.Precision.HIGHEST

# Model leaves that may carry a leading (S,) shape-library dim on the
# per-env path — exactly what model_from_betas(_exact) varies per shape
# (smpl/robot.py:60-69,126-128). Everything else must be shared.
PE_MODEL_LEAVES = ("body_pos", "body_ipos", "body_mass", "body_inertia",
                   "body_iquat", "jnt_range", "contact_point", "sc_point",
                   "sc_radius",
                   # per-env contact scalars: domain-randomization axis for
                   # cross-simulator robustness training (the friction /
                   # penalty-stiffness / damping mismatch is the suspected
                   # transfer gap on low-momentum gaits, PARITY.md). Packed
                   # as one (3, EL) lane tile when any of them is batched.
                   "contact_stiffness", "contact_damping", "friction")


def _dg(a, b, ca, cb):
    """dot_general contracting a's dim `ca` with b's dim `cb` (f32)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((ca,), (cb,)), ((), ())),
        preferred_element_type=F32, precision=HI)


def make_fused_do_simulation_lane(topo: Topology, cfg, model: Model,
                                  env_tile: int = 128, sub_tile: int = 16,
                                  pcg_iters: int | tuple = 2,
                                  interpret: bool = False,
                                  vmem_limit_mb: int = 100,
                                  pcg_vpu: bool = False,
                                  refresh_at: int | None = None,
                                  pcg_vpu_sub: bool = False,
                                  cond_inv: bool = False,
                                  merge_j6: bool = False):
    """Build the lane-major fused control step.

    Returns fn(qpos (B,nq), qvel (B,nv), actions (B,act), target_base
    (B,ndof), rfc_rate) -> (qpos', qvel'). Model baked statically.

    `pcg_iters` may be a (pd, fd) pair: the PD solve's error only reaches
    the dynamics scaled by kd·dt (≈0.11) and clipped, so PCG-1 there is
    MEASURED more accurate than the symmetric PCG-2 production schedule at
    2 fewer matvecs per substep (tools/solver_variants.py: pd1fd2 1.45e-3
    vs pcg2 1.64e-3 qpos dev on the adversarial jog window).

    `refresh_at=k` recomputes the exact inverse pair at substep k, halving
    preconditioner staleness: PCG-(1,1) with refresh_at=8 measures 9.4e-4
    (vs 3.2e-3 unrefreshed PCG-1, which is over the 2e-3 bound) — 4 fewer
    matvecs per substep for one extra inverse pair per control step.
    (Newton–Schulz inverse tracking was also measured: NaN — contact
    touchdown changes A_fd discontinuously and the iteration diverges,
    confirming the solver.py design note.)

    `cond_inv=True` compiles the exact-inverse block ONCE: instead of
    statically inlining `one_substep(compute_inv=True)` for substep 0 (and
    again for `refresh_at`), all FS substeps run one `fori_loop` whose
    body guards the inverse pair with `pl.when(it == 0 [or refresh_at])`.
    Same math, ~half the scheduler-hostile program text — the fix for the
    refresh variant's remote-compile stall (PERF.md round-4e).

    `merge_j6=True` fuses the substep's 3-5 dot_J6 wrench projections
    (bias, ground contact, contact damping, self-collision, explicit RFC)
    into ONE masked-ancestor contraction: all inputs are pure functions of
    the same FK/velocity state, so their 12-column D-input groups ride the
    lane axis of a single (nb,NP)ᵀ(nb,36-60·EL) matmul. Column-independent
    accumulation makes each group's result bit-identical to its standalone
    call; only dispatch count changes.
    """
    # meta_pd_joint (humanoid_im.py:1053-1064 per-joint variant): the
    # per-dof gain scales ride the kps/kds operand slots as (NP, EL)
    # lane tiles, constant across substeps
    MPJ = bool(cfg.meta_pd_joint)
    # explicit RFC (humanoid_im.py:1080-1132): per-body [cp, f, τ] in the
    # body frame, summed over num_each / scaled / hull-projected host-side;
    # the kernel rotates them by the CURRENT per-substep body orientation,
    # applies the optional contact gate, and projects with dot_J6
    VFX = bool(cfg.residual_force
               and cfg.residual_force_mode != "implicit")
    VFX_GATE = None
    if VFX and cfg.residual_contact_only:
        VFX_GATE = ("ground" if cfg.residual_contact_only_ground
                    else "height")
    if VFX:
        from uhc_tpu.physics.model import model_is_batched as _mib
        if _mib(model):
            raise ValueError("explicit RFC + per-env models not supported "
                             "in the lane kernel (hull projection tables "
                             "are per-shape)")

    from uhc_tpu.envs import humanoid_im as H

    nb, nv, ndof = topo.nbody, topo.nv, topo.ndof
    if isinstance(pcg_iters, tuple):
        pcg_pd, pcg_fd = pcg_iters
    else:
        pcg_pd = pcg_fd = pcg_iters
    NP = -(-nv // BS) * BS
    EL, ET = env_tile, sub_tile
    assert EL % ET == 0
    SUB = EL // ET
    FS = cfg.frame_skip
    FSP = -(-FS // 16) * 16
    ndof_, vf_dim, meta_dim = H.action_dims(topo, cfg)
    assert ndof_ == ndof

    # ---- per-env (shape-conditioned) models --------------------------------
    # A batched `model` is a shape LIBRARY: leading (S,) dims on the leaves
    # model_from_betas(_exact) varies per shape (smpl/robot.py:60-69,126).
    # The lane layout absorbs per-env values for free: every per-body
    # (nb, 1) column and per-dof (NP, 1) column the kernel broadcasts
    # against (·, EL) lane tiles simply becomes a (·, EL) tile with one
    # value per lane/env — the math is unchanged. Those tiles are gathered
    # per env by sequence index at call time (the reference rebuilds the
    # robot per episode, humanoid_im.py:154-180) and fed as extra operands;
    # everything else (gains, armature, structure, contact scalars) must
    # stay shared.
    from uhc_tpu.physics.model import model_batch_axes, model_is_batched
    PE_LEAVES = PE_MODEL_LEAVES
    per_env = model_is_batched(model)
    if per_env:
        axes = model_batch_axes(model)
        batched = [f.name for f in dataclasses.fields(Model)
                   if getattr(axes, f.name) == 0]
        unsupported = sorted(set(batched) - set(PE_LEAVES))
        if unsupported:
            raise ValueError(
                f"lane kernel per-env models support {PE_LEAVES}; "
                f"got batched leaves {unsupported}")
        S_lib = int(np.asarray(jax.device_get(model.body_mass)).shape[0])

        def _lib(f, base_nd):
            v = np.asarray(jax.device_get(getattr(model, f)), np.float32)
            if v.ndim == base_nd:          # shared leaf -> broadcast to S
                v = np.broadcast_to(v, (S_lib,) + v.shape)
            return np.ascontiguousarray(v)
        rep = 0  # representative index for the static tables below
        m = {}
        for f, nd in (("body_pos", 2), ("body_ipos", 2), ("body_mass", 1),
                      ("body_inertia", 2), ("body_iquat", 2),
                      ("jnt_range", 2), ("contact_point", 3)):
            m[f] = _lib(f, nd)[rep]
        for f in ("armature", "jkp", "jkd", "torque_lim", "contact_mask"):
            m[f] = np.asarray(jax.device_get(getattr(model, f)), np.float32)
    else:
        m = {f: np.asarray(jax.device_get(getattr(model, f)), np.float32)
             for f in ("body_pos", "body_ipos", "body_mass", "body_inertia",
                       "body_iquat", "armature", "jkp", "jkd", "torque_lim",
                       "jnt_range", "contact_point", "contact_mask")}
    dt = float(np.asarray(jax.device_get(model.dt)))
    grav_z = float(np.asarray(jax.device_get(model.gravity))[2])
    # contact scalars: compile-time floats on the shared path; when any of
    # them carries a library dim (domain randomization) they ride a (3, EL)
    # per-env operand instead and these floats are representative only
    pe_csc = per_env and any(
        np.asarray(jax.device_get(getattr(model, f))).ndim > 0
        for f in ("contact_stiffness", "contact_damping", "friction"))
    c_stiff = float(np.asarray(
        jax.device_get(model.contact_stiffness)).reshape(-1)[0])
    c_damp = float(np.asarray(
        jax.device_get(model.contact_damping)).reshape(-1)[0])
    c_cap = float(np.asarray(jax.device_get(model.contact_depth_cap)))
    c_vreg = float(np.asarray(jax.device_get(model.contact_vreg)))
    mu = float(np.asarray(jax.device_get(model.friction)).reshape(-1)[0])
    K = m["contact_point"].shape[1]

    # ---- static structure -------------------------------------------------
    parents = np.asarray(topo.parents)
    P_par = np.zeros((nb, nb), np.float32)
    for b in range(1, nb):
        P_par[parents[b], b] = 1.0
    levels = topo.levels()
    nlev = len(levels)
    lev_cols = np.zeros((nb, nlev), np.float32)
    for li, (idx, _) in enumerate(levels):
        lev_cols[idx, li] = 1.0
    m0_col = np.zeros((nb,), np.float32)
    m0_col[0] = 1.0

    S_k = []
    for k in range(3):
        S = np.zeros((nb, NP), np.float32)
        for b in range(1, nb):
            S[b, 6 + 3 * (b - 1) + k] = 1.0
        S_k.append(S)
    Sz, Sy, Sx = S_k
    S_all = Sz + Sy + Sx
    lane = np.arange(NP)
    Amask = np.zeros((nb, NP), np.float32)
    Amask[:, :nv] = topo.ancestor_mask()

    def pad_dof(x, fill=0.0):
        out = np.full((NP,), fill, np.float32)
        out[6:6 + ndof] = x
        return out

    # CLT: per-dof statics as (NP, col) columns for the lane side
    lo_c = pad_dof(m["jnt_range"][:, 0], fill=-1e9)
    hi_c = pad_dof(m["jnt_range"][:, 1], fill=1e9)
    lo_c[:6], hi_c[:6] = -1e9, 1e9
    clt_cols = [
        pad_dof(m["jkp"]), pad_dof(m["jkd"]), pad_dof(m["torque_lim"]),
        lo_c, hi_c,
        (lane < 3).astype(np.float32),                       # 5: lin
        ((lane >= 6) & (lane < nv)).astype(np.float32),      # 6: joint
        (lane < nv).astype(np.float32),                      # 7: valid
        (lane < 6).astype(np.float32),                       # 8: root6
    ]
    for k in range(3):
        clt_cols.append((lane == 3 + k).astype(np.float32))  # 9-11: rr k
    for k in range(6):
        clt_cols.append((lane == k).astype(np.float32))      # 12-17: leq k
    CLT = np.stack(clt_cols, axis=1).astype(np.float32)      # (NP, 18)
    CLR = np.ascontiguousarray(CLT.T)                        # (18, NP) rows

    arm_p = np.zeros((NP,), np.float32)
    arm_p[:nv] = m["armature"]
    pad_eye = np.zeros((NP, NP), np.float32)
    for i in range(nv, NP):
        pad_eye[i, i] = 1.0
    CE = np.concatenate(
        [np.diag(arm_p) + pad_eye, np.eye(NP, dtype=np.float32)],
        0).astype(np.float32)                                # (2NP, NP)

    # CBT: per-body statics as (nb, col) columns
    cbt_cols = ([m0_col]
                + [m["body_pos"][:, c] for c in range(3)]
                + [m["body_ipos"][:, c] for c in range(3)]
                + [m["body_mass"]]
                + [m["body_inertia"][:, c] for c in range(3)]
                + [m["body_iquat"][:, c] for c in range(4)])
    CBT = np.concatenate([np.stack(cbt_cols, 1), lev_cols],
                         1).astype(np.float32)               # (nb, 15+nlev)
    NLEV0 = 15

    CS = np.concatenate([Sz, Sy, Sx, S_all, Amask], 0).astype(np.float32)
    CPar = P_par.astype(np.float32)
    # env-major per-body rows: mass (for the M build)
    CBR = m["body_mass"][None].astype(np.float32)            # (1, nb)
    # contact constants as (nb, K, 4): cpx, cpy, cpz, mask
    CC3 = np.stack([m["contact_point"][:, :, 0],
                    m["contact_point"][:, :, 1],
                    m["contact_point"][:, :, 2],
                    m["contact_mask"]], axis=2).astype(np.float32)

    base_rot = np.asarray(cfg.base_rot, np.float32)
    br_w, br_x = float(base_rot[0]), -float(base_rot[1])
    rf_lim = float(cfg.residual_force_lim)
    LIM_K, LIM_D = 500.0, 20.0

    # ---- self-collision statics (engine.self_collision_terms law) --------
    from uhc_tpu.smpl.constants import self_collision_pairs
    sc_pairs = self_collision_pairs(topo)
    scp = np.asarray(jax.device_get(model.sc_point), np.float32)
    scr = np.asarray(jax.device_get(model.sc_radius), np.float32)
    if per_env:
        scp_lib = _lib("sc_point", 3)
        scr_lib = _lib("sc_radius", 1)
        scp, scr = scp_lib[rep], scr_lib[rep]
    SCN = scp.shape[1]
    PN = len(sc_pairs)
    CN = max(PN * SCN * SCN, 1)
    GA = np.zeros((SCN * nb, CN), np.float32)
    GB = np.zeros((SCN * nb, CN), np.float32)
    PAc = np.zeros((nb, CN), np.float32)
    PBc = np.zeros((nb, CN), np.float32)
    RSc = np.zeros((CN, 1), np.float32)
    for p, (a, b) in enumerate(sc_pairs):
        for si in range(SCN):
            for sj in range(SCN):
                c = (p * SCN + si) * SCN + sj
                GA[si * nb + a, c] = 1.0
                GB[sj * nb + b, c] = 1.0
                PAc[a, c] = 1.0
                PBc[b, c] = 1.0
                RSc[c, 0] = scr[a] + scr[b]
    CG_AB = np.concatenate([GA, GB], 0).astype(np.float32)
    CP_AB = np.concatenate([PAc, PBc], 1).astype(np.float32)
    SCP = np.zeros((nb, 3 * SCN), np.float32)
    for s in range(SCN):
        for c in range(3):
            SCP[:, s * 3 + c] = scp[:, s, c]
    SC_K, SC_D = 3000.0, 50.0
    use_sc = bool(cfg.self_collision) and CN > 1

    # ---- per-env library packs (gathered by seq_idx at call time) ---------
    if per_env:
        bp_l = _lib("body_pos", 2)            # (S, nb, 3)
        ip_l = _lib("body_ipos", 2)
        ms_l = _lib("body_mass", 1)           # (S, nb)
        in_l = _lib("body_inertia", 2)
        iq_l = _lib("body_iquat", 2)          # (S, nb, 4)
        LIB_CBT = np.concatenate(
            [np.transpose(bp_l, (0, 2, 1)), np.transpose(ip_l, (0, 2, 1)),
             ms_l[:, None, :], np.transpose(in_l, (0, 2, 1)),
             np.transpose(iq_l, (0, 2, 1))], axis=1)        # (S, 14, nb)
        jr_l = _lib("jnt_range", 2)           # (S, ndof, 2)
        LIB_JR = np.zeros((S_lib, 2, NP), np.float32)
        LIB_JR[:, 0, :] = -1e9
        LIB_JR[:, 1, :] = 1e9
        LIB_JR[:, 0, 6:6 + ndof] = jr_l[:, :, 0]
        LIB_JR[:, 1, 6:6 + ndof] = jr_l[:, :, 1]
        cp_l = _lib("contact_point", 3)       # (S, nb, K, 3)
        LIB_CP = np.concatenate(
            [cp_l[:, :, :, 0], cp_l[:, :, :, 1], cp_l[:, :, :, 2]],
            axis=1)                                          # (S, 3nb, K)
        LIB_SCP = np.zeros((S_lib, nb, 3 * SCN), np.float32)
        for s in range(SCN):
            for c in range(3):
                LIB_SCP[:, :, s * 3 + c] = scp_lib[:, :, s, c]
        LIB_RS = np.zeros((S_lib, CN), np.float32)
        for p, (a, b) in enumerate(sc_pairs):
            for si in range(SCN):
                for sj in range(SCN):
                    c = (p * SCN + si) * SCN + sj
                    LIB_RS[:, c] = scr_lib[:, a] + scr_lib[:, b]
        LIB_MASSR = np.ascontiguousarray(ms_l)               # (S, nb)
        lib_list = [LIB_CBT, LIB_JR, LIB_CP, LIB_SCP, LIB_RS]
        if pe_csc:
            # (S, 3) = [stiffness, damping, friction] per library entry
            LIB_CSC = np.stack([_lib("contact_stiffness", 0),
                                _lib("contact_damping", 0),
                                _lib("friction", 0)], axis=1)
            lib_list.append(np.ascontiguousarray(LIB_CSC))
        lib_list.append(LIB_MASSR)
        libs = tuple(jnp.asarray(x) for x in lib_list)

    IEL = np.eye(EL, dtype=np.float32)

    # coordW slots: cx,cy,cz (3) + W scalars (15) + Iw entries (6)
    CW_LIST_LEN = 24
    NVEC = 12   # axd0-2, anc0-2, rhs_pd, pd_a, rhs_base, kd_i, lim_damp,
    #             qveld

    # -----------------------------------------------------------------------
    def kernel(*refs):
        (root_ref, jz_ref, jy_ref, jx_ref, vz_ref, vy_ref, vx_ref,
         ctrl_ref, tb_ref, kps_ref, kds_ref, vf_ref) = refs[0:12]
        i0 = 12
        if VFX:
            vfx_ref = refs[12]       # (9nb, EL): [cp|f|t] comp-major
            i0 = 13
        if per_env:
            if pe_csc:
                (pe_cbt_ref, pe_jr_ref, pe_cp_ref, pe_scp_ref, pe_rs_ref,
                 pe_csc_ref, pe_massr_ref) = refs[i0:i0 + 7]
                i0 += 7
            else:
                (pe_cbt_ref, pe_jr_ref, pe_cp_ref, pe_scp_ref, pe_rs_ref,
                 pe_massr_ref) = refs[i0:i0 + 6]
                i0 += 6
        (cbt_ref, clt_ref, clr_ref, cs_ref, cpar_ref, ce_ref,
         cbr_ref, cc3_ref, gab_ref, pab_ref, rs_ref, scpk_ref,
         iel_ref) = refs[i0:i0 + 13]
        (root_o, jz_o, jy_o, jx_o, vz_o, vy_o, vx_o) = refs[i0 + 13:i0 + 20]
        (coordw_ref, vecs_ref, qvnew_ref, xp_ref, xf_ref,
         apd_ref, afd_ref) = refs[i0 + 20:i0 + 27]
        cbt = cbt_ref[:]
        clt = clt_ref[:]
        clr = clr_ref[:]
        cs = cs_ref[:]
        Cpar = cpar_ref[:]
        ce = ce_ref[:]
        cbr = cbr_ref[:]
        cc3 = cc3_ref[:]
        iel = iel_ref[:]

        C_M0 = cbt[:, 0:1]
        C_LEV = [cbt[:, NLEV0 + li:NLEV0 + 1 + li] for li in range(nlev)]
        if per_env:
            # per-env per-body columns: same broadcast shapes as the
            # static (nb, 1) slices, but one value per lane/env
            pe = pe_cbt_ref[:]                       # (14, nb, EL)
            C_BP = (pe[0], pe[1], pe[2])
            C_IP = (pe[3], pe[4], pe[5])
            C_MASS = pe[6]
            C_I = (pe[7], pe[8], pe[9])
            C_IQ = (pe[10], pe[11], pe[12], pe[13])
            jr_pe = pe_jr_ref[:]                     # (2, NP, EL)
            T_LO, T_HI = jr_pe[0], jr_pe[1]
        else:
            C_BP = (cbt[:, 1:2], cbt[:, 2:3], cbt[:, 3:4])
            C_IP = (cbt[:, 4:5], cbt[:, 5:6], cbt[:, 6:7])
            C_MASS = cbt[:, 7:8]
            C_I = (cbt[:, 8:9], cbt[:, 9:10], cbt[:, 10:11])
            C_IQ = (cbt[:, 11:12], cbt[:, 12:13], cbt[:, 13:14],
                    cbt[:, 14:15])
            T_LO, T_HI = clt[:, 3:4], clt[:, 4:5]
        T_JKP, T_JKD = clt[:, 0:1], clt[:, 1:2]
        T_LIN, T_JNT = clt[:, 5:6], clt[:, 6:7]
        T_R6 = clt[:, 8:9]
        T_RR = [clt[:, 9 + k:10 + k] for k in range(3)]
        T_LEQ = [clt[:, 12 + k:13 + k] for k in range(6)]
        R_TL, R_JNT, R_VAL = clr[2:3], clr[6:7], clr[7:8]   # (1, NP) rows
        R_LIN = clr[5:6]
        K_SALL, K_AM = cs[3 * nb:4 * nb], cs[4 * nb:5 * nb]
        K_ARMEYE, K_EYE = ce[0:NP], ce[NP:2 * NP]
        if per_env:
            cp_pe = pe_cp_ref[:]                     # (3nb, K, EL)
            C_CPX = cp_pe[0:nb]
            C_CPY = cp_pe[nb:2 * nb]
            C_CPZ = cp_pe[2 * nb:3 * nb]
        else:
            C_CPX = cc3[:, :, 0:1]
            C_CPY = cc3[:, :, 1:2]
            C_CPZ = cc3[:, :, 2:3]
        C_CM = cc3[:, :, 3:4]

        def T_env(x):
            """(d, EL) -> (EL, d) via MXU identity (exact in f32)."""
            return _dg(iel, x, 1, 1)

        def mv_v(A, x):
            """env-major VPU matvec: (n,NP,NP)·(n,NP) elementwise + lane
            reduction — full 128-lane utilization at any batch n (the MXU
            batched matvec has one rhs per env: ~0.2% utilization)."""
            return jnp.sum(A * x[:, None, :], axis=-1)

        def pcg_v(A, b, X, iters):
            x = mv_v(X, b)
            r = b - mv_v(A, x)
            z = mv_v(X, r)
            pv = z
            rz = jnp.sum(r * z, axis=-1, keepdims=True)
            for it in range(iters):
                Ap = mv_v(A, pv)
                alpha = rz / (jnp.sum(pv * Ap, axis=-1,
                                      keepdims=True) + 1e-12)
                x = x + alpha * pv
                if it + 1 == iters:
                    break  # final r/z/beta are dead work
                r = r - alpha * Ap
                z = mv_v(X, r)
                rz_new = jnp.sum(r * z, axis=-1, keepdims=True)
                beta = rz_new / (rz + 1e-12)
                pv = z + beta * pv
                rz = rz_new
            return x

        K_S3 = cs[0:3 * nb]  # [Sz; Sy; Sx] stacked: one (3nb,NP) contraction

        root = root_ref[:]          # (16, EL)
        jz0, jy0, jx0 = jz_ref[:], jy_ref[:], jx_ref[:]
        vz0, vy0, vx0 = vz_ref[:], vy_ref[:], vx_ref[:]
        ctrl = ctrl_ref[:]          # (NP, EL)
        tb = tb_ref[:]
        kps, kds = kps_ref[:], kds_ref[:]   # (FSP, EL); MPJ: (NP, EL)
        vf = vf_ref[:]              # (8, EL)
        if VFX:
            vfx = vfx_ref[:]        # (9nb, EL)

        rp0 = (root[0:1], root[1:2], root[2:3])
        rq0 = (root[3:4], root[4:5], root[5:6], root[6:7])
        rv0 = (root[7:8], root[8:9], root[9:10])
        rw0 = (root[10:11], root[11:12], root[12:13])

        def pgather(arrs):
            """Parent gather via one (nb,nb)x(nb,n·EL) matmul."""
            cat = jnp.concatenate(arrs, axis=1)
            G = _dg(Cpar, cat, 0, 0)
            n = len(arrs)
            return [G[:, i * EL:(i + 1) * EL] for i in range(n)]

        def one_substep(state, kscale, dscale, compute_inv, inv_pred=None):
            (jz, jy, jx, vz, vy, vx, rp, rq, rv, rw) = state
            # ---------- FK (v2 kernel lines 544-592, transposed) -----------
            nrm = jax.lax.rsqrt(rq[0]**2 + rq[1]**2 + rq[2]**2
                                + rq[3]**2 + 1e-12)
            rqn = tuple(x * nrm for x in rq)
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

            qw = C_M0 * rqn[0]
            qx_ = C_M0 * rqn[1]
            qy_ = C_M0 * rqn[2]
            qz_ = C_M0 * rqn[3]
            px = C_M0 * rp[0]
            py = C_M0 * rp[1]
            pz = C_M0 * rp[2]
            for lm in C_LEV:
                pqw, pqx, pqy, pqz, ppx, ppy, ppz = pgather(
                    [qw, qx_, qy_, qz_, px, py, pz])
                pq = (pqw, pqx, pqy, pqz)
                cqw, cqx, cqy, cqz = _qmul(pq, q_loc)
                ox, oy, oz = _qrot(pq, C_BP)
                qw = qw + lm * cqw
                qx_ = qx_ + lm * cqx
                qy_ = qy_ + lm * cqy
                qz_ = qz_ + lm * cqz
                px = px + lm * (ppx + ox)
                py = py + lm * (ppy + oy)
                pz = pz + lm * (ppz + oz)
            q = (qw, qx_, qy_, qz_)
            ipw = _qrot(q, C_IP)
            cx_, cy_, cz_ = px + ipw[0], py + ipw[1], pz + ipw[2]

            pqw, pqx, pqy, pqz = pgather([qw, qx_, qy_, qz_])
            pq = (pqw, pqx, pqy, pqz)
            azc = _rcol_z(pq)
            pq_z = _qmul(pq, q_z)
            ayc = _rcol_y(pq_z)
            pq_zy = _qmul(pq, q_zy)
            axc = _rcol_x(pq_zy)

            # ---------- velocities (v2 594-634) ----------------------------
            R0x = _rcol_x(rqn)
            R0y = _rcol_y(rqn)
            R0z = _rcol_z(rqn)
            w0c = tuple(R0x[k] * rw[0] + R0y[k] * rw[1] + R0z[k] * rw[2]
                        for k in range(3))
            om = tuple(C_M0 * w0c[k] for k in range(3))
            vl = tuple(C_M0 * rv[k] for k in range(3))
            al = (zeros, zeros, zeros)
            ab = (zeros, zeros, zeros)
            for lm in C_LEV:
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
            r_ip = (cx_ - px, cy_ - py, cz_ - pz)
            c1 = _cross(al, r_ip)
            c2 = _cross(om, _cross(om, r_ip))
            acom = tuple(ab[k] + c1[k] + c2[k] for k in range(3))

            # ---------- dof axes / anchors (NP, EL) ------------------------
            # grouped dispatch: the three per-component dofify contractions
            # and the three anchor scatters each share their LHS, so they
            # ride the lane axis of ONE matmul each (dispatch latency
            # dominates at these sizes — same trick as dot_J6/T_env)
            AJ = _dg(K_S3, jnp.concatenate(
                [jnp.concatenate([azc[c], ayc[c], axc[c]], axis=0)
                 for c in range(3)], axis=1), 0, 0)          # (NP, 3EL)
            pxyz = (px, py, pz)
            ANC = _dg(K_SALL, jnp.concatenate(pxyz, axis=1), 0, 0)
            axd, anc = [], []
            for comp in range(3):
                rootrot = (R0x[comp] * T_RR[0] + R0y[comp] * T_RR[1]
                           + R0z[comp] * T_RR[2])
                axd.append(AJ[:, comp * EL:(comp + 1) * EL]
                           + rootrot + T_LEQ[comp])
                anc.append(ANC[:, comp * EL:(comp + 1) * EL]
                           + T_R6 * pxyz[comp][0:1])

            # ---------- inertials for bias + M handoff ---------------------
            qi = _qmul(q, C_IQ)
            Rt = [_rcol_x(qi), _rcol_y(qi), _rcol_z(qi)]
            fb = [C_MASS * acom[0], C_MASS * acom[1],
                  C_MASS * (acom[2] - grav_z)]
            Iw = [[sum(Rt[k][ci] * C_I[k] * Rt[k][cj] for k in range(3))
                   for cj in range(3)] for ci in range(3)]
            Iwal = [sum(Iw[ci][cj] * al[cj] for cj in range(3))
                    for ci in range(3)]
            Iwom = [sum(Iw[ci][cj] * om[cj] for cj in range(3))
                    for ci in range(3)]
            wIw = _cross(om, tuple(Iwom))
            tb_b = [Iwal[ci] + wIw[ci] for ci in range(3)]

            # J-contractions without materializing J: Jl[k][b,p] =
            # Am[b,p]·(lin[p]·axd_k[p] + (1-lin[p])·(axd×(c-anc))[k][b,p])
            one_lin = 1.0 - T_LIN
            cbod = (cx_, cy_, cz_)

            def _j6_inputs(wl, wa):
                arrs = []
                for k in range(3):
                    k1, k2 = (k + 1) % 3, (k + 2) % 3
                    arrs += [wl[k], wl[k] * cbod[k2], wl[k] * cbod[k1],
                             wa[k]]
                return arrs

            def _j6_reduce(G, o0):
                total = None
                for k in range(3):
                    k1, k2 = (k + 1) % 3, (k + 2) % 3
                    o = o0 + 4 * k * EL
                    Dw = G[:, o:o + EL]
                    Dc2 = G[:, o + EL:o + 2 * EL]
                    Dc1 = G[:, o + 2 * EL:o + 3 * EL]
                    Da = G[:, o + 3 * EL:o + 4 * EL]
                    t1 = Dc2 - anc[k2] * Dw
                    t2 = Dc1 - anc[k1] * Dw
                    term = (T_LIN * axd[k] * Dw
                            + one_lin * (axd[k1] * t1 - axd[k2] * t2)
                            + one_lin * axd[k] * Da)
                    total = term if total is None else total + term
                return total

            def dot_J6(wl, wa):
                """Σ_k Jlᵀ[k]·wl[k] + Jaᵀ[k]·wa[k] — the generalized
                projection of a per-body wrench — with ONE batched
                ancestor contraction: the 12 D-inputs ride the lane axis
                of a single (nb,NP)ᵀ(nb,12·EL) matmul instead of 12
                dispatches (dispatch latency dominates at this size)."""
                G = _dg(K_AM, jnp.concatenate(_j6_inputs(wl, wa), axis=1),
                        0, 0)
                return _j6_reduce(G, 0)

            def dot_J6_multi(pairs):
                """All of the substep's wrench projections in ONE
                masked-ancestor contraction (merge_j6): each pair's
                12-column group rides the lane axis; column-independent
                matmul accumulation keeps every group bit-identical to
                its standalone dot_J6."""
                arrs = []
                for wl, wa in pairs:
                    arrs += _j6_inputs(wl, wa)
                G = _dg(K_AM, jnp.concatenate(arrs, axis=1), 0, 0)
                return [_j6_reduce(G, 12 * p * EL)
                        for p in range(len(pairs))]

            if merge_j6:
                j6_pairs = [(fb, tb_b)]
            else:
                C_bias = dot_J6(fb, tb_b)

            # ---------- ground contacts (nb, K, EL) ------------------------
            q3 = [t[:, None, :] for t in (qw, qx_, qy_, qz_)]
            tcx = 2.0 * (q3[2] * C_CPZ - q3[3] * C_CPY)
            tcy = 2.0 * (q3[3] * C_CPX - q3[1] * C_CPZ)
            tcz = 2.0 * (q3[1] * C_CPY - q3[2] * C_CPX)
            dxp = C_CPX + q3[0] * tcx + q3[2] * tcz - q3[3] * tcy
            dyp = C_CPY + q3[0] * tcy + q3[3] * tcx - q3[1] * tcz
            dzp = C_CPZ + q3[0] * tcz + q3[1] * tcy - q3[2] * tcx
            px3, py3, pz3 = px[:, None, :], py[:, None, :], pz[:, None, :]
            om3 = [t[:, None, :] for t in om]
            vl3 = [t[:, None, :] for t in vl]
            wpz = pz3 + dzp
            vpx = vl3[0] + om3[1] * dzp - om3[2] * dyp
            vpy = vl3[1] + om3[2] * dxp - om3[0] * dzp
            act = (wpz < 0.0).astype(F32) * C_CM
            if VFX_GATE == "ground":
                # per-body any-active-ground-contact gate for explicit RFC
                # (engine.vf_contact_gate "ground")
                gate_b = jnp.max(act, axis=1)
            pen = jnp.clip(-wpz, 0.0, c_cap)
            if pe_csc:
                # per-env contact scalars: (3, EL) -> (1, 1, EL) broadcast
                # against the (nb, K, EL) contact tiles
                csc = pe_csc_ref[:]
                k_stiff = csc[0:1][:, None, :]
                k_damp = csc[1:2][:, None, :]
                k_mu = csc[2:3][:, None, :]
            else:
                k_stiff, k_damp, k_mu = c_stiff, c_damp, mu
            fn = k_stiff * pen * act
            vt = jnp.sqrt(vpx**2 + vpy**2 + 1e-12)
            bco = k_damp * act
            aco = act * jnp.minimum(k_mu * fn / jnp.maximum(vt, c_vreg),
                                    2000.0)
            cx3, cy3, cz3 = cx_[:, None, :], cy_[:, None, :], cz_[:, None, :]
            rxc = px3 + dxp - cx3
            ryc = py3 + dyp - cy3
            rzc = wpz - cz3
            Fz = jnp.sum(fn, 1)
            Tx = jnp.sum(fn * ryc, 1)
            Ty = -jnp.sum(fn * rxc, 1)
            sa = jnp.sum(aco, 1)
            sb = jnp.sum(bco, 1)
            sarx = jnp.sum(aco * rxc, 1)
            sary = jnp.sum(aco * ryc, 1)
            sarz = jnp.sum(aco * rzc, 1)
            sbrx = jnp.sum(bco * rxc, 1)
            sbry = jnp.sum(bco * ryc, 1)
            arz2 = jnp.sum(aco * rzc * rzc, 1)
            arx2 = jnp.sum(aco * rxc * rxc, 1)
            ary2 = jnp.sum(aco * ryc * ryc, 1)
            arxz = jnp.sum(aco * rxc * rzc, 1)
            aryz = jnp.sum(aco * ryc * rzc, 1)
            brx2 = jnp.sum(bco * rxc * rxc, 1)
            bry2 = jnp.sum(bco * ryc * ryc, 1)
            brxy = jnp.sum(bco * rxc * ryc, 1)
            zw = jnp.zeros_like(Fz)
            if merge_j6:
                j6_pairs.append(([zw, zw, Fz], [Tx, Ty, zw]))
            else:
                qfrc_con = dot_J6([zw, zw, Fz], [Tx, Ty, zw])

            # damping rhs via the same contraction trick (v2 755-768)
            v6l = [vl[k] + _cross(om, r_ip)[k] for k in range(3)]
            Wll = [[sa, zeros, zeros], [zeros, sa, zeros],
                   [zeros, zeros, sb]]
            Wla = [[zeros, sarz, -sary], [-sarz, zeros, sarx],
                   [sbry, -sbrx, zeros]]
            Waa = [[arz2 + bry2, -brxy, -arxz],
                   [-brxy, arz2 + brx2, -aryz],
                   [-arxz, -aryz, arx2 + ary2]]
            wls, was = [], []
            for cj in range(3):
                wls.append(sum(Wll[ci][cj] * v6l[ci] for ci in range(3))
                           + sum(Wla[cj][ci] * om[ci] for ci in range(3)))
                was.append(sum(Wla[ci][cj] * v6l[ci] for ci in range(3))
                           + sum(Waa[ci][cj] * om[ci] for ci in range(3)))
            if merge_j6:
                j6_pairs.append((wls, was))
            else:
                qfrc_damp = -dot_J6(wls, was)

            # ---------- self-collision (lane-packed combo rows) ------------
            if use_sc:
                gab = gab_ref[:]
                pab = pab_ref[:]
                if per_env:
                    rs = pe_rs_ref[:]                # (CN, EL)
                    scpk_pe = pe_scp_ref[:]          # (nb, 3SCN, EL)
                    sc_sl = [(scpk_pe[:, 3 * s], scpk_pe[:, 3 * s + 1],
                              scpk_pe[:, 3 * s + 2]) for s in range(SCN)]
                else:
                    rs = rs_ref[:]
                    scpk = scpk_ref[:]
                    sc_sl = [(scpk[:, 3 * s:3 * s + 1],
                              scpk[:, 3 * s + 1:3 * s + 2],
                              scpk[:, 3 * s + 2:3 * s + 3])
                             for s in range(SCN)]
                ws_rows, vs_rows = [], []
                for s in range(SCN):
                    off = _qrot(q, sc_sl[s])
                    ws_rows.append((px + off[0], py + off[1], pz + off[2]))
                    vs_rows.append((vl[0] + om[1] * off[2] - om[2] * off[1],
                                    vl[1] + om[2] * off[0] - om[0] * off[2],
                                    vl[2] + om[0] * off[1] - om[1] * off[0]))
                K_GA, K_GB = gab[0:SCN * nb], gab[SCN * nb:2 * SCN * nb]
                K_PA, K_PB = pab[:, 0:CN], pab[:, CN:2 * CN]
                # grouped dispatch: both gather LHSs stacked on the output
                # axis, all 6 (w/v × comp) inputs on the lane axis -> ONE
                # (SCN·nb, 2CN)ᵀ(SCN·nb, 6EL) matmul instead of 12
                K_GAB = jnp.concatenate([K_GA, K_GB], axis=1)
                WV = _dg(K_GAB, jnp.concatenate(
                    [jnp.concatenate([w[c] for w in ws_rows], 0)
                     for c in range(3)]
                    + [jnp.concatenate([v[c] for v in vs_rows], 0)
                       for c in range(3)], axis=1), 0, 0)   # (2CN, 6EL)
                wa_ = [WV[0:CN, c * EL:(c + 1) * EL] for c in range(3)]
                wb_ = [WV[CN:2 * CN, c * EL:(c + 1) * EL] for c in range(3)]
                va_ = [WV[0:CN, (3 + c) * EL:(4 + c) * EL] for c in range(3)]
                vb_ = [WV[CN:2 * CN, (3 + c) * EL:(4 + c) * EL]
                       for c in range(3)]
                CAB = _dg(pab, jnp.concatenate([cx_, cy_, cz_], axis=1),
                          0, 0)                              # (2CN, 3EL)
                ca_ = [CAB[0:CN, c * EL:(c + 1) * EL] for c in range(3)]
                cb_ = [CAB[CN:2 * CN, c * EL:(c + 1) * EL] for c in range(3)]
                dxc = wa_[0] - wb_[0]
                dyc = wa_[1] - wb_[1]
                dzc = wa_[2] - wb_[2]
                dist = jnp.sqrt(dxc * dxc + dyc * dyc + dzc * dzc + 1e-12)
                depth = rs - dist
                actc = (depth > 0.0).astype(F32)
                nxc, nyc, nzc = dxc / dist, dyc / dist, dzc / dist
                vnc = ((va_[0] - vb_[0]) * nxc + (va_[1] - vb_[1]) * nyc
                       + (va_[2] - vb_[2]) * nzc)
                fnc = jnp.maximum(SC_K * depth - SC_D * vnc, 0.0) * actc
                Fc = [fnc * nxc, fnc * nyc, fnc * nzc]
                pt = [0.5 * (wa_[c] + wb_[c]) for c in range(3)]
                ra = [pt[c] - ca_[c] for c in range(3)]
                rb = [pt[c] - cb_[c] for c in range(3)]
                Ta = [ra[1] * Fc[2] - ra[2] * Fc[1],
                      ra[2] * Fc[0] - ra[0] * Fc[2],
                      ra[0] * Fc[1] - ra[1] * Fc[0]]
                Tb = [-(rb[1] * Fc[2] - rb[2] * Fc[1]),
                      -(rb[2] * Fc[0] - rb[0] * Fc[2]),
                      -(rb[0] * Fc[1] - rb[1] * Fc[0])]
                # scatter back: 12 contractions -> 2 (lane-axis grouping)
                SA = _dg(K_PA, jnp.concatenate(Fc + Ta, axis=1), 1, 0)
                SB = _dg(K_PB, jnp.concatenate(Fc + Tb, axis=1), 1, 0)
                Fbody = [SA[:, c * EL:(c + 1) * EL]
                         - SB[:, c * EL:(c + 1) * EL] for c in range(3)]
                Tbody = [SA[:, (3 + c) * EL:(4 + c) * EL]
                         + SB[:, (3 + c) * EL:(4 + c) * EL]
                         for c in range(3)]
                if merge_j6:
                    j6_pairs.append((Fbody, Tbody))
                else:
                    qfrc_con = qfrc_con + dot_J6(Fbody, Tbody)

            # ---------- joint limits / PD prep (NP, EL) --------------------
            QDV = _dg(K_S3, jnp.concatenate(
                [jnp.concatenate([jz, jy, jx], axis=0),
                 jnp.concatenate([vz, vy, vx], axis=0)], axis=1), 0, 0)
            qd = QDV[:, 0:EL]
            qveld = (QDV[:, EL:2 * EL]
                     + rv[0] * T_LEQ[0] + rv[1] * T_LEQ[1]
                     + rv[2] * T_LEQ[2]
                     + rw[0] * T_RR[0] + rw[1] * T_RR[1] + rw[2] * T_RR[2])
            below = jnp.maximum(T_LO - qd, 0.0)
            above = jnp.maximum(qd - T_HI, 0.0)
            out_ = ((below > 0) | (above > 0)).astype(F32) * T_JNT
            qfrc_lim = LIM_K * (below - above) * T_JNT
            lim_damp = out_ * LIM_D
            if not merge_j6:
                qfrc_damp = qfrc_damp - lim_damp * qveld

            qfrc_app = jnp.zeros_like(qd)
            if VFX:
                # explicit RFC (engine.assemble:594-605): body-frame
                # [cp|f|t] -> world by the current body orientation, torque
                # about the COM, optional contact gate, dot_J6 projection
                cpb = (vfx[0:nb], vfx[nb:2 * nb], vfx[2 * nb:3 * nb])
                fb_x = (vfx[3 * nb:4 * nb], vfx[4 * nb:5 * nb],
                        vfx[5 * nb:6 * nb])
                tb_x = (vfx[6 * nb:7 * nb], vfx[7 * nb:8 * nb],
                        vfx[8 * nb:9 * nb])
                cp_w = _qrot(q, cpb)
                f_w = list(_qrot(q, fb_x))
                t_w = list(_qrot(q, tb_x))
                if VFX_GATE == "height":
                    g_b = (pz <= 0.12).astype(F32)
                elif VFX_GATE == "ground":
                    g_b = gate_b
                else:
                    g_b = None
                if g_b is not None:
                    f_w = [c * g_b for c in f_w]
                    t_w = [c * g_b for c in t_w]
                rxv = px + cp_w[0] - cx_
                ryv = py + cp_w[1] - cy_
                rzv = pz + cp_w[2] - cz_
                T_x = [ryv * f_w[2] - rzv * f_w[1] + t_w[0],
                       rzv * f_w[0] - rxv * f_w[2] + t_w[1],
                       rxv * f_w[1] - ryv * f_w[0] + t_w[2]]
                if merge_j6:
                    j6_pairs.append((f_w, T_x))
                else:
                    qfrc_app = qfrc_app + dot_J6(f_w, T_x)
            if cfg.residual_force and not VFX:
                cr = _qmul(rqn, (jnp.full_like(rqn[0], br_w),
                                 jnp.full_like(rqn[0], br_x),
                                 jnp.zeros_like(rqn[0]),
                                 jnp.zeros_like(rqn[0])))
                hw, hzq = cr[0], cr[3]
                hn = jax.lax.rsqrt(hw * hw + hzq * hzq + 1e-12)
                hq = (hw * hn, jnp.zeros_like(hw), jnp.zeros_like(hw),
                      hzq * hn)
                fx, fy, fz_ = _qrot(hq, (vf[0:1], vf[1:2], vf[2:3]))
                wrench = [fx, fy, fz_, vf[3:4], vf[4:5], vf[5:6]]
                for lane_i, wv in enumerate(wrench):
                    wvc = jnp.clip(wv, -rf_lim, rf_lim)
                    qfrc_app = qfrc_app + wvc * T_LEQ[lane_i]

            if merge_j6:
                # flush: every wrench projection of the substep in ONE
                # masked-ancestor contraction (order matches the appends)
                outs = dot_J6_multi(j6_pairs)
                C_bias = outs[0]
                qfrc_con = outs[1]
                qfrc_damp = -outs[2] - lim_damp * qveld
                oi = 3
                if use_sc:
                    qfrc_con = qfrc_con + outs[oi]
                    oi += 1
                if VFX:
                    qfrc_app = qfrc_app + outs[oi]
                    oi += 1

            kp_i = T_JKP * kscale
            kd_i = T_JKD * dscale
            base = qd + (tb - qd - 2.0 * np.pi * jnp.round(
                (tb - qd) / (2.0 * np.pi))) if cfg.action_v == 1 \
                else jnp.zeros_like(qd)
            target = (base + ctrl) * T_JNT
            qpos_err = (qd + qveld * dt - target) * T_JNT
            pd_a = -kp_i * qpos_err - kd_i * qveld
            rhs_pd = -C_bias + pd_a
            rhs_base = qfrc_app + qfrc_con + qfrc_lim + qfrc_damp - C_bias

            # ---------- handoff to env-major scratch -----------------------
            # One transpose matmul per scratch buffer instead of one per
            # array: T_env(concat(axis=0)) == concat(T_env(·), axis=1)
            # element-for-element (identity contraction), but dispatches a
            # single large MXU op.
            cw_list = [cx_, cy_, cz_, sa, sb, sarx, sary, sarz, sbrx, sbry,
                       arz2, arx2, ary2, arxz, aryz, brx2, bry2, brxy,
                       Iw[0][0], Iw[0][1], Iw[0][2], Iw[1][1], Iw[1][2],
                       Iw[2][2]]
            coordw_ref[:] = T_env(jnp.concatenate(cw_list, axis=0))
            vec_list = [axd[0], axd[1], axd[2], anc[0], anc[1], anc[2],
                        rhs_pd, pd_a, rhs_base, kd_i, lim_damp, qveld]
            vecs_ref[:] = T_env(jnp.concatenate(vec_list, axis=0))

            # ---------- env-major sub-tile loop ----------------------------
            def sub_body(i, carry):
                off = i * ET
                cw = coordw_ref[pl.ds(off, ET), :]
                vv = vecs_ref[pl.ds(off, ET), :]
                cwc = [cw[:, j * nb:(j + 1) * nb]
                       for j in range(CW_LIST_LEN)]
                vvc = [vv[:, j * NP:(j + 1) * NP] for j in range(NVEC)]
                (cxs, cys, czs, sa_s, sb_s, sarx_s, sary_s, sarz_s, sbrx_s,
                 sbry_s, arz2_s, arx2_s, ary2_s, arxz_s, aryz_s, brx2_s,
                 bry2_s, brxy_s, iw00, iw01, iw02, iw11, iw12,
                 iw22) = cwc
                (axd0, axd1, axd2, anc0, anc1, anc2, rhs_pd_s, pd_a_s,
                 rhs_b_s, kd_i_s, lim_d_s, qveld_s) = vvc

                # dense J build (v2 lines 655-671, E -> ET)
                Am = K_AM[None]
                lin = R_LIN[None]                    # (1, 1, NP)
                rxj = cxs[:, :, None] - anc0[:, None, :]
                ryj = cys[:, :, None] - anc1[:, None, :]
                rzj = czs[:, :, None] - anc2[:, None, :]
                a0_ = axd0[:, None, :]
                a1_ = axd1[:, None, :]
                a2_ = axd2[:, None, :]
                rcx = a1_ * rzj - a2_ * ryj
                rcy = a2_ * rxj - a0_ * rzj
                rcz = a0_ * ryj - a1_ * rxj
                Jl = [Am * (lin * a0_ + (1.0 - lin) * rcx),
                      Am * (lin * a1_ + (1.0 - lin) * rcy),
                      Am * (lin * a2_ + (1.0 - lin) * rcz)]
                rot = Am * (1.0 - lin)
                Ja = [rot * a0_, rot * a1_, rot * a2_]

                # M rows: [mass·Jl_k ; Σ_cj Iw[k][cj]·Ja_cj] — M = J6ᵀ·Mcat
                Iw_s = [[iw00, iw01, iw02], [iw01, iw11, iw12],
                        [iw02, iw12, iw22]]
                if per_env:
                    # per-env masses, env-major: (ET, nb, 1) sub-tile slice
                    massr = pe_massr_ref[pl.ds(off, ET), :][:, :, None]
                else:
                    massr = cbr[0:1, :, None]        # (1, nb, 1)
                Ml = [massr * Jl[k] for k in range(3)]
                Ma = [sum(Iw_s[k][cj][:, :, None] * Ja[cj]
                          for cj in range(3)) for k in range(3)]

                # contact-damping rows (v2 749-760); 0 entries are skipped
                z3 = jnp.zeros_like(Jl[0])
                Wll = [[sa_s, 0, 0], [0, sa_s, 0], [0, 0, sb_s]]
                Wla = [[0, sarz_s, -sary_s], [-sarz_s, 0, sarx_s],
                       [sbry_s, -sbrx_s, 0]]
                Waa = [[arz2_s + bry2_s, -brxy_s, -arxz_s],
                       [-brxy_s, arz2_s + brx2_s, -aryz_s],
                       [-arxz_s, -aryz_s, arx2_s + ary2_s]]

                def wj(Wrow, Js):
                    acc = None
                    for cj in range(3):
                        w = Wrow[cj]
                        if isinstance(w, int):
                            continue
                        t = w[:, :, None] * Js[cj]
                        acc = t if acc is None else acc + t
                    return acc if acc is not None else z3

                Klin = [wj(Wll[ci], Jl) + wj(Wla[ci], Ja) for ci in range(3)]
                Kang = [wj([Wla[0][ci], Wla[1][ci], Wla[2][ci]], Jl)
                        + wj(Waa[ci], Ja) for ci in range(3)]

                J6cat = jnp.concatenate(Jl + Ja, axis=1)   # (ET, 6nb, NP)
                Mcat = jnp.concatenate(Ml + Ma, axis=1)
                Kcat = jnp.concatenate(Klin + Kang, axis=1)
                MK = _dotg(J6cat, jnp.concatenate([Mcat, Kcat], axis=2),
                           ta=True)                        # (ET, NP, 2NP)
                M = MK[:, :, 0:NP] + K_ARMEYE[None]
                CD = MK[:, :, NP:2 * NP]

                A_pd = M + dt * K_EYE[None] * kd_i_s[:, None, :]
                A_fd = M + dt * (CD + K_EYE[None] * lim_d_s[:, None, :])

                if inv_pred is not None:
                    # cond_inv: the inverse pair is guarded by a traced
                    # predicate so the Cholesky code exists once in the
                    # program no matter how many substeps refresh it
                    @pl.when(inv_pred)
                    def _refresh_inverses():
                        xp_ref[pl.ds(off, ET), :, :] = _chol_inverse(A_pd,
                                                                     NP)
                        xf_ref[pl.ds(off, ET), :, :] = _chol_inverse(A_fd,
                                                                     NP)
                    Xp = xp_ref[pl.ds(off, ET), :, :]
                    Xf = xf_ref[pl.ds(off, ET), :, :]
                elif compute_inv:
                    Xp = _chol_inverse(A_pd, NP)
                    Xf = _chol_inverse(A_fd, NP)
                    xp_ref[pl.ds(off, ET), :, :] = Xp
                    xf_ref[pl.ds(off, ET), :, :] = Xf
                else:
                    Xp = xp_ref[pl.ds(off, ET), :, :]
                    Xf = xf_ref[pl.ds(off, ET), :, :]

                if pcg_vpu:
                    # solves happen post-loop over the full EL batch on the
                    # VPU; the loop only assembles and stores the systems
                    apd_ref[pl.ds(off, ET), :, :] = A_pd
                    afd_ref[pl.ds(off, ET), :, :] = A_fd
                else:
                    # pcg_vpu_sub: VPU matvecs on the locally-assembled
                    # (ET,NP,NP) systems — no full-EL A staging buffers, so
                    # the VPU formulation fits big trees (NP=160) where the
                    # deferred pcg_vpu path exceeds VMEM
                    solve = pcg_v if pcg_vpu_sub else _pcg
                    qacc_des = solve(A_pd, rhs_pd_s * R_VAL, Xp, pcg_pd)
                    tau = jnp.clip(pd_a_s - kd_i_s * dt * qacc_des,
                                   -R_TL, R_TL) * R_JNT
                    qacc = solve(A_fd, (rhs_b_s + tau) * R_VAL, Xf,
                                 pcg_fd)
                    qvn = (qveld_s + dt * qacc) * R_VAL
                    qvnew_ref[pl.ds(off, ET), :] = qvn
                return carry

            jax.lax.fori_loop(0, SUB, sub_body, 0)

            if pcg_vpu:
                # ---------- full-EL env-major PCG on the VPU ---------------
                # The batched MXU matvec in _pcg has N=1 (one rhs per env):
                # ~0.2 % MXU utilization, pure latency. Here the matvec is
                # an elementwise (EL,NP,NP) multiply + lane reduction —
                # ~800 full vregs per matvec, no transposes needed.
                Apd_f = apd_ref[:]
                Afd_f = afd_ref[:]
                Xp_f = xp_ref[:]
                Xf_f = xf_ref[:]
                vv_f = vecs_ref[:]
                rhs_pd_f = vv_f[:, 6 * NP:7 * NP]
                pd_a_f = vv_f[:, 7 * NP:8 * NP]
                rhs_b_f = vv_f[:, 8 * NP:9 * NP]
                kd_f = vv_f[:, 9 * NP:10 * NP]
                qveld_f = vv_f[:, 11 * NP:12 * NP]

                qacc_des = pcg_v(Apd_f, rhs_pd_f * R_VAL, Xp_f, pcg_pd)
                tau = jnp.clip(pd_a_f - kd_f * dt * qacc_des,
                               -R_TL, R_TL) * R_JNT
                qacc = pcg_v(Afd_f, (rhs_b_f + tau) * R_VAL, Xf_f,
                             pcg_fd)
                qvnew_ref[:] = (qveld_f + dt * qacc) * R_VAL

            # ---------- integrate (lane-major; v2 892-915) -----------------
            qvd = _dg(qvnew_ref[:], iel, 0, 0)       # (NP, EL)
            V3 = _dg(K_S3, qvd, 1, 0)                # [vz;vy;vx] in one op
            vz_n = V3[0:nb]
            vy_n = V3[nb:2 * nb]
            vx_n = V3[2 * nb:3 * nb]
            rv_n = (qvd[0:1], qvd[1:2], qvd[2:3])
            rw_n = (qvd[3:4], qvd[4:5], qvd[5:6])
            jz_n = jz + dt * vz_n
            jy_n = jy + dt * vy_n
            jx_n = jx + dt * vx_n
            rp_n = (rp[0] + dt * rv_n[0], rp[1] + dt * rv_n[1],
                    rp[2] + dt * rv_n[2])
            angx = rw_n[0] * dt
            angy = rw_n[1] * dt
            angz = rw_n[2] * dt
            ang = jnp.sqrt(angx**2 + angy**2 + angz**2 + 1e-24)
            sa_ = jnp.sin(0.5 * ang) / ang
            dq = (jnp.cos(0.5 * ang), angx * sa_, angy * sa_, angz * sa_)
            rq2 = _qmul(rqn, dq)
            n2 = jax.lax.rsqrt(rq2[0]**2 + rq2[1]**2 + rq2[2]**2
                               + rq2[3]**2 + 1e-12)
            rq_n = tuple(t * n2 for t in rq2)
            return (jz_n, jy_n, jx_n, vz_n, vy_n, vx_n, rp_n, rq_n,
                    rv_n, rw_n)

        state = (jz0, jy0, jx0, vz0, vy0, vx0, rp0, rq0, rv0, rw0)

        if cond_inv:
            # one loop over ALL substeps; the inverse pair runs under
            # pl.when(it == 0 [or refresh_at]) so its code is compiled once
            def loop_body_c(it, st):
                if MPJ:
                    ks, ds = kps, kds      # per-dof, constant over substeps
                else:
                    row_fs = jax.lax.broadcasted_iota(jnp.int32, (FSP, 1), 0)
                    ks = jnp.sum(jnp.where(row_fs == it, kps, 0.0), axis=0,
                                 keepdims=True)
                    ds = jnp.sum(jnp.where(row_fs == it, kds, 0.0), axis=0,
                                 keepdims=True)
                pred = it == 0
                if refresh_at is not None:
                    pred = jnp.logical_or(pred, it == refresh_at)
                return one_substep(st, ks, ds, False, inv_pred=pred)

            state = jax.lax.fori_loop(0, FS, loop_body_c, state)
        else:
            state = one_substep(state, kps if MPJ else kps[0:1],
                                kds if MPJ else kds[0:1], True)

            def loop_body(it, st):
                if MPJ:
                    ks, ds = kps, kds
                else:
                    row_fs = jax.lax.broadcasted_iota(jnp.int32, (FSP, 1), 0)
                    ks = jnp.sum(jnp.where(row_fs == it, kps, 0.0), axis=0,
                                 keepdims=True)
                    ds = jnp.sum(jnp.where(row_fs == it, kds, 0.0), axis=0,
                                 keepdims=True)
                return one_substep(st, ks, ds, False)

            if refresh_at is None:
                state = jax.lax.fori_loop(1, FS, loop_body, state)
            else:
                # mid-window preconditioner refresh: one extra exact-inverse
                # substep at `refresh_at` halves the staleness the PCG must
                # correct (enables the PCG-(1,1) schedule; see docstring)
                state = jax.lax.fori_loop(1, refresh_at, loop_body, state)
                state = one_substep(
                    state, kps if MPJ else kps[refresh_at:refresh_at + 1],
                    kds if MPJ else kds[refresh_at:refresh_at + 1], True)
                state = jax.lax.fori_loop(refresh_at + 1, FS, loop_body,
                                          state)
        (jz, jy, jx, vz, vy, vx, rp, rq, rv, rw) = state

        root_o[:] = jnp.concatenate(
            [rp[0], rp[1], rp[2], rq[0], rq[1], rq[2], rq[3],
             rv[0], rv[1], rv[2], rw[0], rw[1], rw[2],
             jnp.zeros((3, EL), F32)], axis=0)
        jz_o[:] = jz
        jy_o[:] = jy
        jx_o[:] = jx
        vz_o[:] = vz
        vy_o[:] = vy
        vx_o[:] = vx

    # ---- host-side wrapper ------------------------------------------------
    packs = [jnp.asarray(pk) for pk in
             (CBT, CLT, CLR, CS, CPar, CE, CBR, CC3, CG_AB, CP_AB,
              np.asarray(RSc), SCP, IEL)]
    pack_shapes = [tuple(p.shape) for p in packs]

    @jax.jit
    def do_simulation(qpos, qvel, actions, target_base, rfc_rate,
                      seq_idx=None):
        if per_env and seq_idx is None:
            raise ValueError("per-env lane kernel needs seq_idx (B,)")
        B = qpos.shape[0]
        Bp = -(-B // EL) * EL
        dtype = F32

        if cfg.meta_pd:
            meta = actions[:, ndof + vf_dim: ndof + vf_dim + meta_dim]
            kps = jnp.clip(meta[:, :FS] + 1.0, 0.0, 10.0)
            kds = jnp.clip(meta[:, FS:] + 1.0, 0.0, 10.0)
            kps = jnp.pad(kps, ((0, 0), (0, FSP - FS)))
            kds = jnp.pad(kds, ((0, 0), (0, FSP - FS)))
        elif MPJ:
            # per-dof scales in qvel-space layout (root dofs at 0..5 are
            # unscaled — T_JKP is zero there anyway)
            meta = actions[:, ndof + vf_dim: ndof + vf_dim + meta_dim]
            kps = jnp.ones((B, NP), dtype).at[:, 6:6 + ndof].set(
                jnp.clip(meta[:, :ndof] + 1.0, 0.0, 10.0))
            kds = jnp.ones((B, NP), dtype).at[:, 6:6 + ndof].set(
                jnp.clip(meta[:, ndof:] + 1.0, 0.0, 10.0))
        else:
            kps = jnp.ones((B, FSP), dtype)
            kds = jnp.ones((B, FSP), dtype)

        if cfg.residual_force and vf_dim and not VFX:
            vf = actions[:, ndof:ndof + vf_dim] * (
                cfg.residual_force_scale * rfc_rate)
        else:
            vf = jnp.zeros((B, 6), dtype)
        vf = jnp.pad(vf, ((0, 0), (0, 8 - vf.shape[1])))
        if VFX:
            # mirror env_step's host-side prep (humanoid_im.py:182-212):
            # per-slot hull projection + scale; reference rfc_explicit
            # (:1110) uses residual_force_scale alone (no rfc_rate). With
            # num_each > 1 the per-slot forces fold exactly into one wrench
            # per body: τ_eff = Σ_idx (t_idx + cp_idx × f_idx) at cp = 0
            # (rotation preserves cross products).
            from uhc_tpu.physics.engine import prep_explicit_vf
            vfb = jax.vmap(lambda a: prep_explicit_vf(model, cfg, a, nb))(
                actions[:, ndof:ndof + vf_dim])          # (B, nb, 9)
            vfx = jnp.concatenate(
                [vfb[:, :, c] for c in range(9)], axis=1)  # (B, 9nb)

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
        if VFX:
            args.append(vfx)
        if Bp != B:
            args = [jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (Bp - B,) + a.shape[1:])], 0)
                for a in args]
        # rotate to lane-major: rows = feature, lanes = envs
        args = [a.astype(dtype).T for a in args]

        KW = NP if MPJ else FSP
        widths = [16, nb, nb, nb, nb, nb, nb, NP, NP, KW, KW, 8]
        if VFX:
            widths.append(9 * nb)
        state_w = [16, nb, nb, nb, nb, nb, nb]
        cparams = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)

        in_specs = [pl.BlockSpec((w, EL), lambda g: (0, g),
                                 memory_space=pltpu.VMEM) for w in widths]
        if per_env:
            # gather each env's shape tables by sequence index and rotate
            # them lane-major ((..., Bp): envs in lanes, like every other
            # dynamic operand); MASSR stays env-major for the sub-tile loop
            idx = jnp.asarray(seq_idx, jnp.int32)
            gath = [lib[idx] for lib in libs]    # leading (B, ...) each
            if Bp != B:
                gath = [jnp.concatenate(
                    [g, jnp.broadcast_to(g[:1], (Bp - B,) + g.shape[1:])],
                    0) for g in gath]
            pe_args = [jnp.moveaxis(g, 0, -1).astype(dtype)
                       for g in gath[:-1]] + [gath[-1].astype(dtype)]
            args += pe_args
            pe_shapes = [(14, nb), (2, NP), (3 * nb, K), (nb, 3 * SCN),
                         (CN,)]
            if pe_csc:
                pe_shapes.append((3,))
            in_specs += [pl.BlockSpec(s + (EL,),
                                      lambda g, n=len(s): (0,) * n + (g,),
                                      memory_space=pltpu.VMEM)
                         for s in pe_shapes]
            in_specs += [pl.BlockSpec((EL, nb), lambda g: (g, 0),
                                      memory_space=pltpu.VMEM)]
        in_specs += [pl.BlockSpec(s, lambda g, n=len(s): (0,) * n,
                                  memory_space=pltpu.VMEM)
                     for s in pack_shapes]
        out_specs = [pl.BlockSpec((w, EL), lambda g: (0, g),
                                  memory_space=pltpu.VMEM) for w in state_w]
        outs = pl.pallas_call(
            kernel,
            grid=(Bp // EL,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((w, Bp), dtype)
                       for w in state_w],
            scratch_shapes=[
                pltpu.VMEM((EL, CW_LIST_LEN * nb), dtype),
                pltpu.VMEM((EL, NVEC * NP), dtype),
                pltpu.VMEM((EL, NP), dtype),
                pltpu.VMEM((EL, NP, NP), dtype),
                pltpu.VMEM((EL, NP, NP), dtype),
                # A_pd/A_fd staging exists only for the deferred full-EL
                # VPU-PCG; without it the refs are never touched, and
                # skipping the two (EL,NP,NP) buffers is what lets large
                # trees (masterfoot NP=160) fit the v5e VMEM budget.
                pltpu.VMEM((EL, NP, NP) if pcg_vpu else (8, 128), dtype),
                pltpu.VMEM((EL, NP, NP) if pcg_vpu else (8, 128), dtype),
            ],
            compiler_params=cparams,
            interpret=interpret,
        )(*(args + packs))

        root_o = outs[0].T[:B]
        jz_o, jy_o, jx_o, vz_o, vy_o, vx_o = [o.T[:B] for o in outs[1:7]]
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
