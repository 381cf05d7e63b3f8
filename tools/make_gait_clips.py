#!/usr/bin/env python3
"""Generate dynamic, contact-rich motion clips for imitation training.

AMASS pkls are not present in this image (only standing_neutral.pkl), so
dynamic training data is synthesized: scripted gaits authored as joint-angle
trajectories, with the root trajectory derived kinematically so the clips
are physically consistent:

  * joint sinusoids (hips/knees/ankles + counter-swinging arms) define the
    limb motion;
  * the ROOT x/y/heading comes from anchoring the stance foot: per frame the
    lower foot is treated as fixed to the ground and the root velocity is
    the negative of that foot's root-frame velocity (soft-blended between
    feet), which produces stride-consistent, skate-free locomotion;
  * the root z keeps the lowest foot contact point at ground level.

Output: a reference-format motion pkl {key: {pose_aa (T,72), trans (T,3)}}
(dataset_amass_single.py layout) consumable by load_motion_file.

Usage: python tools/make_gait_clips.py [--out sample_data/gait_clips.pkl]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
NEUTRAL = "/root/reference/sample_data/standing_neutral.pkl"
FPS = 30.0


def build_base():
    import joblib
    import jax.numpy as jnp

    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    neutral = joblib.load(NEUTRAL)
    base_qpos = np.asarray(neutral["qpos"], np.float64).reshape(-1)
    return topo, model, base_qpos


def joint_slices(topo):
    names = list(topo.body_names)
    return {n: slice(7 + 3 * (names.index(n) - 1),
                     7 + 3 * (names.index(n) - 1) + 3) for n in names[1:]}


def fk_feet(topo, model, qpos_seq):
    """World foot-contact extremes with the engine's own FK (root as given).
    Returns per-frame (T, 2, 3) toe/ankle midfoot points and min contact z
    per frame per side."""
    import jax
    import jax.numpy as jnp

    from uhc_tpu.physics import engine as E

    names = list(topo.body_names)
    sides = []
    for s in ("L", "R"):
        sides.append([names.index(f"{s}_Ankle"), names.index(f"{s}_Toe")])

    @jax.jit
    def run(qs):
        def one(q):
            kin = E.fk(topo, model, q)
            wp = kin["xpos"][:, None] + jax.vmap(
                lambda qq, cp: jax.vmap(
                    lambda c: E.quat_rotate(qq, c))(cp))(
                kin["xquat"], model.contact_point)
            # per-side lowest contact point, softmin-blended over the
            # near-lowest points (~1 cm scale): a hard argmin switches
            # contact-point IDENTITY between frames (toe<->heel hull
            # points), making a planted foot appear to move at ~2 m/s —
            # which anchor_root then integrated into a 69 mm root jump at
            # the start of the wide side-step (RESULTS.md r5 diagnosis)
            out = []
            for bods in sides:
                pts = jnp.concatenate([wp[b] for b in bods], axis=0)
                msk = jnp.concatenate([model.contact_mask[b] for b in bods])
                z = jnp.where(msk > 0, pts[:, 2], 1e9)
                ww = jnp.where(msk > 0,
                               jnp.exp(-(z - z.min()) / 0.01), 0.0)
                ww = ww / jnp.maximum(ww.sum(), 1e-9)
                out.append((ww[:, None] * pts).sum(0))
            return jnp.stack(out)                     # (2, 3)
        return jax.vmap(one)(qs)

    return np.asarray(jax.device_get(run(jnp.asarray(qpos_seq))))


def anchor_root(topo, model, qpos_seq, stance_w=None):
    """Derive root x/y/z from stance-foot anchoring, keeping the lowest
    contact point at the ground. `stance_w` (T, 2) are the authored
    analytic stance weights (L, R); geometric soft-blend by foot height is
    the fallback."""
    T = qpos_seq.shape[0]
    feet = fk_feet(topo, model, qpos_seq)            # root at authored pose
    z = feet[:, :, 2]
    if stance_w is not None:
        w = stance_w
    else:
        # lower foot dominates (soft blend, ~2 cm scale)
        w = np.exp(-z / 0.02)
    w = w / np.maximum(w.sum(1, keepdims=True), 1e-6)
    # root-frame foot velocity -> negative root velocity
    vel_feet = np.gradient(feet[:, :, :2], axis=0) * FPS     # (T, 2, 2)
    # np.gradient's one-sided EDGE differences put the full first/last
    # stride-phase velocity into frame 0/T-1; on high-amplitude gaits
    # (side=0.45) that authored a 69 mm root jump between frames 0-1
    # (2.08 m/s for one frame, then 0.2) — an init transient a physical
    # controller cannot brake, which cost side_step_wide its full-clip
    # success (RESULTS.md). Replicate the interior velocity at the edges.
    if len(vel_feet) > 2:
        vel_feet[0] = vel_feet[1]
        vel_feet[-1] = vel_feet[-2]
    v_root = -(w[:, :, None] * vel_feet).sum(1)              # (T, 2)
    xy = np.cumsum(v_root / FPS, axis=0)
    # remove secular lateral drift (weighting asymmetries accumulate a slow
    # sideways creep; periodic sway is kept — it is real gait dynamics)
    disp = xy[-1]
    n = np.linalg.norm(disp)
    if n > 0.3:
        u = disp / n
        lat = np.array([-u[1], u[0]])
        drift = (xy @ lat)
        ramp = np.linspace(0.0, drift[-1], T)
        xy = xy - np.outer(drift * 0 + ramp, lat)
        # also detrend the residual linear part of the lateral component
        coef = np.polyfit(np.arange(T), xy @ lat, 1)
        xy = xy - np.outer(np.polyval(coef, np.arange(T)), lat)
    out = qpos_seq.copy()
    out[:, 0:2] += xy
    # ground clearance: lowest contact point sits at z = 0 during stance
    zmin = z.min(1)
    out[:, 2] -= zmin - 0.002
    return out


def quat_mul_np(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def apply_heading(qpos_seq, yaw_rate):
    """Rotate the whole trajectory by an integrated heading (turning)."""
    T = qpos_seq.shape[0]
    yaw = np.cumsum(np.full(T, yaw_rate / FPS))
    out = qpos_seq.copy()
    # rotate root quat and the accumulated xy displacement per step
    xy = np.zeros(2)
    prev = qpos_seq[0, 0:2]
    for t in range(T):
        if t > 0:
            d = qpos_seq[t, 0:2] - prev
            c, s = np.cos(yaw[t]), np.sin(yaw[t])
            xy = xy + np.array([c * d[0] - s * d[1], s * d[0] + c * d[1]])
            prev = qpos_seq[t, 0:2]
        out[t, 0:2] = qpos_seq[0, 0:2] + xy
        hq = np.array([np.cos(yaw[t] / 2), 0, 0, np.sin(yaw[t] / 2)])
        out[t, 3:7] = quat_mul_np(hq, qpos_seq[t, 3:7])
    return out


def make_walk(topo, base_qpos, T=240, f=1.4, hipA=0.42, kneeA=0.62,
              ankleA=0.18, armA=0.28, side=0.0, crouch=0.0):
    """Sagittal walk: hip/knee/ankle sinusoids, arms counter-swing.
    `side`≠0 turns the gait into lateral stepping (sign = direction);
    `hipA`<0 reverses the stride (backward walk); `crouch`>0 adds a
    constant knee/hip flexion (crouched gait)."""
    js = joint_slices(topo)
    t = np.arange(T) / FPS
    ph = 2 * np.pi * f * t
    q = np.tile(base_qpos, (T, 1))
    stance_w = np.zeros((T, 2))

    for col, (s, sign) in enumerate((("L", 0.0), ("R", np.pi))):
        swing = np.sin(ph + sign)
        lift = np.clip(np.sin(ph + sign + np.pi / 2), 0, None)
        # analytic stance weight: a foot supports while it is NOT lifting
        stance_w[:, col] = np.clip(-np.sin(ph + sign + np.pi / 2), 0.05, None)
        # SMPL local frames: leg flexion is rotation about the x axis
        # (z-y-x euler triples; x is the last entry)
        q[:, js[f"{s}_Hip"].start + 2] += -hipA * swing
        if side != 0.0:  # lateral stepping: abduct instead of flex
            q[:, js[f"{s}_Hip"].start + 2] += hipA * swing  # undo
            q[:, js[f"{s}_Hip"].start + 1] += \
                side * swing * (1 if s == "L" else -1)
        q[:, js[f"{s}_Knee"].start + 2] += abs(kneeA) * lift
        q[:, js[f"{s}_Ankle"].start + 2] += \
            -ankleA * np.sin(ph + sign - np.pi / 4)
        if crouch > 0.0:
            q[:, js[f"{s}_Hip"].start + 2] += -0.6 * crouch
            q[:, js[f"{s}_Knee"].start + 2] += 1.2 * crouch
            q[:, js[f"{s}_Ankle"].start + 2] += -0.45 * crouch
        arm = "L" if s == "R" else "R"
        q[:, js[f"{arm}_Shoulder"].start + 2] += armA * swing
        q[:, js[f"{arm}_Elbow"].start + 2] += 0.3 * armA * np.clip(
            swing, 0, None)
    if crouch > 0.0:
        q[:, js["Torso"].start + 2] += 0.2 * crouch
    return q, stance_w


def make_squat(topo, base_qpos, T=210, f=0.5, depth=0.9):
    js = joint_slices(topo)
    t = np.arange(T) / FPS
    bend = depth * 0.5 * (1 - np.cos(2 * np.pi * f * t))
    q = np.tile(base_qpos, (T, 1))
    for s in ("L", "R"):
        q[:, js[f"{s}_Hip"].start + 2] += -0.85 * bend
        q[:, js[f"{s}_Knee"].start + 2] += 1.7 * bend
        q[:, js[f"{s}_Ankle"].start + 2] += -0.55 * bend
    q[:, js["Torso"].start + 2] += 0.25 * bend
    for s in ("L", "R"):
        q[:, js[f"{s}_Shoulder"].start + 2] += 0.9 * bend  # arms forward
    return q


def make_march(topo, base_qpos, T=240, f=1.6, hipA=0.85, kneeA=1.0):
    """High-knee marching in place — strong foot-strike dynamics."""
    js = joint_slices(topo)
    t = np.arange(T) / FPS
    ph = 2 * np.pi * f * t
    q = np.tile(base_qpos, (T, 1))
    stance_w = np.zeros((T, 2))
    for col, (s, sign) in enumerate((("L", 0.0), ("R", np.pi))):
        lift = np.clip(np.sin(ph + sign), 0, None)
        stance_w[:, col] = np.clip(-np.sin(ph + sign), 0.05, None)
        q[:, js[f"{s}_Hip"].start + 2] += -hipA * lift
        q[:, js[f"{s}_Knee"].start + 2] += kneeA * lift
        arm = "L" if s == "R" else "R"
        q[:, js[f"{arm}_Shoulder"].start + 2] += 0.35 * lift
    return q, stance_w


def to_smpl(qpos_seq, model):
    import jax
    import jax.numpy as jnp

    from uhc_tpu.smpl.convert import qpos_to_smpl

    aa, trans = qpos_to_smpl(jnp.asarray(qpos_seq, jnp.float32),
                             model.body_pos[0])
    aa = np.asarray(jax.device_get(aa)).reshape(qpos_seq.shape[0], -1)
    return aa.astype(np.float32), np.asarray(
        jax.device_get(trans)).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="sample_data/gait_clips.pkl")
    p.add_argument("--tpu", action="store_true",
                   help="run the FK on the TPU (default: host CPU — this "
                        "jax build ignores JAX_PLATFORMS, so the CPU "
                        "backend must be forced in-process)")
    p.add_argument("--extended", action="store_true",
                   help="19-clip library (speeds, directions, turn rates, "
                        "crouch, squat/march variants) instead of the "
                        "6-clip core suite")
    args = p.parse_args()

    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import joblib

    topo, model, base = build_base()
    clips = {}

    def walk(**kw):
        q, w = make_walk(topo, base, **kw)
        return anchor_root(topo, model, q, w)

    def march():
        q, w = make_march(topo, base)
        return anchor_root(topo, model, q, w)

    specs = {
        "walk_forward": lambda: walk(),
        "walk_slow": lambda: walk(f=1.0, hipA=0.3, kneeA=0.45),
        "walk_turn": lambda: apply_heading(walk(), yaw_rate=0.5),
        "side_step": lambda: walk(hipA=0.22, side=0.3),
        "squat": lambda: anchor_root(topo, model, make_squat(topo, base)),
        "march": march,
    }
    if args.extended:
        specs.update({
            "walk_fast": lambda: walk(f=1.8, hipA=0.5, kneeA=0.7,
                                      armA=0.35),
            "jog": lambda: walk(f=2.2, hipA=0.55, kneeA=0.95, armA=0.45),
            "walk_stride": lambda: walk(f=1.1, hipA=0.55, kneeA=0.7),
            "walk_turn_right": lambda: apply_heading(walk(),
                                                     yaw_rate=-0.5),
            "walk_turn_sharp": lambda: apply_heading(walk(f=1.2),
                                                     yaw_rate=0.9),
            "walk_backward": lambda: walk(hipA=-0.35, kneeA=0.5),
            "walk_crouch": lambda: walk(f=1.2, hipA=0.35, crouch=0.45),
            "side_step_right": lambda: walk(hipA=0.22, side=-0.3),
            "side_step_wide": lambda: walk(f=1.1, hipA=0.25, side=0.45),
            "squat_deep": lambda: anchor_root(
                topo, model, make_squat(topo, base, depth=1.2, f=0.4)),
            "squat_fast": lambda: anchor_root(
                topo, model, make_squat(topo, base, depth=0.7, f=0.8)),
            "march_fast": lambda: anchor_root(
                topo, model, *make_march(topo, base, f=2.0)),
            "march_low": lambda: anchor_root(
                topo, model, *make_march(topo, base, hipA=0.5, kneeA=0.6)),
        })
    for key, fn in specs.items():
        q = fn()
        aa, trans = to_smpl(q, model)
        clips[f"0-SYN_{key}"] = {"pose_aa": aa, "trans": trans,
                                 "beta": np.zeros(16, np.float32),
                                 "gender": "neutral"}
        print(f"{key}: T={len(aa)} dx={q[-1,0]-q[0,0]:+.2f}m "
              f"dy={q[-1,1]-q[0,1]:+.2f}m zmin={q[:,2].min():.3f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    joblib.dump(clips, args.out)
    print(f"wrote {len(clips)} clips -> {args.out}")


if __name__ == "__main__":
    main()
