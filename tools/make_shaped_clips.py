"""Beta-varied copies of a motion library for shape-conditioned training.

The reference trains uhc_implicit_shape on AMASS, where every sequence
carries its captured SMPL betas (dataset_amass_single.py pkl fields) and
the robot is rebuilt per episode (humanoid_im.py:154-180 reset_robot). With
AMASS absent from this image, this tool manufactures the shape axis: each
input clip is copied K times with random betas drawn for the synthetic
blendshape basis (lbs.synthetic_smpl_data_like — anatomically consistent
around the neutral skeleton), and each copy's `trans` is height-corrected
so the shaped body's lowest ground-contact point matches the neutral
body's clearance profile (the process_amass_db.py:194 fix_height analogue;
without it a longer-/shorter-legged variant floats or penetrates and the
policy learns to fight the ground).

Usage:
  python tools/make_shaped_clips.py --data sample_data/gait_clips.pkl \
      --out sample_data/gait_clips_shaped.pkl --variants 3 [--beta-scale 1.0]
"""
import argparse
import os
import sys

sys.path.insert(0, os.getcwd())
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import joblib
import numpy as np

import jax
import jax.numpy as jnp

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


def lowest_contact_z(topo, model, qpos_seq):
    """min over frames/points of the world z of the model's ground-contact
    candidates along the clip."""
    from uhc_tpu.maths import quat_rotate
    from uhc_tpu.physics import engine as E

    def one(q):
        kin = E.fk(topo, model, q)
        wp = kin["xpos"][:, None] + quat_rotate(kin["xquat"][:, None],
                                                model.contact_point)
        big = jnp.asarray(1e9, q.dtype)
        return jnp.min(jnp.where(model.contact_mask > 0, wp[..., 2], big))

    return float(jnp.min(jax.vmap(one)(jnp.asarray(qpos_seq))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--variants", type=int, default=3,
                   help="shaped copies per clip (betas ~ N(0, beta_scale))")
    p.add_argument("--beta-scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--keep-original", action="store_true", default=True)
    args = p.parse_args()

    from uhc_tpu.data.dataset import load_motion_file
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.convert import smpl_to_qpose
    from uhc_tpu.smpl.lbs import (synthetic_smpl_data_like,
                                  vertex_body_assignment)
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
    from uhc_tpu.smpl.robot import model_from_betas

    topo, base = load_mjcf_humanoid(XML)
    base = model_to_dtype(base, jnp.float32)
    sd = synthetic_smpl_data_like(topo, base)
    assign = vertex_body_assignment(sd)
    rng = np.random.default_rng(args.seed)

    seqs = load_motion_file(args.data)
    out = {}
    for key, d in seqs.items():
        pose_aa = np.asarray(d["pose_aa"], np.float32)
        trans = np.asarray(d.get("trans",
                                 np.zeros((len(pose_aa), 3))), np.float32)
        if args.keep_original:
            out[key] = dict(d)
        # neutral clearance profile for this clip
        q_neutral = np.asarray(smpl_to_qpose(pose_aa, base.body_pos[0],
                                             trans))
        z_neutral = lowest_contact_z(topo, base, q_neutral)
        for v in range(args.variants):
            beta = rng.normal(scale=args.beta_scale, size=16).astype(
                np.float32)
            m = model_from_betas(topo, base, sd, jnp.asarray(beta), assign)
            q_shaped = np.asarray(smpl_to_qpose(pose_aa, m.body_pos[0],
                                                trans))
            z_shaped = lowest_contact_z(topo, m, q_shaped)
            dz = z_neutral - z_shaped
            t2 = trans.copy()
            t2[:, 2] += dz
            out[f"{key}_shape{v}"] = {
                "pose_aa": pose_aa, "trans": t2,
                "beta": beta, "gender": "neutral",
            }
            print(f"{key}_shape{v}: dz={dz:+.4f} m "
                  f"mass={float(np.sum(np.asarray(m.body_mass))):.1f} kg")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    joblib.dump(out, args.out)
    print(f"wrote {len(out)} clips -> {args.out}")


if __name__ == "__main__":
    main()
