"""Motion pkl -> MuJoCo qpos conversion/playback — scripts/smpl_rig_convert.py
twin.

The reference script loads a mocap result pkl, converts SMPL poses to qpos
(smpl_to_qpose) and plays them back in an interactive MjViewer. TPU-host
equivalent: convert and dump the qpos track (npz or pkl), optionally render
a headless gif/mp4 via utils.visualizer.

Usage:
  python -m uhc_tpu.cli.smpl_rig_convert --data <motion pkl> --out out.npz \
      [--offset-z 0.0] [--render out.gif] [--ball]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.getcwd())

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--offset-z", type=float, default=0.0)
    p.add_argument("--ball", action="store_true",
                   help="ball-joint (quaternion) qpos layout")
    p.add_argument("--render", default=None,
                   help="write a headless gif/mp4 of the first sequence")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from uhc_tpu.data.dataset import load_motion_file
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.convert import smpl_to_qpose, smpl_to_qpose_ball
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(args.data)

    out = {}
    for key, d in seqs.items():
        pose_aa = np.asarray(d["pose_aa"])
        if pose_aa.shape[-1] > 72:
            pose_aa = np.concatenate(
                [pose_aa[:, :66],
                 np.zeros((len(pose_aa), 6), pose_aa.dtype)], -1)
        trans = d.get("trans")
        conv = smpl_to_qpose_ball if args.ball else smpl_to_qpose
        qpos = np.array(jax.device_get(
            conv(pose_aa, model.body_pos[0], trans)))
        qpos[:, 2] += args.offset_z
        out[key] = qpos

    if args.out.endswith(".npz"):
        np.savez(args.out, **out)
    else:
        import joblib
        joblib.dump(out, args.out)
    print(f"wrote {len(out)} qpos tracks -> {args.out}")

    if args.render:
        import dataclasses

        from uhc_tpu.utils.visualizer import render_eval_result
        key = next(iter(out))
        t = (dataclasses.replace(topo, joint_kind="ball") if args.ball
             else topo)
        render_eval_result(t, model, jnp.asarray(out[key]),
                           out_path=args.render)
        print(f"rendered {key} -> {args.render}")


if __name__ == "__main__":
    main()
