"""Headless SMPL-rig renderer — scripts/render_smpl_rig.py twin.

The reference loads a motion pkl, converts 6d rotations to axis-angle, and
renders each sequence to mp4 through the OpenGL SMPL_M_Renderer
(render_smpl_rig.py:36-47). On a headless TPU host the equivalent artifact
is the matplotlib skeleton video: pose -> qpos (smpl_to_qpose) -> engine FK
-> utils.visualizer.render_comparison.

Usage:
  python -m uhc_tpu.cli.render_smpl_rig --data <motion pkl> \
      --output-dir renders/ [--max-seqs 3] [--max-frames 150] [--fmt gif]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.getcwd())

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="motion pkl (pose_aa or "
                   "pose_6d + trans per sequence)")
    p.add_argument("--output-dir", default="renders")
    p.add_argument("--max-seqs", type=int, default=None)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--fmt", default="gif", choices=("gif", "mp4", "png"))
    p.add_argument("--stride", type=int, default=2)
    args = p.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from uhc_tpu.data.dataset import load_motion_file
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.convert import smpl_to_qpose
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
    from uhc_tpu.utils.visualizer import render_eval_result

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(args.data)
    os.makedirs(args.output_dir, exist_ok=True)

    done = 0
    for key, seq in seqs.items():
        if args.max_seqs is not None and done >= args.max_seqs:
            break
        pose_aa = np.asarray(seq["pose_aa"], np.float32)
        trans = np.asarray(seq.get("trans",
                                   np.zeros((len(pose_aa), 3))), np.float32)
        if args.max_frames:
            pose_aa, trans = (pose_aa[:args.max_frames],
                              trans[:args.max_frames])
        qpos = np.asarray(smpl_to_qpose(pose_aa, model.body_pos[0], trans))
        safe = key.replace("/", "_").replace(" ", "_")
        out = os.path.join(args.output_dir, f"{safe}.{args.fmt}")
        path = render_eval_result(topo, model, jnp.asarray(qpos),
                                  out_path=out, stride=args.stride)
        print(f"{key}: {len(qpos)} frames -> {path}")
        done += 1


if __name__ == "__main__":
    main()
