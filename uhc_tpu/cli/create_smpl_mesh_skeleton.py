"""SMPL mesh-skeleton model builder — scripts/create_smpl_mesh_skeleton.py
twin.

The reference builds a zero-pose SMPL skeleton (SMPL_Parser joint offsets ->
SkeletonMesh with convex-hull geoms -> humanoid_smpl_<gender>_mesh_test.xml)
plus a multi-humanoid visualization model via create_vis_model
(create_smpl_mesh_skeleton.py:30-100). Here both come from the framework's
array pipeline: the sim model through smpl.robot/mjcf_export and the vis
scene through export_vis_mjcf (export_vis_string equivalent,
smpl_robot.py:1490).

Usage:
  python -m uhc_tpu.cli.create_smpl_mesh_skeleton --out-dir models/ \
      [--gender neutral] [--smpl-data smpl.pkl] [--num-vis 2]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.getcwd())

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out-dir", required=True)
    p.add_argument("--gender", default="neutral")
    p.add_argument("--smpl-data", default=None,
                   help="SMPL model pkl/npz for exact zero-pose offsets")
    p.add_argument("--num-vis", type=int, default=2,
                   help="humanoid copies in the vis scene")
    args = p.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
    from uhc_tpu.smpl.mjcf_export import export_mjcf, export_vis_mjcf

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    if args.smpl_data is not None:
        from uhc_tpu.smpl.lbs import load_smpl_data, vertex_body_assignment
        from uhc_tpu.smpl.robot import model_from_betas

        data = load_smpl_data(args.smpl_data)
        nb = int(np.asarray(data.shapedirs).shape[-1])
        model = model_from_betas(topo, model, data,
                                 jnp.zeros(nb, jnp.float32),
                                 vertex_body_assignment(data))

    os.makedirs(args.out_dir, exist_ok=True)
    sim_path = os.path.join(args.out_dir,
                            f"humanoid_smpl_{args.gender}_mesh_test.xml")
    vis_path = os.path.join(args.out_dir,
                            f"humanoid_smpl_{args.gender}_mesh_vis.xml")
    with open(sim_path, "w") as f:
        f.write(export_mjcf(topo, model))
    with open(vis_path, "w") as f:
        f.write(export_vis_mjcf(topo, model, num=args.num_vis))
    total_mass = float(np.sum(np.asarray(model.body_mass)))
    print(f"sim model -> {sim_path} (mass {total_mass:.2f} kg)")
    print(f"vis model -> {vis_path} ({args.num_vis} humanoids)")


if __name__ == "__main__":
    main()
