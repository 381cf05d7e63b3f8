"""Generate a SMPL humanoid MJCF — scripts/create_smpl_humanoid.py twin.

The reference script builds a skeleton MJCF from SMPL zero-pose joint
offsets and loads it into MuJoCo for visual checking. Here the model
arrays come from the framework's own pipeline (real SMPL data when
--smpl-data is given, otherwise the bundled neutral mesh model), variants
(bigfoot/masterfoot/smplh/ball) apply as array transforms, and the result
exports through smpl.mjcf_export.

Usage:
  python -m uhc_tpu.cli.create_smpl_humanoid --out humanoid.xml \
      [--smpl-data smpl_neutral.pkl] [--betas 0.5,0,...] \
      [--variant none|bigfoot|masterfoot|smplh|smplx]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.getcwd())

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--smpl-data", default=None,
                   help="SMPL(-H) model pkl/npz for exact shaped offsets")
    p.add_argument("--betas", default=None,
                   help="comma-separated shape coefficients")
    p.add_argument("--variant", default="none",
                   choices=["none", "bigfoot", "masterfoot", "smplh",
                            "smplx", "ball"])
    args = p.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
    from uhc_tpu.smpl.mjcf_export import export_mjcf

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)

    if args.smpl_data is not None:
        betas = (np.array([float(x) for x in args.betas.split(",")],
                          np.float32) if args.betas else np.zeros(10,
                                                                  np.float32))
        if args.variant in ("smplh", "smplx"):
            from uhc_tpu.smpl.lbs import load_smplh_data
            data = load_smplh_data(args.smpl_data)
        else:
            from uhc_tpu.smpl.lbs import (load_smpl_data,
                                          vertex_body_assignment)
            from uhc_tpu.smpl.robot import model_from_betas
            data = load_smpl_data(args.smpl_data)
            nb = int(np.asarray(data.shapedirs).shape[-1])
            model = model_from_betas(topo, model, data,
                                     jnp.asarray(betas[:nb]),
                                     vertex_body_assignment(data))

    if args.variant == "bigfoot":
        from uhc_tpu.smpl.masterfoot import bigfoot_model
        model = bigfoot_model(topo, model)
    elif args.variant == "masterfoot":
        from uhc_tpu.smpl.masterfoot import masterfoot_model
        topo, model, _ = masterfoot_model(topo, model, 30.0)
    elif args.variant == "smplh":
        from uhc_tpu.smpl import smplh as SH
        if args.smpl_data is not None:
            model = SH.smplh_model_from_data(topo, model, data)
        else:
            model = SH.smplh_model(topo, model)
        topo = SH.smplh_topology()
    elif args.variant == "smplx":
        from uhc_tpu.smpl import smplh as SH
        if args.smpl_data is not None:
            model = SH.smplx_model_from_data(topo, model, data)
        else:
            model = SH.smplx_model(topo, model)
        topo = SH.smplx_topology()
    elif args.variant == "ball":
        import dataclasses
        topo = dataclasses.replace(topo, joint_kind="ball")

    xml = export_mjcf(topo, model, name=os.path.splitext(
        os.path.basename(args.out))[0])
    with open(args.out, "w") as f:
        f.write(xml)
    print(f"wrote {args.out} ({topo.nbody} bodies, nq={topo.nq})")


if __name__ == "__main__":
    main()
