"""Clip-start continuity of the synthetic gait generator.

Regression: `anchor_root` integrated np.gradient'ed foot velocities whose
one-sided EDGE differences put a full stride-phase velocity into frame 0.
On the high-amplitude wide side-step (side=0.45) that authored a 69 mm
root jump between frames 0-1 (2.08 m/s for one frame, then 0.2 m/s) — an
init transient no physical controller can brake, which cost
0-SYN_side_step_wide its full-clip success (RESULTS.md, r5 diagnosis of
results/uhc_implicit_dyn19/eval_dump_4000.pkl).

The committed benchmark pkls are intentionally NOT regenerated (all
committed eval numbers were measured on them); this pins the generator
fix for any future regeneration.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax = pytest.importorskip("jax")
jax.config.update("jax_platforms", "cpu")

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
NEUTRAL = "/root/reference/sample_data/standing_neutral.pkl"
needs_assets = pytest.mark.skipif(
    not (os.path.exists(XML) and os.path.exists(NEUTRAL)),
    reason="reference assets not present")


@needs_assets
@pytest.mark.parametrize("kw", [
    {},                                        # walk_forward
    {"f": 1.1, "hipA": 0.25, "side": 0.45},    # side_step_wide (the repro)
])
def test_anchor_root_start_continuity(kw):
    from tools.make_gait_clips import anchor_root, build_base, make_walk

    topo, model, base = build_base()
    q, w = make_walk(topo, base, T=90, **kw)
    out = anchor_root(topo, model, q, w)

    step = np.linalg.norm(np.diff(out[:, :2], axis=0), axis=1)
    # frame 0->1 root step must look like the early-gait steps, not an
    # edge-difference artifact (pre-fix the wide clip had 69 mm vs 6 mm)
    typical = np.median(step[1:15]) + 1e-4
    assert step[0] <= 3.0 * typical, (step[0], typical)
    # and symmetric at the tail
    assert step[-1] <= 3.0 * np.median(step[-15:-1]) + 1e-4
