"""Smoke tests for the rig-tooling CLIs (reference scripts/
create_smpl_humanoid.py, smpl_rig_convert.py) and the log plumbing —
the last modules with no test references."""
import runpy
import sys

import joblib
import numpy as np
import pytest


def _run(argv):
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_module(f"uhc_tpu.cli.{argv[0]}", run_name="__main__")
    finally:
        sys.argv = old


def test_create_smpl_humanoid(tmp_path):
    out = str(tmp_path / "h.xml")
    _run(["create_smpl_humanoid", "--out", out])
    xml = open(out).read()
    assert "<mujoco" in xml and "L_Knee" in xml


def test_smpl_rig_convert(tmp_path):
    src = str(tmp_path / "mini.pkl")
    T = 6
    joblib.dump({"clip": {"pose_aa": np.zeros((T, 72), np.float32),
                          "trans": np.zeros((T, 3), np.float32)}}, src)
    out = str(tmp_path / "rig.pkl")
    _run(["smpl_rig_convert", "--data", src, "--out", out])
    d = joblib.load(out)
    assert d["clip"].shape == (T, 76)  # per-key qpos track


def test_logger(tmp_path):
    from uhc_tpu.utils.logger import create_logger
    lg = create_logger(str(tmp_path))
    lg.info("hello")
    assert "hello" in open(tmp_path / "log.txt").read()


def test_render_smpl_rig(tmp_path):
    src = str(tmp_path / "mini.pkl")
    T = 8
    joblib.dump({"clip a": {"pose_aa": np.zeros((T, 72), np.float32),
                            "trans": np.zeros((T, 3), np.float32)}}, src)
    out_dir = str(tmp_path / "renders")
    _run(["render_smpl_rig", "--data", src, "--output-dir", out_dir,
          "--fmt", "png", "--max-frames", "3", "--stride", "2"])
    import glob
    assert glob.glob(out_dir + "/clip_a_*.png")


def test_create_smpl_mesh_skeleton(tmp_path):
    out_dir = str(tmp_path / "models")
    _run(["create_smpl_mesh_skeleton", "--out-dir", out_dir,
          "--num-vis", "2"])
    sim = open(out_dir + "/humanoid_smpl_neutral_mesh_test.xml").read()
    vis = open(out_dir + "/humanoid_smpl_neutral_mesh_vis.xml").read()
    assert "<mujoco" in sim and "L_Knee" in sim
    # vis scene has two color-coded humanoid copies, no actuators
    assert vis.count('name="Pelvis') == 2 and "<actuator>" not in vis
    import xml.etree.ElementTree as ET
    ET.fromstring(vis)


def test_convert_h36m_cli(tmp_path):
    import pickle
    rng = np.random.RandomState(0)
    src = str(tmp_path / "h36m_raw.p")
    with open(src, "wb") as f:
        pickle.dump({"S1": {"Walk": rng.uniform(-40, 40, (50, 78))}}, f)
    out = str(tmp_path / "h36m_qpos.p")
    xml = str(tmp_path / "h36m.xml")
    _run(["convert_h36m", "--data", src, "--out", out,
          "--write-model", xml])
    with open(out, "rb") as f:
        d = pickle.load(f)
    from uhc_tpu.data import h36m
    assert d["S1"]["Walk"].shape[1] == h36m.h36m_nq()
    assert "<mujoco" in open(xml).read()


def test_display_coverage(tmp_path):
    from uhc_tpu.utils.visualizer import display_coverage

    res = {f"seq{i}": {"succ": i % 2, "mpjpe": 30.0 + i} for i in range(5)}
    out = display_coverage(res, str(tmp_path / "cov.png"))
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_create_vis_model(tmp_path):
    """vis_model_utils.py:6 twin: clones the humanoid, strips actuators,
    disables contacts, prefixes names per copy."""
    import xml.etree.ElementTree as ET

    from uhc_tpu.utils.vis_model import create_vis_model

    src = ("/root/reference/assets/mujoco_models/"
           "humanoid_smpl_neutral_mesh.xml")
    out = str(tmp_path / "vis.xml")
    create_vis_model(src, out, num=3)
    root = ET.parse(out).getroot()
    assert root.find("actuator") is None
    assert root.find("contact") is None
    flags = root.find("option").findall("flag")
    assert any(f.get("contact") == "disable" for f in flags)
    wb = root.find("worldbody")
    names = [b.get("name") for b in wb.findall("body")]
    base = [n for n in names if not n[0].isdigit()]
    assert len(names) >= 3 and any(n.startswith("1_") for n in names)
    # joints in the clones are prefixed too (no name collisions)
    all_j = [j.get("name") for j in wb.findall(".//joint")]
    assert len(all_j) == len(set(all_j)), base


def test_replay_dump_states(tmp_path):
    import joblib
    import numpy as np

    from uhc_tpu.cli import replay

    rng = np.random.RandomState(7)
    takes = {"t0": {"pred_jpos": rng.randn(4, 24, 3),
                    "gt_jpos": rng.randn(4, 24, 3),
                    "percent": 1.0, "fail_safe": False}}
    pkl = str(tmp_path / "dump.pkl")
    joblib.dump(takes, pkl)
    npz = str(tmp_path / "states.npz")
    replay.main(["--data", pkl, "--take", "t0",
                 "--out", str(tmp_path / "r.png"), "--dump-states", npz])
    d = np.load(npz)
    assert d["pred_jpos"].shape == (4, 24, 3)
    assert d["gt_jpos"].shape == (4, 24, 3)
