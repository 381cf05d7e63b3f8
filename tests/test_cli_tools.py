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
