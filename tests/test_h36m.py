"""H36M conversion tooling (VERDICT r3 item 10) — fixture-tested like
process_amass, plus euler-convention parity against the reference's own
transformation code (uhc/utils/convert_h36m_data.py, h36m_specs.py)."""
import sys

import numpy as np
import pytest

from uhc_tpu.data import h36m

sys.path.append("/root/reference")


def test_quat_from_euler_rzxy_parity():
    tf = pytest.importorskip("uhc.utils.transformation")
    rng = np.random.RandomState(0)
    for _ in range(50):
        a, b, c = rng.uniform(-np.pi, np.pi, 3)
        ours = h36m._quat_from_euler(a, b, c, 'rzxy')
        ref = tf.quaternion_from_euler(a, b, c, 'rzxy')
        np.testing.assert_allclose(ours, ref, atol=1e-10)
    # and the humanoid's canonical rzyx
    for _ in range(10):
        a, b, c = rng.uniform(-np.pi, np.pi, 3)
        np.testing.assert_allclose(
            h36m._quat_from_euler(a, b, c, 'rzyx'),
            tf.quaternion_from_euler(a, b, c, 'rzyx'), atol=1e-10)


def test_model_layout():
    bones = h36m.model_bones()
    # excluded substrings never appear in the generated model
    assert not any(any(x in b for x in h36m.EXCLUDE_BONES) for b in bones)
    assert bones[0] == 'Hips'
    assert len(bones) == 19
    addr = h36m.body_qposaddr()
    assert addr['Hips'] == (0, 7)
    # ForeArm/Leg are single-dof (spec_channels)
    for b in ('LeftForeArm', 'RightForeArm', 'LeftLeg', 'RightLeg'):
        s, e = addr[b]
        assert e - s == 1
    # contiguous addressing
    spans = sorted(addr.values())
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 == s1
    assert h36m.h36m_nq() == 7 + 14 * 3 + 4


def _synthetic_raw(T=100, seed=1):
    """Synthetic D3_Angles-format poses: (T, 78), trans in mm, angles in
    degrees at 50 Hz, smooth."""
    rng = np.random.RandomState(seed)
    t = np.linspace(0, 2 * np.pi, T)[:, None]
    phase = rng.uniform(0, 2 * np.pi, (1, 78))
    amp = rng.uniform(5, 30, (1, 78))
    poses = amp * np.sin(t + phase)
    poses[:, 0:3] = 1000.0 * np.stack(
        [0.3 * np.sin(t[:, 0]), 0.2 * np.cos(t[:, 0]),
         0.95 + 0.02 * np.sin(2 * t[:, 0])], 1)
    return poses


def test_convert_synthetic_dict():
    data = {"S1": {"Walking": _synthetic_raw()},
            "S5": {"Sitting": _synthetic_raw(seed=2)}}
    out = h36m.convert_h36m_dict(data, mocap_fr=50, dt=1 / 30)
    assert set(out) == {"S1", "S5"}
    q = out["S1"]["Walking"]
    nq = h36m.h36m_nq()
    assert q.shape[1] == nq
    # 100 frames at 50 Hz = ~2 s -> ~60 frames at 30 Hz
    assert 55 <= q.shape[0] <= 61
    # root trans scaled mm -> m (plus per-subject z offset)
    assert np.all(np.abs(q[:, :2]) < 1.0)
    assert np.all((q[:, 2] > 0.5) & (q[:, 2] < 1.5))
    np.testing.assert_allclose(
        q[0, 2], 0.95 + h36m.SUBJECT_Z_OFFSETS["S1"], atol=0.05)
    # unit root quaternions
    np.testing.assert_allclose(np.linalg.norm(q[:, 3:7], axis=1), 1.0,
                               atol=1e-8)
    # hinge angles wrapped
    assert np.all(np.abs(q[:, 7:]) <= np.pi + 1e-9)
    # S5 has no z offset entry
    q5 = out["S5"]["Sitting"]
    np.testing.assert_allclose(q5[0, 2], 0.95, atol=0.05)


def test_mjcf_export_parses():
    import xml.etree.ElementTree as ET

    xml = h36m.h36m_mjcf_string()
    root = ET.fromstring(xml)
    bodies = root.findall(".//body")
    assert len(bodies) == 19
    joints = root.findall(".//joint")
    # 1 free + 14*3 + 4*1 hinges
    assert len(joints) == 1 + 14 * 3 + 4
    names = {b.get("name") for b in bodies}
    assert "LeftForeArm" in names and "RightToeBase" not in names


def test_load_h36m_raw_gated():
    with pytest.raises(ImportError):
        h36m.load_h36m_raw("/nonexistent")
