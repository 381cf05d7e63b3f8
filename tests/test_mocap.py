"""Legacy mocap import tests (BVH/AMC loaders, pose.py twins)."""
import numpy as np

from uhc_tpu.data import mocap as M

BVH = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 0.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Yrotation Xrotation
  JOINT Chest
  {
    OFFSET 0.0 10.0 0.0
    CHANNELS 3 Zrotation Yrotation Xrotation
    End Site
    {
      OFFSET 0.0 5.0 0.0
    }
  }
}
MOTION
Frames: 3
Frame Time: 0.008333
0.0 90.0 0.0 0.0 0.0 0.0 10.0 0.0 0.0
1.0 90.0 0.0 10.0 0.0 0.0 20.0 0.0 0.0
2.0 90.0 0.0 20.0 0.0 0.0 30.0 0.0 0.0
"""

AMC = """#!OML:ASF
:FULLY-SPECIFIED
:DEGREES
1
root 0 0 17 0 90 0
lowerback 1 2 3
lfoot 5
2
root 0 0 17.5 0 90 0
lowerback 2 3 4
lfoot 6
"""


def test_bvh_parse_and_load(tmp_path):
    p = tmp_path / "clip.bvh"
    p.write_text(BVH)
    poses, addr, ft = M.load_bvh_file(str(p), len_scale=0.01)
    assert poses.shape == (3, 9)
    assert addr == {"Hips": (0, 6), "Chest": (6, 9)}
    assert abs(ft - 0.008333) < 1e-9
    # root translation scaled, rotations in radians
    np.testing.assert_allclose(poses[0, :3], [0.0, 0.9, 0.0], atol=1e-9)
    np.testing.assert_allclose(poses[1, 3], np.deg2rad(10.0))
    np.testing.assert_allclose(poses[2, 6], np.deg2rad(30.0))


def test_amc_load(tmp_path):
    p = tmp_path / "clip.amc"
    p.write_text(AMC)
    poses, addr = M.load_amc_file(str(p), scale=0.056444)
    assert poses.shape[0] == 2
    assert addr["root"] == (0, 6)
    # root: xyz scaled then radians
    np.testing.assert_allclose(poses[0, 2], 17 * 0.056444)
    np.testing.assert_allclose(poses[0, 4], np.deg2rad(90))
    # lowerback channels reversed
    a, b = addr["lowerback"]
    np.testing.assert_allclose(poses[0, a:b],
                               np.deg2rad([3.0, 2.0, 1.0]))
    # single-channel foot padded to 2 dofs
    fa, fb = addr["lfoot"]
    assert fb - fa == 2


def test_interpolated_traj():
    poses = np.stack([np.full(5, i, float) for i in range(5)])  # 5 frames
    out = M.interpolated_traj(poses, sample_t=1.0 / 60, mocap_fr=120)
    # 4/120 s of motion at 60 Hz -> 3 samples (floor(T/dt)+1)
    assert out.shape == (3, 5)
    np.testing.assert_allclose(out[1, 0], 2.0)  # halfway = frame 2


def test_visualizer_renders_gif(tmp_path):
    """Headless stick-figure renderer writes an animation file."""
    import numpy as np

    from uhc_tpu.utils.visualizer import render_comparison

    rng = np.random.default_rng(0)
    pred = rng.normal(scale=0.2, size=(4, 24, 3)) + [0, 0, 1.0]
    gt = pred + 0.05
    out = render_comparison(pred, gt, str(tmp_path / "clip.gif"), stride=2)
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0
