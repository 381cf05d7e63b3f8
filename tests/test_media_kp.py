"""Keypoint registry (kp_utils twin), media chunking (image_utils twin),
and the replay CLI (replay_data twin)."""
import os

import numpy as np
import pytest


def test_convert_kps_roundtrip():
    from uhc_tpu.data import keypoints as K

    rng = np.random.RandomState(0)
    kp = rng.randn(5, len(K.joint_names("coco")), 3).astype(np.float32)
    common = K.convert_kps(kp, "coco", "common")
    assert common.shape == (5, 14, 3)
    # every common joint exists in coco except hip-center analogs; check a
    # few direct correspondences elementwise
    coco = K.joint_names("coco")
    cmn = K.joint_names("common")
    for name in ("lankle", "rwrist", "lshoulder"):
        np.testing.assert_array_equal(common[:, cmn.index(name)],
                                      kp[:, coco.index(name)])
    # absent joints zero-fill (reference convert_kps zero-fills too)
    P, present = K.conversion("coco", "common")
    assert present[cmn.index("neck")] == (("neck" in coco))
    missing = ~present
    if missing.any():
        assert np.all(common[:, missing] == 0)


def test_convert_kps_matches_perm_idxs():
    from uhc_tpu.data import keypoints as K

    rng = np.random.RandomState(1)
    kp = rng.randn(3, len(K.joint_names("spin")), 2)
    out = K.convert_kps(kp, "spin", "h36m")
    idxs = K.perm_idxs("spin", "h36m")
    _, present = K.conversion("spin", "h36m")
    np.testing.assert_allclose(out[:, present], kp[:, idxs])


def test_convert_kps_jax_path():
    import jax.numpy as jnp

    from uhc_tpu.data import keypoints as K

    rng = np.random.RandomState(2)
    kp = rng.randn(4, len(K.joint_names("mpii")), 3).astype(np.float32)
    a = K.convert_kps(kp, "mpii", "common")
    b = np.asarray(K.convert_kps(jnp.asarray(kp), "mpii", "common"))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_keypoint_hflip_involution():
    from uhc_tpu.data import keypoints as K

    rng = np.random.RandomState(3)
    kp = rng.rand(7, 17, 3) * 100
    flipped = K.keypoint_hflip(kp, img_width=224)
    assert flipped is not kp  # pure, unlike the reference
    np.testing.assert_allclose(K.keypoint_hflip(flipped, 224), kp)
    np.testing.assert_array_equal(flipped[..., 1:], kp[..., 1:])


def test_skeleton_edges_in_range():
    from uhc_tpu.data import keypoints as K

    for fmt in ("smpl", "common"):
        edges = K.skeleton(fmt)
        assert edges.max() < len(K.joint_names(fmt))


@pytest.mark.parametrize("n,w,ov", [(50, 80, 10), (81, 80, 10),
                                    (200, 80, 10), (247, 80, 10),
                                    (95, 32, 8), (320, 64, 16)])
def test_chunk_with_overlap_stitches_exactly(n, w, ov):
    """The contract: concatenating each window's select range reproduces
    0..n-1 exactly once (image_utils.py:26 semantics)."""
    from uhc_tpu.utils.media import get_chunk_with_overlap

    chunks, selects = get_chunk_with_overlap(n, w, ov)
    stitched = np.concatenate(
        [np.asarray(c)[a if a >= 0 else len(c) + a:b]
         for c, (a, b) in zip(chunks, selects)])
    np.testing.assert_array_equal(stitched, np.arange(n))
    # boundary mode agrees
    bounds, selects2 = get_chunk_with_overlap(n, w, ov, return_idxes=True)
    assert selects2 == selects
    if n > w:
        assert bounds[-1][1] == n and bounds[-1][1] - bounds[-1][0] == w


def test_crops_and_resize():
    from uhc_tpu.utils import media

    img = np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3)
    c = media.crop_center(img, 20, 10)
    assert c.shape == (10, 20, 3)
    np.testing.assert_array_equal(c, img[15:25, 20:40])
    s = media.crop_side(img, 20, 10)
    assert s.shape == (10, 20, 3)
    out = media.resize_frames([img], 16, 8)
    assert out[0].shape == (8, 16, 3)


def test_replay_cli(tmp_path, capsys):
    import joblib

    from uhc_tpu.cli import replay

    rng = np.random.RandomState(4)
    takes = {}
    for k in ("takeA", "takeB"):
        takes[k] = {"pred_jpos": rng.randn(4, 24, 3),
                    "gt_jpos": rng.randn(4, 24, 3),
                    "percent": 1.0, "fail_safe": False}
    pkl = str(tmp_path / "dump.pkl")
    joblib.dump(takes, pkl)

    replay.main(["--data", pkl, "--list"])
    out = capsys.readouterr().out
    assert "takeA" in out and "4 frames" in out

    png = str(tmp_path / "t.png")
    replay.main(["--data", pkl, "--take", "takeB", "--out", png])
    assert any(f.startswith("t_") and f.endswith(".png")
               for f in os.listdir(tmp_path))
