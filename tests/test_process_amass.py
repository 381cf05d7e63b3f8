"""Offline AMASS ETL tests (process_amass_raw/db twins)."""
import numpy as np

from uhc_tpu.data import process_amass as PA


def _raw_seq(T=40, fr=120, gender=b"male"):
    rng = np.random.default_rng(0)
    return {
        "poses": rng.normal(scale=0.2, size=(T, 156)).astype(np.float64),
        "trans": rng.normal(scale=0.1, size=(T, 3)).astype(np.float64),
        "betas": rng.normal(scale=0.5, size=16).astype(np.float64),
        "mocap_framerate": np.asarray(fr),
        "gender": gender,
    }


def test_resample_filter_split():
    raw = {
        "CMU_s1_walk": _raw_seq(T=120, fr=120),
        "CMU_s1_short": _raw_seq(T=20, fr=120),        # 5 frames @30 -> drop
        "Transitions_mocap_s2_run": _raw_seq(T=60, fr=60),
        "CMU_s3_sit": _raw_seq(T=120, fr=120),          # occluded: clipped
        "CMU_s4_fly": _raw_seq(T=120, fr=120),          # irrecoverable: drop
    }
    occlusion = {
        "0-CMU_s3_sit": {"issue": "sitting", "idxes": [15]},
        "0-CMU_s4_fly": {"issue": "unknown"},
    }
    db = PA.process_amass_db(raw, occlusion)
    assert set(db) == {"0-CMU_s1_walk", "0-Transitions_mocap_s2_run",
                       "0-CMU_s3_sit"}
    walk = db["0-CMU_s1_walk"]
    assert walk["pose_aa"].shape == (30, 156)           # 120 @120Hz -> 30
    assert walk["pose_6d"].shape == (30, 52, 6)
    assert walk["trans"].shape == (30, 3)
    assert walk["beta"].shape == (16,)
    assert walk["gender"] == "male"
    assert db["0-CMU_s3_sit"]["pose_aa"].shape[0] == 15  # occlusion bound

    splits = PA.split_amass_db(db)
    assert "0-CMU_s1_walk" in splits["train"]
    assert "0-Transitions_mocap_s2_run" in splits["test"]


def test_orth6d_roundtrip_identity():
    """Zero pose -> 6d of the identity rotation = [1,0,0, 0,1,0] (column
    convention of compute_orth6d_from_rotation_matrix)."""
    six = PA.aa_to_orth6d(np.zeros((1, 6)))
    np.testing.assert_allclose(six[0, 0], [1, 0, 0, 0, 1, 0], atol=1e-6)


def test_fix_height_grounds_first_frame():
    from uhc_tpu.smpl.lbs import synthetic_smpl_data, lbs
    import jax.numpy as jnp

    data = synthetic_smpl_data()
    raw = _raw_seq(T=12, fr=30)
    trans = PA.fix_height_smpl_vanilla(data, raw["poses"], raw["trans"],
                                       raw["betas"])
    b = np.zeros(data.shapedirs.shape[-1], np.float32)
    b[:16] = raw["betas"][:16]
    verts, _ = lbs(data, jnp.asarray(
        raw["poses"][0][:72].reshape(24, 3).astype(np.float32)),
        jnp.asarray(b), jnp.asarray(trans[0].astype(np.float32)))
    assert abs(float(jnp.min(verts[:, 2]))) < 1e-4
