"""Offline AMASS ETL — uhc/data_process/{process_amass_raw,process_amass_db}
twins.

Stage 1 (`read_amass_dir`, process_amass_raw.py:87-133): walk an AMASS
directory tree of npz mocap files into a flat {key -> raw dict} db.

Stage 2 (`process_amass_db`, process_amass_db.py:221-289 process_qpos_list):
per sequence — resample mocap_framerate -> 30 Hz, apply the occlusion list
(amass_copycat_occlusion_v2.pkl: drop irrecoverable sequences, clip
sitting/airborne ones to their first-issue frame), drop sequences shorter
than 10 frames, ground the trajectory with `fix_height_smpl_vanilla`
(subtract the min vertex z of the first frame, :194-218), convert axis-angle
to the 6d rotation parameterization, and split train/test/valid by AMASS
corpus (amass_splits :293-297).

The SMPL forward pass used for grounding is the JAX LBS
(uhc_tpu/smpl/lbs.py) — batched over frames on device; everything else is
host-side numpy (this is one-time ETL, not the hot loop).
"""
from __future__ import annotations

import glob
import os
import os.path as osp
import pickle
from typing import Any, Dict, Iterable, Optional

import numpy as np

TARGET_FR = 30

AMASS_SPLITS = {
    "vald": ["HumanEva", "MPI_HDM05", "SFU", "MPI_mosh"],
    "test": ["Transitions_mocap", "SSM_synced"],
    "train": ["CMU", "MPI_Limits", "TotalCapture", "Eyes_Japan_Dataset",
              "KIT", "BML", "EKUT", "TCD_handMocap", "BMLhandball",
              "DanceDB", "ACCAD", "BMLmovi", "BioMotionLab", "Eyes",
              "DFaust"],
}
AMASS_SPLIT_DICT = {d: k for k, v in AMASS_SPLITS.items() for d in v}


def read_amass_dir(root: str, sequences: Optional[Iterable[str]] = None
                   ) -> Dict[str, dict]:
    """process_amass_raw.read_data/read_single_sequence: {corpus_subject_
    action -> dict(np.load(...))}, skipping shape.npz files."""
    if sequences is None:
        sequences = sorted(
            x for x in os.listdir(root) if osp.isdir(osp.join(root, x)))
    db = {}
    for seq_name in sequences:
        for fname in sorted(glob.glob(osp.join(root, seq_name, "*", "*.npz"))):
            if fname.endswith("shape.npz"):
                continue
            subject = osp.basename(osp.dirname(fname))
            action = osp.basename(fname)[:-4]
            db[f"{seq_name}_{subject}_{action}"] = dict(np.load(fname))
    return db


def count_consec(idx: np.ndarray):
    """Longest runs of consecutive indices (process_amass_db.py:146)."""
    lst = np.asarray(idx).reshape(-1)
    if lst.size == 0:
        return [0]
    consec = [1]
    for x, y in zip(lst, lst[1:]):
        if x == y - 1:
            consec[-1] += 1
        else:
            consec.append(1)
    return consec


def fix_height_smpl_vanilla(smpl_data, pose_aa, trans, betas):
    """Ground the sequence: subtract the first frame's min vertex z
    (process_amass_db.py:194 — 'no filtering, just fix height')."""
    import jax.numpy as jnp

    from uhc_tpu.smpl.lbs import lbs

    n_betas = smpl_data.shapedirs.shape[-1]
    b = np.zeros(n_betas, np.float32)
    b[:min(len(betas), n_betas)] = betas[:n_betas]
    # SMPL-H/X body poses share SMPL's first 22 joints; take the 24-joint
    # SMPL body (hand joints zero if absent)
    p = np.zeros(72, np.float32)
    p[:min(pose_aa.shape[-1], 72)] = pose_aa[0][:72]
    verts, _ = lbs(smpl_data, jnp.asarray(p.reshape(24, 3)),
                   jnp.asarray(b), jnp.asarray(trans[0]))
    gp = float(jnp.min(verts[:, 2]))
    out = np.array(trans, copy=True)
    out[:, 2] -= gp
    return out


def aa_to_orth6d(pose_aa: np.ndarray) -> np.ndarray:
    """(..., J*3) axis-angle -> (..., J, 6) first-two-rows rotation
    representation (convert_aa_to_orth6d)."""
    import jax.numpy as jnp

    from uhc_tpu.maths import quat_from_rotvec, quat_to_mat

    aa = jnp.asarray(pose_aa).reshape(pose_aa.shape[0], -1, 3)
    mats = quat_to_mat(quat_from_rotvec(aa))
    # first two matrix COLUMNS, column-major
    # (compute_orth6d_from_rotation_matrix: [:,:,:2].transpose(1,2))
    six = jnp.swapaxes(mats[..., :, :2], -1, -2).reshape(aa.shape[0], -1, 6)
    return np.asarray(six)


def process_amass_db(raw_db: Dict[str, dict],
                     occlusion: Optional[Dict[str, dict]] = None,
                     smpl_data=None,
                     target_fr: int = TARGET_FR) -> Dict[str, dict]:
    """process_qpos_list (process_amass_db.py:221): raw npz dicts ->
    {key -> {pose_aa, pose_6d, trans, beta, seq_name, gender}} at 30 Hz."""
    occlusion = occlusion or {}
    out = {}
    for k, v in raw_db.items():
        key = "0-" + k
        fr = int(v.get("mocap_framerate", target_fr))
        skip = max(int(fr / target_fr), 1)
        pose = np.asarray(v["poses"])[::skip]
        trans = np.asarray(v["trans"])[::skip]
        bound = pose.shape[0]
        if key in occlusion:
            issue = occlusion[key].get("issue")
            if issue in ("sitting", "airborne") and "idxes" in occlusion[key]:
                bound = occlusion[key]["idxes"][0]
                if bound < 10:
                    continue
            else:
                continue
        pose, trans = pose[:bound], trans[:bound]
        if pose.shape[0] < 10:
            continue
        betas = np.asarray(v["betas"]).reshape(-1)
        if smpl_data is not None:
            trans = fix_height_smpl_vanilla(smpl_data, pose, trans, betas)
        gender = v.get("gender", "neutral")
        if isinstance(gender, np.ndarray):
            gender = gender.item()
        if isinstance(gender, bytes):
            gender = gender.decode("utf-8")
        out[key] = {
            "pose_aa": pose.astype(np.float32),
            "pose_6d": aa_to_orth6d(pose).astype(np.float32),
            "trans": trans.astype(np.float32),
            "beta": betas[:16].astype(np.float32),
            "seq_name": key,
            "gender": gender,
        }
    return out


def split_amass_db(db: Dict[str, dict]) -> Dict[str, Dict[str, dict]]:
    """Split by AMASS corpus name prefix (process_amass_db.py:293-305)."""
    splits: Dict[str, Dict[str, dict]] = {"train": {}, "test": {}, "vald": {}}
    for k, v in db.items():
        corpus = k.split("-", 1)[-1].split("_")[0]
        split = AMASS_SPLIT_DICT.get(corpus)
        if split is None:
            for name, s in AMASS_SPLIT_DICT.items():
                if k.split("-", 1)[-1].startswith(name):
                    split = s
                    break
        splits[split or "train"][k] = v
    return splits


def save_db(db: Dict[str, dict], path: str):
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(db, f)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True, help="AMASS root directory")
    p.add_argument("--out_dir", default="out")
    p.add_argument("--occlusion", default=None,
                   help="amass_copycat_occlusion_v2.pkl path")
    p.add_argument("--smpl", default=None, help="SMPL model pkl for "
                   "ground-height fixing (omit to skip)")
    args = p.parse_args()

    raw = read_amass_dir(args.dir)
    occ = None
    if args.occlusion:
        import joblib

        occ = joblib.load(args.occlusion)
    smpl_data = None
    if args.smpl:
        from uhc_tpu.smpl.lbs import load_smpl_data

        smpl_data = load_smpl_data(args.smpl)
    db = process_amass_db(raw, occ, smpl_data)
    for split, d in split_amass_db(db).items():
        save_db(d, osp.join(args.out_dir,
                            f"amass_copycat_take5_{split}.pkl"))
        print(split, len(d))


if __name__ == "__main__":
    main()
