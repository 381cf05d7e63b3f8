"""Standalone imitation-metric evaluation of dumped rollout results —
scripts/eval_imitation.py twin.

Consumes a results pickle of {key: {pred_qpos, gt_qpos, pred_jpos,
gt_jpos, fail_safe, percent}} (as written by `python -m uhc_tpu.cli.eval
--dump <path>`) and recomputes succ / mpjpe / pa_mpjpe / mpjpe_g /
accel_dist / vel_dist / root_dist without touching the simulator.

Usage:
  python -m uhc_tpu.cli.eval_imitation --results <pkl> [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.getcwd())


def main():
    from uhc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--results", required=True)
    p.add_argument("--json", default=None, help="write summary json here")
    args = p.parse_args()

    import joblib
    import numpy as np
    from uhc_tpu.learn.metrics import compute_metrics

    data = joblib.load(args.results)
    agg = {}
    per_seq = {}
    for key, d in data.items():
        m = compute_metrics(
            np.asarray(d["pred_qpos"]), np.asarray(d["gt_qpos"]),
            np.asarray(d["pred_jpos"]), np.asarray(d["gt_jpos"]),
            bool(d.get("fail_safe", False)), float(d.get("percent", 1.0)))
        per_seq[key] = m
        for k, v in m.items():
            agg.setdefault(k, []).append(v)
        print(key, json.dumps({k: round(float(v), 2) for k, v in m.items()}))
    summary = {k: float(np.mean(v)) for k, v in agg.items()}
    summary["coverage"] = int(sum(m["succ"] for m in per_seq.values()))
    summary["num_seqs"] = len(per_seq)
    print("SUMMARY", json.dumps(summary, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"per_seq": per_seq, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
