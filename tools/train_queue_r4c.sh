#!/bin/bash
# Round-4c TPU queue — runs once the dyn19 training (PID $1) releases the
# chip. Stages:
#   A. kernel_bench: measure the r4 lane-kernel levers on silicon
#      (asymmetric PD/FD PCG schedule, mid-window preconditioner refresh,
#      big-tree NP=160 lane rows vs their v2 baselines)
#   B. shape-conditioned retrain on the anatomical synthetic blendshape
#      library (sample_data/shape_clips.pkl — VERDICT r3 weak #4)
#   C. UHM kinematic-policy training with the env-unified observation
#      (env_obs: supervised pretraining in the exact eval feature layout)
#      + eval_relive
# Usage: tools/train_queue_r4c.sh <dyn19_pid>
set -u
cd "$(dirname "$0")/.."
LOG=results/train_queue_r4c.log
mkdir -p results
echo "=== r4c queue start $(date) (waiting on pid ${1:-none}) ===" >> $LOG

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "--- chip free $(date) ---" >> $LOG

# --- A: kernel measurements -------------------------------------------------
echo "--- kernel_bench r4 rows $(date) ---" >> $LOG
BENCH_OUT=results/kernel_bench_r4.jsonl
# SMPL-24 production + the two new schedule levers
timeout 4000 python tools/kernel_bench.py \
  "LANE=1,E=128,SUB=32,PCG=2,PCGV=1,SC=1" \
  "LANE=1,E=128,SUB=32,PCG=2,PCGPD=1,PCGV=1,SC=1" \
  "LANE=1,E=128,SUB=32,PCG=1,PCGPD=1,REFRESH=8,PCGV=1,SC=1" \
  >> $LOG 2>&1
# big trees: lane (new) vs v2 split (old prod for these families)
timeout 6000 python tools/kernel_bench.py \
  "MODEL=masterfoot,LANE=1,E=128,SUB=8,PCG=2,PCGVS=1,SC=1" \
  "MODEL=masterfoot,SPLIT=1,TAIL=16,PCG=2,SC=1" \
  >> $LOG 2>&1
timeout 6000 python tools/kernel_bench.py \
  "MODEL=smplh,LANE=1,E=128,SUB=8,PCG=2,PCGVS=1,SC=1" \
  "MODEL=smplh,SPLIT=1,TAIL=16,PCG=2,SC=1" \
  >> $LOG 2>&1
echo "--- kernel_bench done rc=$? $(date) ---" >> $LOG

# --- B: shape-conditioned retrain -------------------------------------------
echo "--- shape retrain $(date) ---" >> $LOG
timeout 9000 python -m uhc_tpu.cli.train --cfg uhc_implicit_shape \
  --motion-file sample_data/shape_clips.pkl \
  --num-envs 1024 --horizon 32 --epochs 600 --save-n-epochs 150 \
  --results-dir results/uhc_implicit_shape_r4 >> $LOG 2>&1
echo "--- shape done rc=$? $(date) ---" >> $LOG

# --- C: UHM with env-unified obs on TPU --------------------------------------
echo "--- uhm env_obs train $(date) ---" >> $LOG
timeout 9000 python -m uhc_tpu.cli.train --cfg uhm_1 --agent uhm \
  --motion-file sample_data/gait_clips.pkl \
  --cc-checkpoint results/uhc_implicit/models/iter_best.p \
  --num-envs 256 --horizon 24 --epochs 400 --save-n-epochs 100 \
  --results-dir results/uhm_2 >> $LOG 2>&1
echo "--- uhm done rc=$? $(date) ---" >> $LOG

ep=$(ls results/uhm_2/models/iter_[0-9]*.p 2>/dev/null \
     | sed 's/.*iter_0*\([0-9][0-9]*\)\.p/\1/' | sort -n | tail -1)
if [ -n "$ep" ]; then
  echo "--- eval_relive epoch $ep $(date) ---" >> $LOG
  timeout 3600 python -m uhc_tpu.cli.eval_relive --cfg uhm_1 --epoch "$ep" \
    --data sample_data/gait_clips.pkl \
    --cc-checkpoint results/uhc_implicit/models/iter_best.p \
    --results-dir results/uhm_2 >> $LOG 2>&1
  echo "--- eval_relive done rc=$? $(date) ---" >> $LOG
else
  echo "--- eval_relive SKIPPED: no uhm_2 checkpoint found ---" >> $LOG
fi
echo "=== r4c queue end $(date) ===" >> $LOG
