#!/bin/bash
# Round-5b TPU queue — bank the production lane-kernel AOT first
# (BENCH_r05 must record the ~482k lane number, not the 301k split
# fallback), then the r5a legs: cond_inv silicon rows (VERDICT r4 #4)
# and the UHM closed-loop re-eval under the dyn19 controller
# (VERDICT r4 #5; tools/uhm_diagnose.py isolated the fault to the
# standing-only controller, not the kin-net).
# Every leg runs under tools/retry_run.sh (VERDICT r4 #7).
set -u
cd "$(dirname "$0")/.."
LOG=results/train_queue_r5b.log
R=tools/retry_run.sh
mkdir -p results
echo "=== r5b queue start $(date) ===" >> $LOG

$R 4200 2 save_aot_lane $LOG -- python bench.py --save-aot lane

$R 4200 2 condinv_prod $LOG -- env B=2048 STEPS=20 \
  python tools/kernel_bench.py \
  "LANE=1,E=128,SUB=32,PCG=2,PCGPD=1,PCGV=1,SC=1,CONDINV=1"

$R 4200 2 condinv_refresh $LOG -- env B=2048 STEPS=20 \
  python tools/kernel_bench.py \
  "LANE=1,E=128,SUB=32,PCG=1,PCGPD=1,PCGV=1,SC=1,CONDINV=1,REFRESH=8"

$R 2700 2 uhm2_relive_dyn19cc $LOG -- \
  python -m uhc_tpu.cli.eval_relive --cfg uhm_1 --epoch 400 \
  --data sample_data/gait_clips.pkl \
  --cc-checkpoint results/uhc_implicit_dyn19/models/iter_4000.p \
  --results-dir results/uhm_2

echo "=== r5b queue end $(date) ===" >> $LOG
