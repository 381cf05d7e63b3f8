#!/bin/bash
# Round-5e TPU queue — UHM tracking quality (VERDICT r4 #5: mpjpe < 100 mm
# over the 6-clip gait library).
#
# tools/uhm_diagnose.py isolated the r4 550 mm to the low-level controller:
# uhm_2 was trained AND evaluated with the standing-only copycat
# (results/uhc_implicit). Train uhm_3 with the dyn19 controller (31.8 mm on
# the gait library) in the loop, then eval_relive under the same controller.
set -u
cd "$(dirname "$0")/.."
LOG=results/train_queue_r5e.log
R=tools/retry_run.sh
CC=results/uhc_implicit_dyn19/models/iter_4000.p
mkdir -p results
echo "=== r5e queue start $(date) ===" >> $LOG

$R 7200 2 uhm3_train $LOG -- python -m uhc_tpu.cli.train --cfg uhm_1 \
  --agent uhm --motion-file sample_data/gait_clips.pkl \
  --cc-checkpoint $CC \
  --num-envs 256 --horizon 24 --epochs 400 --save-n-epochs 100 \
  --results-dir results/uhm_3

ep=$(ls results/uhm_3/models/iter_[0-9]*.p 2>/dev/null \
     | sed 's/.*iter_0*\([0-9][0-9]*\)\.p/\1/' | sort -n | tail -1)
if [ -n "$ep" ]; then
  $R 3600 2 uhm3_relive $LOG -- python -m uhc_tpu.cli.eval_relive \
    --cfg uhm_1 --epoch "$ep" --data sample_data/gait_clips.pkl \
    --cc-checkpoint $CC --results-dir results/uhm_3
fi

echo "=== r5e queue end $(date) ===" >> $LOG
