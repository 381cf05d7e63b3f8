#!/bin/bash
# Round-5c TPU queue — the training legs of VERDICT r4:
#   #2: re-fit the three failing dyn19 clips under the FIXED full-sequence
#       stop criterion (cli/fit.py default since 220214f; the committed
#       singles were fitted under the window criterion the r4 verdict
#       proved a non-predictor), then the 19-clip singles eval.
#   #3: resume the shape-conditioned retrain from iter_0150 (the r4 run
#       was climbing 0.19->0.28 when its eval leg died on a transient
#       tunnel error) and run the held-out eval.
# Every leg runs under tools/retry_run.sh (VERDICT r4 #7).
set -u
cd "$(dirname "$0")/.."
LOG=results/train_queue_r5c.log
R=tools/retry_run.sh
DYN=results/uhc_implicit_dyn19
SHAPE=results/uhc_implicit_shape_r4
mkdir -p results
echo "=== r5c queue start $(date) ===" >> $LOG

T=5400
for k in 0-SYN_side_step 0-SYN_walk_turn_sharp 0-SYN_side_step_wide; do
  $R $T 2 "fit_$k" $LOG -- python -m uhc_tpu.cli.fit --cfg uhc_implicit \
    --motion-file sample_data/gait_clips_ext.pkl --key "$k" \
    --epoch 4000 --max-epochs 400 --eval-every 20 \
    --num-envs 512 --horizon 48 --results-dir $DYN
  T=3600   # later fits reuse the cached program
done

$R 3600 2 singles_eval $LOG -- bash -c \
  "python -m uhc_tpu.cli.eval --cfg uhc_implicit --epoch 4000 \
   --data sample_data/gait_clips_ext.pkl --results-dir $DYN \
   --singles-dir $DYN/_singles > $DYN/per_seq_eval_r5_singles.log 2>&1"

$R 7200 2 shape_resume $LOG -- python -m uhc_tpu.cli.train \
  --cfg uhc_implicit_shape --motion-file sample_data/shape_clips.pkl \
  --num-envs 1024 --horizon 32 --epoch 150 --epochs 600 \
  --save-n-epochs 150 --results-dir $SHAPE

ep=$(ls $SHAPE/models/iter_[0-9]*.p 2>/dev/null \
     | sed 's/.*iter_0*\([0-9][0-9]*\)\.p/\1/' | sort -n | tail -1)
if [ -n "$ep" ]; then
  $R 3600 2 shape_eval $LOG -- bash -c \
    "python -m uhc_tpu.cli.eval --cfg uhc_implicit_shape --epoch $ep \
     --data sample_data/shape_clips.pkl --results-dir $SHAPE \
     > $SHAPE/per_seq_eval_${ep}.log 2>&1"
fi

echo "=== r5c queue end $(date) ===" >> $LOG
