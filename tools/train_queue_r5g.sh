#!/bin/bash
# Round-5g follow-on queue — takes the chip when r5f releases it.
#
# Leg 1 (VERDICT r4 #3, the last unsolved training family): resume the
#        shape-conditioned run from iter_0150. metrics.jsonl shows
#        1.22 s/epoch after the one-off compile and windowed succ climbing
#        0.07 -> 0.28 over the 150 epochs the r4 run got before its eval
#        leg died — the family is undertrained (the nominal dyn19 run
#        needed 4000 epochs), not structurally broken. 2000 epochs is
#        ~40 min of chip time after a ~23 min compile.
# Leg 2: shape eval. Runs on the chip when time allows, else on CPU
#        (the zero-shot 19-clip eval ran on CPU in r4 the same way) so a
#        trained checkpoint never again goes un-evaluated (r4 weak #4).
# Leg 3: side_step_wide refit at horizon 96 — the one dyn19 holdout; its
#        horizon-48 refit plateaued at full-seq root_dist ~141 mm
#        (train_queue_r5f.log): 48-frame windows never expose the
#        240-frame drift the full-sequence criterion fails it on.
# Leg 4: bf16-preconditioner and E=256 kernel rows, retried through
#        retry_run.sh (VERDICT r4 #4: the HTTP 500 kills were never
#        retried; a clean fail under retry makes them measured dead ends).
#
# Every chip leg is deadline-guarded so the chip is free for the driver's
# end-of-round bench.py run.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5g.pid
LOG=results/train_queue_r5g.log
R=tools/retry_run.sh
SHAPE=results/uhc_implicit_shape_r4
DYN=results/uhc_implicit_dyn19
DEADLINE=${DEADLINE:-$(date -d '22:45' +%s)}
mkdir -p results
echo "=== r5g queue start $(date) deadline=$(date -d @$DEADLINE) ===" >> $LOG

# wait for r5f to release the CHIP: either the queue exits, or it enters
# its CPU-only cross-sim leg (the chip sits idle through that + the
# likely-skipped uhm3 gate otherwise)
while [ -f /tmp/r5f.pid ] && kill -0 "$(cat /tmp/r5f.pid)" 2>/dev/null \
      && ! grep -q "dr_cross_sim attempt" results/train_queue_r5f.log; do
  sleep 60
done
echo "--- r5f released the chip $(date) ---" >> $LOG

left() { echo $(( DEADLINE - $(date +%s) )); }
fits_ok() { [ "$(left)" -gt "$1" ]; }
skip() { echo "--- SKIP $1: $(left)s left ---" >> $LOG; }

# leg 1: shape resume (compile ~23 min + 1850 ep * 1.25 s ~ 40 min).
# Budget the leg to what actually remains so a partial run still saves
# its iter_*.p checkpoints (save-n-epochs 250 ~ every 5 min of training).
if fits_ok 2700; then
  $R $(( $(left) - 300 )) 1 shape_resume $LOG -- python -m uhc_tpu.cli.train \
    --cfg uhc_implicit_shape --motion-file sample_data/shape_clips.pkl \
    --num-envs 1024 --horizon 32 --epoch 150 --epochs 2000 \
    --save-n-epochs 250 --results-dir $SHAPE
else skip shape_resume; fi

# leg 2: shape eval — chip if >=40 min remains, else CPU (slow but sure)
ep=$(ls $SHAPE/models/iter_[0-9]*.p 2>/dev/null \
     | sed 's/.*iter_0*\([0-9][0-9]*\)\.p/\1/' | sort -n | tail -1)
if [ -n "${ep:-}" ] && [ "$ep" -gt 150 ]; then
  if fits_ok 2400; then
    $R 3600 2 shape_eval $LOG -- bash -c \
      "python -m uhc_tpu.cli.eval --cfg uhc_implicit_shape --epoch $ep \
       --data sample_data/shape_clips.pkl --results-dir $SHAPE \
       > $SHAPE/per_seq_eval_${ep}.log 2>&1"
  else
    $R 10800 1 shape_eval_cpu $LOG -- bash -c \
      "env UHC_TPU_CPU=1 python -m uhc_tpu.cli.eval \
       --cfg uhc_implicit_shape --epoch $ep \
       --data sample_data/shape_clips.pkl --results-dir $SHAPE \
       > $SHAPE/per_seq_eval_${ep}_cpu.log 2>&1"
  fi
fi

# leg 3: the last dyn19 holdout at a drift-exposing horizon
if fits_ok 4200; then
  $R 5400 2 fit_wide_h96 $LOG -- python -m uhc_tpu.cli.fit \
    --cfg uhc_implicit --motion-file sample_data/gait_clips_ext.pkl \
    --key 0-SYN_side_step_wide --epoch 4000 --max-epochs 300 \
    --eval-every 20 --num-envs 256 --horizon 96 --results-dir $DYN
  if fits_ok 1500; then
    $R 2700 2 singles_eval_g $LOG -- bash -c \
      "python -m uhc_tpu.cli.eval --cfg uhc_implicit --epoch 4000 \
       --data sample_data/gait_clips_ext.pkl --results-dir $DYN \
       --singles-dir $DYN/_singles > $DYN/per_seq_eval_r5g_singles.log 2>&1"
  else skip singles_eval_g; fi
else skip fit_wide_h96; fi

# leg 4: kernel lever retries (fast-failing if the compile helper still 500s)
if fits_ok 2400; then
  $R 2400 2 bf16_row $LOG -- bash -c "python tools/kernel_bench.py \
    'E=128,PCG=2,V=100,SPLIT=0,TAIL=16,SC=1,BF16=1,LANE=1,SUB=32,PCGV=1,PCGPD=1' \
    | tee -a results/kernel_bench_prod.jsonl"
else skip bf16_row; fi
if fits_ok 2400; then
  $R 2400 2 e256_row $LOG -- bash -c "python tools/kernel_bench.py \
    'E=256,PCG=2,V=100,SPLIT=0,TAIL=16,SC=1,BF16=0,LANE=1,SUB=32,PCGV=1,PCGPD=1' \
    | tee -a results/kernel_bench_prod.jsonl"
else skip e256_row; fi

echo "=== r5g queue end $(date) ===" >> $LOG
