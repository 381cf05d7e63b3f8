#!/bin/bash
# Round-5f TPU queue — the final-round combined schedule, ordered by
# judge-value per chip-hour (VERDICT r4 items #2, #6, #5):
#   legs 1-3: re-fit the three failing dyn19 clips under the FIXED
#             full-sequence stop criterion (cli/fit.py default since
#             220214f; the committed singles were fitted under the window
#             criterion the r4 verdict proved a non-predictor).
#   leg 4:    19-clip singles eval -> per_seq_eval_r5_singles.log.
#   leg 5:    contact-domain-randomized fine-tune of the dyn19 policy on
#             the 6-gait library (8 perturbed-contact models per clip,
#             variant 0 nominal — data.dataset.build_dr_library + the lane
#             kernel's per-env contact scalars).
#   leg 6:    nominal-engine eval of the DR policy (must keep succ 6/6).
#   leg 7:    cross-sim re-eval in CPU MuJoCo -> cross_sim_gait_dr.json.
#   legs 8-9: uhm_3 trained with the dyn19 controller in the loop
#             (tools/uhm_diagnose.py isolated the 550 mm to the closed
#             loop, open-loop kin rollout is 61 mm), then eval_relive.
# Every leg runs under tools/retry_run.sh (VERDICT r4 #7); a wall-clock
# DEADLINE guard skips remaining legs so the chip is free for the driver's
# end-of-round bench.py run.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5f.pid
LOG=results/train_queue_r5f.log
R=tools/retry_run.sh
DYN=results/uhc_implicit_dyn19
DR=results/uhc_implicit_dyn19_dr
CC=$DYN/models/iter_4000.p
DEADLINE=${DEADLINE:-$(date -d '22:45' +%s)}
mkdir -p results
echo "=== r5f queue start $(date) deadline=$(date -d @$DEADLINE) ===" >> $LOG

fits_ok() { [ $(( DEADLINE - $(date +%s) )) -gt "$1" ]; }
skip() { echo "--- SKIP $1: $(( DEADLINE - $(date +%s) ))s left ---" >> $LOG; }

T=5400
for k in 0-SYN_side_step 0-SYN_walk_turn_sharp 0-SYN_side_step_wide; do
  if fits_ok 2400; then
    $R $T 2 "fit_$k" $LOG -- python -m uhc_tpu.cli.fit --cfg uhc_implicit \
      --motion-file sample_data/gait_clips_ext.pkl --key "$k" \
      --epoch 4000 --max-epochs 400 --eval-every 20 \
      --num-envs 512 --horizon 48 --results-dir $DYN
    T=3600   # later fits reuse the cached program
  else skip "fit_$k"; fi
done

if fits_ok 1500; then
  $R 2700 2 singles_eval $LOG -- bash -c \
    "python -m uhc_tpu.cli.eval --cfg uhc_implicit --epoch 4000 \
     --data sample_data/gait_clips_ext.pkl --results-dir $DYN \
     --singles-dir $DYN/_singles > $DYN/per_seq_eval_r5_singles.log 2>&1"
else skip singles_eval; fi

if fits_ok 4500; then
  $R 7200 2 dr_finetune $LOG -- python -m uhc_tpu.cli.train \
    --cfg uhc_implicit --motion-file sample_data/gait_clips.pkl \
    --dr-variants 8 --num-envs 512 --horizon 48 \
    --epochs 500 --save-n-epochs 100 \
    --warm-start-from $CC --results-dir $DR
else skip dr_finetune; fi

ep=$(ls $DR/models/iter_[0-9]*.p 2>/dev/null \
     | sed 's/.*iter_0*\([0-9][0-9]*\)\.p/\1/' | sort -n | tail -1)
if [ -n "${ep:-}" ]; then
  if fits_ok 1500; then
    $R 2700 2 dr_nominal_eval $LOG -- bash -c \
      "python -m uhc_tpu.cli.eval --cfg uhc_implicit --epoch $ep \
       --data sample_data/gait_clips.pkl --results-dir $DR \
       > $DR/per_seq_eval_${ep}.log 2>&1"
  else skip dr_nominal_eval; fi
  # CPU leg — does not hold the chip
  $R 5400 2 dr_cross_sim $LOG -- env JAX_PLATFORMS=cpu \
    python tools/cross_sim_eval.py --cfg uhc_implicit \
    --checkpoint $DR/models/iter_$(printf %04d $ep).p \
    --data sample_data/gait_clips.pkl \
    --out results/cross_sim_gait_dr.json
fi

if fits_ok 5400; then
  $R 7200 2 uhm3_train $LOG -- python -m uhc_tpu.cli.train --cfg uhm_1 \
    --agent uhm --motion-file sample_data/gait_clips.pkl \
    --cc-checkpoint $CC \
    --num-envs 256 --horizon 24 --epochs 300 --save-n-epochs 100 \
    --results-dir results/uhm_3
  ep=$(ls results/uhm_3/models/iter_[0-9]*.p 2>/dev/null \
       | sed 's/.*iter_0*\([0-9][0-9]*\)\.p/\1/' | sort -n | tail -1)
  if [ -n "${ep:-}" ] && fits_ok 900; then
    $R 1800 2 uhm3_relive $LOG -- python -m uhc_tpu.cli.eval_relive \
      --cfg uhm_1 --epoch "$ep" --data sample_data/gait_clips.pkl \
      --cc-checkpoint $CC --results-dir results/uhm_3
  fi
else skip uhm3_train; fi

echo "=== r5f queue end $(date) ===" >> $LOG
