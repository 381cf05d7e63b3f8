#!/bin/bash
# Round-5d TPU queue — cross-simulator robustness (VERDICT r4 #6: raise
# the 3/6 gait transfer into CPU MuJoCo to >=5/6).
#
# Leg 1: contact-domain-randomized fine-tune of the dyn19 policy on the
#        6-gait library (8 perturbed-contact models per clip; variant 0
#        nominal — data.dataset.build_dr_library + the lane kernel's new
#        per-env contact scalars).
# Leg 2: nominal-engine eval of the DR policy (must keep succ 6/6).
# Leg 3: cross-sim re-eval in CPU MuJoCo -> results/cross_sim_gait_dr.json.
set -u
cd "$(dirname "$0")/.."
LOG=results/train_queue_r5d.log
R=tools/retry_run.sh
DR=results/uhc_implicit_dyn19_dr
mkdir -p results
echo "=== r5d queue start $(date) ===" >> $LOG

$R 9000 2 dr_finetune $LOG -- python -m uhc_tpu.cli.train \
  --cfg uhc_implicit --motion-file sample_data/gait_clips.pkl \
  --dr-variants 8 --num-envs 512 --horizon 48 \
  --epochs 500 --save-n-epochs 100 \
  --warm-start-from results/uhc_implicit_dyn19/models/iter_4000.p \
  --results-dir $DR

ep=$(ls $DR/models/iter_[0-9]*.p 2>/dev/null \
     | sed 's/.*iter_0*\([0-9][0-9]*\)\.p/\1/' | sort -n | tail -1)
if [ -n "$ep" ]; then
  $R 3600 2 dr_nominal_eval $LOG -- bash -c \
    "python -m uhc_tpu.cli.eval --cfg uhc_implicit --epoch $ep \
     --data sample_data/gait_clips.pkl --results-dir $DR \
     > $DR/per_seq_eval_${ep}.log 2>&1"

  $R 5400 2 dr_cross_sim $LOG -- env JAX_PLATFORMS=cpu \
    python tools/cross_sim_eval.py --cfg uhc_implicit \
    --checkpoint $DR/models/iter_$(printf %04d $ep).p \
    --data sample_data/gait_clips.pkl \
    --out results/cross_sim_gait_dr.json
fi

echo "=== r5d queue end $(date) ===" >> $LOG
