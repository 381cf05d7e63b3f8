#!/bin/bash
# Round-4g TPU queue — manual re-drive of the r4e tail after its fit legs
# proved compile-bound (the fresh PCG-(1,2) fit program takes ~30 min of
# remote Mosaic compile; the r4e rows budgeted 40 min total). The three
# failing clips share shapes (240 frames each), so one compile serves all
# three fits. Stages: fits -> singles eval -> UHM env-obs run -> shape
# retrain (UHM first: cheaper XLA-path compile, more likely to complete
# inside the round; shape checkpoints every 150 epochs so a cutoff still
# leaves evidence).
set -u
cd "$(dirname "$0")/.."
LOG=results/train_queue_r4g.log
DYN=results/uhc_implicit_dyn19
mkdir -p results
echo "=== r4g queue start $(date) ===" >> $LOG

T=5400
for k in 0-SYN_side_step 0-SYN_walk_turn_sharp 0-SYN_side_step_wide; do
  echo "--- fit $k $(date) ---" >> $LOG
  timeout $T python -m uhc_tpu.cli.fit --cfg uhc_implicit \
    --motion-file sample_data/gait_clips_ext.pkl --key "$k" \
    --epoch 4000 --max-epochs 400 --num-envs 512 --horizon 48 \
    --results-dir $DYN >> $LOG 2>&1
  echo "--- fit $k rc=$? $(date) ---" >> $LOG
  T=2700   # later fits reuse the cached program
done

echo "--- final eval with singles $(date) ---" >> $LOG
timeout 3600 python -m uhc_tpu.cli.eval --cfg uhc_implicit --epoch 4000 \
  --data sample_data/gait_clips_ext.pkl --results-dir $DYN \
  --singles-dir $DYN/_singles > $DYN/per_seq_eval_4000_singles.log 2>&1
echo "--- singles eval rc=$? $(date) ---" >> $LOG

echo "--- uhm env_obs train $(date) ---" >> $LOG
timeout 4800 python -m uhc_tpu.cli.train --cfg uhm_1 --agent uhm \
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
fi

echo "--- shape retrain $(date) ---" >> $LOG
timeout 7200 python -m uhc_tpu.cli.train --cfg uhc_implicit_shape \
  --motion-file sample_data/shape_clips.pkl \
  --num-envs 1024 --horizon 32 --epochs 600 --save-n-epochs 150 \
  --results-dir results/uhc_implicit_shape_r4 >> $LOG 2>&1
echo "--- shape done rc=$? $(date) ---" >> $LOG
echo "=== r4g queue end $(date) ===" >> $LOG
