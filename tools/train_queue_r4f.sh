#!/bin/bash
# Round-4f TPU queue — fallback ordering after the r4e lever rows stalled in
# the remote Mosaic compile helper (>40 min for a config whose production
# sibling compiled inside r4c's window). Training legs (known-good compile
# times) run first; the lever rows move to the tail with a 90-min budget
# each so a pathological remote compile can't starve the trained-model work.
# Usage: tools/train_queue_r4f.sh
set -u
cd "$(dirname "$0")/.."
LOG=results/train_queue_r4f.log
DYN=results/uhc_implicit_dyn19
mkdir -p results
echo "=== r4f queue start $(date) ===" >> $LOG

# --- A: dyn19 per-seq fits ---------------------------------------------------
echo "--- dyn19 per-seq eval @4000 $(date) ---" >> $LOG
timeout 2700 python -m uhc_tpu.cli.eval --cfg uhc_implicit --epoch 4000 \
  --data sample_data/gait_clips_ext.pkl --results-dir $DYN \
  --dump $DYN/eval_dump_4000.pkl > $DYN/per_seq_eval_4000.log 2>&1
echo "--- eval rc=$? $(date) ---" >> $LOG

FAILS=$(python - <<'PY'
import json
try:
    for line in open("results/uhc_implicit_dyn19/per_seq_eval_4000.log"):
        if line.startswith("SUMMARY"):
            break
        parts = line.split(" ", 1)
        if len(parts) == 2 and parts[1].lstrip().startswith("{"):
            try:
                m = json.loads(parts[1])
            except json.JSONDecodeError:
                continue
            if m.get("succ", 1.0) < 1.0:
                print(parts[0])
except FileNotFoundError:
    pass
PY
)
echo "failing clips: $FAILS" >> $LOG
for k in $FAILS; do
  echo "--- fit $k $(date) ---" >> $LOG
  timeout 2400 python -m uhc_tpu.cli.fit --cfg uhc_implicit \
    --motion-file sample_data/gait_clips_ext.pkl --key "$k" \
    --epoch 4000 --max-epochs 400 --num-envs 512 --horizon 48 \
    --results-dir $DYN >> $LOG 2>&1
  echo "--- fit $k rc=$? $(date) ---" >> $LOG
done
if [ -n "$FAILS" ]; then
  echo "--- final eval with singles $(date) ---" >> $LOG
  timeout 2700 python -m uhc_tpu.cli.eval --cfg uhc_implicit --epoch 4000 \
    --data sample_data/gait_clips_ext.pkl --results-dir $DYN \
    --singles-dir $DYN/_singles > $DYN/per_seq_eval_4000_singles.log 2>&1
  echo "--- singles eval rc=$? $(date) ---" >> $LOG
fi

# --- B: shape-conditioned retrain --------------------------------------------
echo "--- shape retrain $(date) ---" >> $LOG
timeout 7200 python -m uhc_tpu.cli.train --cfg uhc_implicit_shape \
  --motion-file sample_data/shape_clips.pkl \
  --num-envs 1024 --horizon 32 --epochs 600 --save-n-epochs 150 \
  --results-dir results/uhc_implicit_shape_r4 >> $LOG 2>&1
echo "--- shape done rc=$? $(date) ---" >> $LOG

# --- C: UHM with env-unified obs ---------------------------------------------
echo "--- uhm env_obs train $(date) ---" >> $LOG
timeout 6000 python -m uhc_tpu.cli.train --cfg uhm_1 --agent uhm \
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

# --- D: schedule levers, 90-min budget each ----------------------------------
# (PCGPD measured in r4e: 482,287 substeps/s — now the production schedule.)
echo "--- lever REFRESH $(date) ---" >> $LOG
timeout 5400 python tools/kernel_bench.py \
  "LANE=1,E=128,SUB=32,PCG=1,PCGPD=1,REFRESH=8,PCGV=1,SC=1" >> $LOG 2>&1
echo "--- lever REFRESH rc=$? $(date) ---" >> $LOG
echo "--- lever BF16 retry $(date) ---" >> $LOG
timeout 3600 python tools/kernel_bench.py \
  "LANE=1,E=128,SUB=32,PCG=2,PCGPD=1,PCGV=1,SC=1,BF16=1" >> $LOG 2>&1
echo "--- lever BF16 rc=$? $(date) ---" >> $LOG
echo "--- lever E=256 retry $(date) ---" >> $LOG
timeout 3600 python tools/kernel_bench.py \
  "LANE=1,E=256,SUB=32,PCG=2,PCGPD=1,PCGV=1,SC=1" >> $LOG 2>&1
echo "--- lever E=256 rc=$? $(date) ---" >> $LOG

# --- E: SMPL-H lane vs v2 rows -----------------------------------------------
echo "--- kernel_bench smplh rows $(date) ---" >> $LOG
timeout 7000 python tools/kernel_bench.py \
  "MODEL=smplh,LANE=1,E=128,SUB=8,PCG=2,PCGVS=1,SC=1" \
  "MODEL=smplh,SPLIT=1,TAIL=16,PCG=2,SC=1" >> $LOG 2>&1
echo "--- smplh rows rc=$? $(date) ---" >> $LOG
echo "=== r4f queue end $(date) ===" >> $LOG
