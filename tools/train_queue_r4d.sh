#!/bin/bash
# Round-4d TPU queue — runs once the r4c queue (PID $1) releases the chip.
# Stages, in decreasing value-per-minute order (the round may end first):
#   A. dyn19 per-seq eval @4000 -> per-sequence fine-tunes (cli/fit.py, the
#      reference fit_uhc.py protocol) of every clip the base policy fails
#      -> final eval under --singles-dir. Goal: 19/19 coverage.
#   B. kernel_bench SMPL-H lane-vs-v2 rows (the r4c rows crashed on the
#      flat-hand routing bug, fixed in kernel_bench.py).
#   C. the two unmeasured schedule levers (asymmetric PD/FD PCG,
#      mid-window preconditioner refresh), one invocation each so a
#      timeout can only kill one row.
# Usage: tools/train_queue_r4d.sh <r4c_pid>
set -u
cd "$(dirname "$0")/.."
LOG=results/train_queue_r4d.log
DYN=results/uhc_implicit_dyn19
mkdir -p results
echo "=== r4d queue start $(date) (waiting on pid ${1:-none}) ===" >> $LOG

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
echo "--- chip free $(date) ---" >> $LOG

# --- A: dyn19 per-seq fits ---------------------------------------------------
echo "--- dyn19 per-seq eval @4000 $(date) ---" >> $LOG
timeout 3600 python -m uhc_tpu.cli.eval --cfg uhc_implicit --epoch 4000 \
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
  timeout 3000 python -m uhc_tpu.cli.fit --cfg uhc_implicit \
    --motion-file sample_data/gait_clips_ext.pkl --key "$k" \
    --epoch 4000 --max-epochs 400 --num-envs 512 --horizon 48 \
    --results-dir $DYN >> $LOG 2>&1
  echo "--- fit $k rc=$? $(date) ---" >> $LOG
done
if [ -n "$FAILS" ]; then
  echo "--- final eval with singles $(date) ---" >> $LOG
  timeout 3600 python -m uhc_tpu.cli.eval --cfg uhc_implicit --epoch 4000 \
    --data sample_data/gait_clips_ext.pkl --results-dir $DYN \
    --singles-dir $DYN/_singles > $DYN/per_seq_eval_4000_singles.log 2>&1
  echo "--- singles eval rc=$? $(date) ---" >> $LOG
fi

# --- B: SMPL-H lane vs v2 rows ----------------------------------------------
echo "--- kernel_bench smplh rows $(date) ---" >> $LOG
timeout 7000 python tools/kernel_bench.py \
  "MODEL=smplh,LANE=1,E=128,SUB=8,PCG=2,PCGVS=1,SC=1" \
  "MODEL=smplh,SPLIT=1,TAIL=16,PCG=2,SC=1" >> $LOG 2>&1
echo "--- smplh rows rc=$? $(date) ---" >> $LOG

# --- C: schedule levers, one per invocation -----------------------------------
echo "--- schedule lever rows $(date) ---" >> $LOG
timeout 4000 python tools/kernel_bench.py \
  "LANE=1,E=128,SUB=32,PCG=2,PCGPD=1,PCGV=1,SC=1" >> $LOG 2>&1
timeout 4000 python tools/kernel_bench.py \
  "LANE=1,E=128,SUB=32,PCG=1,PCGPD=1,REFRESH=8,PCGV=1,SC=1" >> $LOG 2>&1
echo "=== r4d queue end $(date) ===" >> $LOG
