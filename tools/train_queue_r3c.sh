#!/bin/bash
# Round-3 third training queue, time-budgeted for a ~1 h session window:
#   1. UHM kinematic-policy stack on the TPU (first trained evidence for
#      §2.4 AgentUHM) + its eval_relive batched deterministic eval;
#   2. warm-started 19-clip dynamic-library run (continues dyn @2000).
# Strictly serialized — the TPU tunnel is single-client. Every leg is
# timeout-bounded and checkpoints every --save-n-epochs, so a timeout
# still leaves eval_*.json + iter_*.p artifacts.
set -u
cd /root/repo
LOG=results/train_queue.log
echo "=== train queue r3c start $(date) ===" >> $LOG

run() {
  name="$1"; t="$2"; shift 2
  echo "--- $name: $* ($(date)) ---" >> $LOG
  timeout "$t" python -m uhc_tpu.cli.train "$@" >> $LOG 2>&1
  echo "--- $name done rc=$? ($(date)) ---" >> $LOG
}

# 1. kinematic-policy (UHM) on the frozen copycat controller
run uhm 1080 --cfg uhm_1 --agent uhm \
  --cc-checkpoint results/uhc_implicit/models/iter_best.p \
  --num-envs 256 --horizon 24 --epochs 100 --save-n-epochs 25 \
  --results-dir results/uhm_1

# 2. batched deterministic eval of the kinematic policy (eval_relive twin)
ep=$(ls results/uhm_1/models/iter_0*.p 2>/dev/null | sed 's/.*iter_0*//;s/\.p//' | sort -n | tail -1)
if [ -n "${ep:-}" ]; then
  echo "--- eval_relive @ $ep ($(date)) ---" >> $LOG
  timeout 420 python -m uhc_tpu.cli.eval_relive --cfg uhm_1 --epoch "$ep" \
    --cc-checkpoint results/uhc_implicit/models/iter_best.p \
    --results-dir results/uhm_1 >> $LOG 2>&1
  echo "--- eval_relive done rc=$? ($(date)) ---" >> $LOG
fi

# 3. 19-clip dynamic library, warm start from the 6-clip policy @2000
mkdir -p results/uhc_implicit_dyn19/models
cp -n results/uhc_implicit_dyn/models/iter_2000.p \
      results/uhc_implicit_dyn19/models/ 2>/dev/null || true
run dyn19 1080 --cfg uhc_implicit \
  --motion-file sample_data/gait_clips_ext.pkl \
  --results-dir results/uhc_implicit_dyn19 \
  --num-envs 2048 --horizon 32 --epoch 2000 --epochs 5000 \
  --save-n-epochs 50

echo "=== train queue r3c end $(date) ===" >> $LOG
