#!/bin/bash
# Round-3 second training queue: scale the dynamic-clip suite to the
# 19-clip extended gait library (warm-started from the 6-clip run's
# epoch-2000 checkpoint), then extend the shape-conditioned run that
# stalled at a root drift in its first 150 epochs.
# Strictly serialized — the TPU tunnel is single-client.
set -u
cd /root/repo
LOG=results/train_queue.log
mkdir -p results
echo "=== train queue r3b start $(date) ===" >> $LOG

run() {
  name="$1"; shift
  echo "--- $name: $* ($(date)) ---" >> $LOG
  timeout "$TIMEOUT" python -m uhc_tpu.cli.train "$@" >> $LOG 2>&1
  echo "--- $name done rc=$? ($(date)) ---" >> $LOG
}

# 1. 19-clip dynamic library, warm start from the 6-clip policy
mkdir -p results/uhc_implicit_dyn19/models
cp -n results/uhc_implicit_dyn/models/iter_2000.p \
      results/uhc_implicit_dyn19/models/ 2>/dev/null || true
TIMEOUT=16200 run dyn19 --cfg uhc_implicit \
  --motion-file sample_data/gait_clips_ext.pkl \
  --results-dir results/uhc_implicit_dyn19 \
  --num-envs 2048 --horizon 32 --epoch 2000 --epochs 5000

# 2. shape run: continue to 600 epochs (root-drift coverage attempt)
TIMEOUT=7200 run shape600 --cfg uhc_implicit_shape \
  --num-envs 1024 --horizon 32 --epoch 150 --epochs 600 \
  --results-dir results/uhc_implicit_shape

# 3. kinematic-policy (UHM) stack end-to-end on the frozen copycat
#    controller — first committed training evidence for §2.4 AgentUHM
TIMEOUT=7200 run uhm --cfg uhm_1 --agent uhm \
  --cc-checkpoint results/uhc_implicit/models/iter_best.p \
  --num-envs 256 --horizon 24 --epochs 100 \
  --results-dir results/uhm_1

# 4. batched deterministic eval of the kinematic policy (eval_relive twin)
echo "--- eval_relive ($(date)) ---" >> $LOG
timeout 3600 python -m uhc_tpu.cli.eval_relive --cfg uhm_1 --epoch 100 \
  --cc-checkpoint results/uhc_implicit/models/iter_best.p \
  --results-dir results/uhm_1 >> $LOG 2>&1
echo "--- eval_relive done rc=$? ($(date)) ---" >> $LOG
