#!/bin/bash
# Round-3 training queue (VERDICT r2 items 2 + 3): dynamic-clip imitation
# on the flagship config, then short end-to-end runs of the other flagship
# configs. Strictly serialized — the TPU tunnel is single-client.
set -u
cd /root/repo
LOG=results/train_queue.log
mkdir -p results
echo "=== train queue start $(date) ===" >> $LOG

run() {
  name="$1"; shift
  echo "--- $name: $* ($(date)) ---" >> $LOG
  timeout "$TIMEOUT" python -m uhc_tpu.cli.train "$@" >> $LOG 2>&1
  echo "--- $name done rc=$? ($(date)) ---" >> $LOG
}

# 1. dynamic contact-rich clips (walk/turn/side-step/squat/march)
TIMEOUT=10800 run dyn --cfg uhc_implicit \
  --motion-file sample_data/gait_clips.pkl \
  --results-dir results/uhc_implicit_dyn \
  --num-envs 2048 --horizon 32 --epochs 600

# 2. explicit-RFC flagship (XLA path; smaller batch to bound wall-clock)
TIMEOUT=7200 run explicit --cfg uhc_explicit \
  --num-envs 1024 --horizon 32 --epochs 150 \
  --results-dir results/uhc_explicit

# 3. masterfoot variant
TIMEOUT=7200 run masterfoot --cfg masterfoot_1 \
  --num-envs 1024 --horizon 32 --epochs 150 \
  --results-dir results/masterfoot_1

# 4. shape-conditioned (synthetic blendshapes — clearly labeled by the
#    loud agent warning; no real SMPL pkls in this image)
TIMEOUT=7200 run shape --cfg uhc_implicit_shape \
  --num-envs 1024 --horizon 32 --epochs 150 \
  --results-dir results/uhc_implicit_shape

# 5. SMPL-H hands family
TIMEOUT=7200 run smplh --cfg smplh_1 --robot-model smplh \
  --num-envs 512 --horizon 32 --epochs 150 \
  --results-dir results/smplh_1

echo "=== train queue end $(date) ===" >> $LOG
