#!/bin/bash
# Round-5a TPU queue — perf levers + the UHM controller fix.
#
# Leg 1: cond_inv silicon rows (VERDICT r4 #4): the pl.when-guarded
#        exact-inverse kernel (Cholesky compiled once) in the production
#        schedule, then with the mid-window refresh enabling PCG-(1,1).
# Leg 2: UHM closed-loop re-eval with the RIGHT low-level controller
#        (VERDICT r4 #5): tools/uhm_diagnose.py showed the kin policy is
#        fine open-loop (61 mm) — the 550 mm came from driving it with the
#        STANDING-ONLY copycat (results/uhc_implicit). Re-evaluate under
#        the dyn19 controller (31.8 mm on the 19-clip gait library).
# Every leg runs under tools/retry_run.sh (VERDICT r4 #7).
set -u
cd "$(dirname "$0")/.."
LOG=results/train_queue_r5a.log
R=tools/retry_run.sh
mkdir -p results
echo "=== r5a queue start $(date) ===" >> $LOG

$R 4200 2 condinv_prod $LOG -- env B=2048 STEPS=20 \
  python tools/kernel_bench.py \
  "LANE=1,E=128,SUB=32,PCG=2,PCGPD=1,PCGV=1,SC=1,CONDINV=1"

$R 4200 2 condinv_refresh $LOG -- env B=2048 STEPS=20 \
  python tools/kernel_bench.py \
  "LANE=1,E=128,SUB=32,PCG=1,PCGPD=1,PCGV=1,SC=1,CONDINV=1,REFRESH=8"

$R 2700 2 uhm2_relive_dyn19cc $LOG -- \
  python -m uhc_tpu.cli.eval_relive --cfg uhm_1 --epoch 400 \
  --data sample_data/gait_clips.pkl \
  --cc-checkpoint results/uhc_implicit_dyn19/models/iter_4000.p \
  --results-dir results/uhm_2

echo "=== r5a queue end $(date) ===" >> $LOG
