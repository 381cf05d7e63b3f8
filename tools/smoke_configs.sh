#!/bin/bash
# 2-epoch end-to-end smoke (train -> checkpoint -> eval) of one config per
# reference family, on the host CPU. Covers: bigfoot, copycat_old,
# copycat_sl, deep_mimic, masterfoot (obs_v3 future frames), meta_pd,
# obsv6, smpl_shape — plus the flagship release/ball/smplh/uhm configs
# exercised by the round-3 training queues (results/).
# Usage: bash tools/smoke_configs.sh [cfg ...]
set -u
cd "$(dirname "$0")/.."
CFGS=${@:-"bigfoot_1 copycat_1 copycat_sl_1 deepmimic_1 masterfoot_fut_1 copycat_24 copycat_44 copycat_36"}
for cfg in $CFGS; do
  echo "=== $cfg $(date +%H:%M:%S)"
  timeout 1500 python -c "
import jax; jax.config.update('jax_platforms','cpu')
import sys, runpy
sys.argv = ['train','--cfg','$cfg','--num-envs','4','--horizon','8',
            '--epochs','2','--results-dir','/tmp/smoke_$cfg']
runpy.run_module('uhc_tpu.cli.train', run_name='__main__')
" 2>&1 | grep -vE "WARNING|cpu_aot|SIGILL|machine features" | tail -4
  echo "=== $cfg rc=$?"
done
