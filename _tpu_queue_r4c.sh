#!/bin/bash
# Round-4c TPU catchup — runs AFTER _tpu_queue_r4b.sh finishes:
#   1. batch B>=128 probe (crashed on a path bug in r4b; fixed)
#   2. projection-engine ms/iter at side 800 + 1600 (BASELINE evidence)
#   3. gpp500-2 verbose rerun (diagnose the r4a 257-iteration stall)
#   4. flagship bench with subspace_sign validation
set -x
cd /root/repo
OUT=/root/repo/benchmarks/results
Q=$OUT/tpu_queue_r4
mkdir -p $Q

timeout 5400 python benchmarks/batch_compile_probe.py > $Q/batch_probe.log 2>&1

timeout 2700 python benchmarks/proj_modes.py maxG11 200 > $Q/proj_modes_maxG11.log 2>&1
timeout 2700 python benchmarks/proj_modes.py qpG11 100 > $Q/proj_modes_qpG11.log 2>&1

echo QUEUE_R4C_DONE > $Q/DONE_C
