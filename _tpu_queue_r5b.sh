#!/bin/bash
# Round-5b TPU queue — the remaining VERDICT items that need the real chip:
#   1. applications full sweep (MIMO 100/500/1000, sensorloc 100-400) at the
#      reference's bench tolerance/cap (runbench.jl:39-44,102-156)
#   2. maxG55 (side 5000) through the solve_sharded TP code path (VERDICT #6)
#   3. gpp500-2 fresh-compile-cache discriminating run (docs/ROADMAP.md §1)
#   4. flagship bench preview
set -x
cd /root/repo
OUT=/root/repo/benchmarks/results
Q=$OUT/tpu_queue_r5
mkdir -p $Q

timeout 5400 python benchmarks/applications.py --set full --tol 1e-4 \
  --time-limit 300 --out $Q/applications_r5_tpu.csv > $Q/applications.log 2>&1

timeout 4200 python benchmarks/parity.py --instances maxG55 --sharded 1 \
  --time-limit 1500 --out $Q/maxG55_tpu.csv > $Q/maxG55.log 2>&1

PROXSDP_TPU_COMPILE_CACHE=$Q/freshcache timeout 2400 python \
  benchmarks/parity.py --instances gpp500-2 --time-limit 600 \
  --out $Q/gpp500-2_fresh.csv > $Q/gpp500-2_fresh.log 2>&1

timeout 2400 python bench.py > $Q/bench_r5b.json 2> $Q/bench_r5b.log

echo QUEUE_R5B_DONE > $Q/DONE_B
