#!/bin/bash
# Round-5d TPU queue — after the r5c bench refresh:
#   1. maxG55 rate diagnostics (the full run crawled at ~0.5 it/s, ~1000x
#      off the matmul speed-of-light for side 5000 — suspect projection
#      rejection storms): verbose unsharded probe + raised-rank probe
#   2. MIMO n=100 long run at defaults (restart=adaptive fixed n=50;
#      n=100 needs ~1-2M iterations — 1800 s at ~2800 it/s might land it)
set -x
cd /root/repo
Q=/root/repo/benchmarks/results/tpu_queue_r5

# wait for the r5c queue (bench.py) to finish
while [ ! -f $Q/DONE_C ]; do sleep 30; done

timeout 600 python benchmarks/parity.py --instances maxG55 \
  --time-limit 300 --no-warm-rerun \
  --opt log_verbose=true --opt timer_verbose=true \
  --out $Q/maxG55_diag.csv > $Q/maxG55_diag.log 2>&1

timeout 600 python benchmarks/parity.py --instances maxG55 \
  --time-limit 300 --no-warm-rerun \
  --opt subspace_rank=128 \
  --out $Q/maxG55_k128.csv > $Q/maxG55_k128.log 2>&1

timeout 2200 python benchmarks/applications.py --set full \
  --only mimo:100 --tol 1e-4 --time-limit 1800 \
  --out $Q/mimo100_long_tpu.csv > $Q/mimo100_long.log 2>&1

echo QUEUE_R5D_DONE > $Q/DONE_D
