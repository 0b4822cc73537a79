#!/bin/bash
# Round-5c TPU queue — runs after the maxG55 full solve frees the chip:
#   1. sensorloc n=300/400 at 1800 s (r5b rows reached gap 3.7e-3/4.8e-3
#      at the 300 s reference cap — they need the longer budget)
#   2. randsdp 5x5 rerun (r5b TPU row was a tiny-shape dispatch
#      pathology: 257 iters / 970 s; solves on CPU in 1.7 s)
#   3. MIMO n=100 with block equilibration (gap-floor probe)
#   4. flagship bench refresh
set -x
cd /root/repo
OUT=/root/repo/benchmarks/results
Q=$OUT/tpu_queue_r5
mkdir -p $Q

# wait for the maxG55 parent (arg 1 = its PID) to exit
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

timeout 4200 python benchmarks/applications.py --set full \
  --only sensorloc:300,sensorloc:400 --tol 1e-4 --time-limit 1800 \
  --out $Q/sensorloc_long_tpu.csv > $Q/sensorloc_long.log 2>&1

timeout 1500 python benchmarks/applications.py --set full \
  --only randsdp:5 --tol 1e-4 --time-limit 300 \
  --out $Q/randsdp_tpu.csv > $Q/randsdp.log 2>&1

timeout 1500 python benchmarks/applications.py --set full \
  --only mimo:100 --tol 1e-4 --time-limit 600 \
  --opt block_equilibration=true \
  --out $Q/mimo100_beq_tpu.csv > $Q/mimo100_beq.log 2>&1

timeout 2400 python bench.py > $Q/bench_r5c.json 2> $Q/bench_r5c.log

echo QUEUE_R5C_DONE > $Q/DONE_C
