#!/bin/bash
# Round-2 final TPU queue: runs everything that was blocked by the outage,
# serially (one TPU client at a time), each instance in its own process
# (a worker fault poisons a process).  Logs to /tmp/q_*.log.
set -x
cd /root/repo

# 1. headline bench (fills the persistent cache for mcp250 geometry)
timeout 3000 python bench.py > /tmp/q_bench.log 2>&1

# 2. 500-series, one process per instance
for inst in mcp500-1 mcp500-2 mcp500-3 mcp500-4 gpp500-1 gpp500-2 gpp500-3 gpp500-4; do
  timeout 2500 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out /tmp/q_${inst}.csv > /tmp/q_${inst}.log 2>&1
done

# 3. arch/control/truss/qap on TPU (fast iterations may converge these)
for inst in arch0 arch2 arch4 arch8 control1 control2 control3 truss5 truss6 truss8 qap9 qap10; do
  timeout 2000 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out /tmp/q_${inst}.csv > /tmp/q_${inst}.log 2>&1
done

# 4. big tail (sides 800-2000); generous caps, cold compiles included
for inst in theta5 theta6 maxG11 thetaG11; do
  timeout 3600 python benchmarks/parity.py --instances $inst --time-limit 600 \
    --out /tmp/q_${inst}.csv > /tmp/q_${inst}.log 2>&1
done

# 5. applications mini (MIMO + sensorloc)
timeout 3000 python benchmarks/applications.py --set mini \
  --out /tmp/q_applications.csv > /tmp/q_applications.log 2>&1

# 6. batch-at-scale probe (B=32/64/128 with auto subspace)
timeout 5400 python benchmarks/batch_compile_probe.py > /tmp/q_b128.log 2>&1

# persist whatever completed into the repo so the round-end auto-commit
# captures it even if this fires between sessions
mkdir -p /root/repo/benchmarks/results/tpu_queue
cp /tmp/q_*.csv /root/repo/benchmarks/results/tpu_queue/ 2>/dev/null
cp /tmp/q_bench.log /root/repo/benchmarks/results/tpu_queue/ 2>/dev/null
echo QUEUE_DONE
