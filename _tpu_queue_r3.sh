#!/bin/bash
# Round-3 TPU queue (verdict items 1,3,4,5,6): headline bench FIRST, then
# gpp500, the large-side tail, applications, batch sweep.  One TPU client
# at a time; each instance in its own process (a fault poisons a process).
# Results persist into benchmarks/results/tpu_queue_r3/ as they complete.
set -x
cd /root/repo
OUT=/root/repo/benchmarks/results/tpu_queue_r3
mkdir -p $OUT

persist() { cp /tmp/q3_*.csv /tmp/q3_*.json /tmp/q3_bench.log $OUT/ 2>/dev/null; }

# 1. headline bench (THE round artifact; also warms mcp250 compile cache)
timeout 3000 python bench.py > /tmp/q3_bench.log 2> >(tee /tmp/q3_bench.stderr >&2)
grep -h '"metric"' /tmp/q3_bench.log > /tmp/q3_bench.json 2>/dev/null
persist

# 2. gpp500 series (verdict #3)
for inst in gpp500-1 gpp500-2 gpp500-3 gpp500-4; do
  timeout 2500 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out /tmp/q3_${inst}.csv > /tmp/q3_${inst}.log 2>&1
  persist
done

# 3. large-side tail (verdict #4)
for inst in theta5 theta6 maxG11 thetaG11 qpG11 maxG51; do
  timeout 3600 python benchmarks/parity.py --instances $inst --time-limit 600 \
    --out /tmp/q3_${inst}.csv > /tmp/q3_${inst}.log 2>&1
  persist
done

# 4. mcp500 series
for inst in mcp500-1 mcp500-2 mcp500-3 mcp500-4; do
  timeout 2500 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out /tmp/q3_${inst}.csv > /tmp/q3_${inst}.log 2>&1
  persist
done

# 5. applications (verdict #6): MIMO + sensorloc suites
timeout 5400 python benchmarks/applications.py --set full \
  --out /tmp/q3_applications.csv > /tmp/q3_applications.log 2>&1
persist

# 6. batch sweep B>=128 (verdict #5)
timeout 5400 python benchmarks/batch_compile_probe.py > /tmp/q3_batch.log 2>&1
cp /tmp/q3_batch.log $OUT/ 2>/dev/null
persist

echo QUEUE_R3_DONE > $OUT/DONE
