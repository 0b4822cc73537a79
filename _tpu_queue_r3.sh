#!/bin/bash
# Round-3 TPU queue (verdict items 1,3,4,5,6): headline bench FIRST, then
# the consolidated parity rerun, gpp500, the large-side tail,
# applications, batch sweep.  One TPU client at a time; each step in its
# own process (a fault poisons a process).  Results land directly in
# benchmarks/results/ as they complete.
set -x
cd /root/repo
OUT=/root/repo/benchmarks/results
mkdir -p $OUT/tpu_queue_r3

# 1. headline bench (THE round artifact; warms the mcp250 compile cache)
timeout 3000 python bench.py > /tmp/q3_bench.log 2>&1
grep -h '"metric"' /tmp/q3_bench.log > $OUT/tpu_queue_r3/bench_r3.json 2>/dev/null
cp /tmp/q3_bench.log $OUT/tpu_queue_r3/ 2>/dev/null

# 2. consolidated parity: full gpp/mcp 124-500 set, one process per
# instance (fault isolation), appended into one CSV afterwards
for inst in mcp124-1 mcp124-2 mcp124-3 mcp124-4 gpp124-1 gpp124-2 gpp124-3 gpp124-4 \
            mcp250-1 mcp250-2 mcp250-3 mcp250-4 gpp250-1 gpp250-2 gpp250-3 gpp250-4 \
            mcp500-1 mcp500-2 mcp500-3 mcp500-4 gpp500-1 gpp500-2 gpp500-3 gpp500-4; do
  timeout 2500 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out /tmp/q3_${inst}.csv > /tmp/q3_${inst}.log 2>&1
  cp /tmp/q3_${inst}.csv $OUT/tpu_queue_r3/ 2>/dev/null
done
python - <<'EOF'
import csv, glob, os
rows, header = [], None
for f in sorted(glob.glob("/root/repo/benchmarks/results/tpu_queue_r3/q3_*.csv")):
    with open(f) as fh:
        r = list(csv.reader(fh))
    if len(r) >= 2:
        header = header or r[0]
        rows += r[1:]
if header:
    with open("/root/repo/benchmarks/results/parity_r3_tpu.csv", "w", newline="") as fh:
        w = csv.writer(fh); w.writerow(header); w.writerows(rows)
    print("consolidated", len(rows), "rows")
EOF

# 3. large-side tail (verdict #4): sides 800-2000
for inst in theta5 theta6 maxG11 thetaG11 qpG11 maxG51; do
  timeout 3600 python benchmarks/parity.py --instances $inst --time-limit 600 \
    --out /tmp/q3_${inst}.csv > /tmp/q3_${inst}.log 2>&1
  cp /tmp/q3_${inst}.csv $OUT/tpu_queue_r3/ 2>/dev/null
done
python - <<'EOF'
import csv, glob
rows, header = [], None
for f in sorted(glob.glob("/root/repo/benchmarks/results/tpu_queue_r3/q3_theta5.csv")) + \
         sorted(glob.glob("/root/repo/benchmarks/results/tpu_queue_r3/q3_theta6.csv")) + \
         sorted(glob.glob("/root/repo/benchmarks/results/tpu_queue_r3/q3_maxG*.csv")) + \
         sorted(glob.glob("/root/repo/benchmarks/results/tpu_queue_r3/q3_thetaG*.csv")) + \
         sorted(glob.glob("/root/repo/benchmarks/results/tpu_queue_r3/q3_qpG*.csv")):
    with open(f) as fh:
        r = list(csv.reader(fh))
    if len(r) >= 2:
        header = header or r[0]
        rows += r[1:]
if header:
    with open("/root/repo/benchmarks/results/parity_tail_r3_tpu.csv", "w", newline="") as fh:
        w = csv.writer(fh); w.writerow(header); w.writerows(rows)
    print("tail", len(rows), "rows")
EOF

# 4. arch/control/truss/qap on TPU (fast iterations may converge them now
# that block equilibration is auto)
timeout 7200 python benchmarks/parity.py --set families --time-limit 300 \
  --out $OUT/parity_families_r3_tpu.csv > /tmp/q3_families.log 2>&1

# 5. applications full sweep (verdict #6)
timeout 7200 python benchmarks/applications.py --set full \
  --out $OUT/applications_r3_tpu.csv > /tmp/q3_applications.log 2>&1

# 6. batch sweep incl. the 1024-instance config (verdict #5)
timeout 7200 python benchmarks/batch_compile_probe.py > $OUT/tpu_queue_r3/batch_probe.log 2>&1

cp /tmp/q3_*.log $OUT/tpu_queue_r3/ 2>/dev/null
echo QUEUE_R3_DONE > $OUT/tpu_queue_r3/DONE
