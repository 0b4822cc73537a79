#!/bin/bash
# Round-4 TPU queue — the evidence sweep the verdicts have asked for
# since round 2, ordered by standing priority (VERDICT r3 "Next round"):
#   1. large-side SDPLIB tail (sides 800-2000) — FIRST, while the
#      backend is up (it has been queued for two rounds)
#   2. gpp500 parity (4 instances)
#   3. full gpp/mcp 124-500 parity refresh (commit-stamped)
#   4. families (theta/arch/control/truss/qap) with the FINAL solver
#   5. applications sweep (MIMO/SENSORLOC/RANDSDP)
#   6. batch B>=128 compile probe + sweep
#   7. headline bench
# One TPU client at a time; each instance in its own process (a worker
# fault poisons a process).  Results land incrementally.
set -x
cd /root/repo
OUT=/root/repo/benchmarks/results
Q=$OUT/tpu_queue_r4
mkdir -p $Q

# 1. large-side tail (theta5/6, maxG11/32/51, thetaG11, qpG11)
for inst in theta5 maxG11 thetaG11 qpG11 theta6 maxG32 maxG51; do
  timeout 5400 python benchmarks/parity.py --instances $inst --time-limit 900 \
    --out $Q/t_${inst}.csv > $Q/t_${inst}.log 2>&1
done
python benchmarks/consolidate.py $OUT/parity_tail_r4_tpu.csv "$Q/t_*.csv"

# 2. gpp500 (third time of asking) — fresh per-variant compile cache is
# only needed if a miscompile recurs; try the shared cache first
for inst in gpp500-1 gpp500-2 gpp500-3 gpp500-4; do
  timeout 2700 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out $Q/g_${inst}.csv > $Q/g_${inst}.log 2>&1
done
python benchmarks/consolidate.py $OUT/parity_gpp500_tpu.csv "$Q/g_*.csv"

# 3. gpp/mcp 124-500 refresh
for inst in mcp124-1 mcp124-2 mcp124-3 mcp124-4 gpp124-1 gpp124-2 gpp124-3 gpp124-4 \
            mcp250-1 mcp250-2 mcp250-3 mcp250-4 gpp250-1 gpp250-2 gpp250-3 gpp250-4 \
            mcp500-1 mcp500-2 mcp500-3 mcp500-4; do
  timeout 1800 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out $Q/p_${inst}.csv > $Q/p_${inst}.log 2>&1
done
python benchmarks/consolidate.py $OUT/parity_r4_tpu.csv "$Q/p_*.csv" "$Q/g_*.csv"

# 4. families with the final solver (replaces the contradicted CPU CSV)
for inst in theta1 theta2 theta3 theta4 arch0 arch2 arch4 arch8 \
            control1 control2 control3 control4 control5 control6 \
            truss1 truss2 truss3 truss4 truss5 truss6 truss7 truss8 \
            qap5 qap6 qap7 qap8 qap9 qap10; do
  timeout 1500 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out $Q/f_${inst}.csv > $Q/f_${inst}.log 2>&1
done
python benchmarks/consolidate.py $OUT/parity_families_r4_tpu.csv "$Q/f_*.csv"

# 5. applications sweep
timeout 7200 python benchmarks/applications.py --set full \
  --out $OUT/applications_r4_tpu.csv > $Q/applications.log 2>&1

# 6. batch scale-out
timeout 7200 python benchmarks/batch_compile_probe.py > $Q/batch_probe.log 2>&1

# 7. headline bench
timeout 3000 python bench.py > $Q/bench.log 2>&1
grep -h '"metric"' $Q/bench.log > $Q/bench_r4.json 2>/dev/null

echo QUEUE_R4_DONE > $Q/DONE
