#!/bin/bash
# Round-4b TPU queue — remainder after the tail + gpp500 stages, REORDERED
# so the never-yet-delivered evidence (batch B>=128, families, applications)
# lands before the parity refresh.  Run after killing _tpu_queue_r4.sh at
# the parity stage.
set -x
cd /root/repo
OUT=/root/repo/benchmarks/results
Q=$OUT/tpu_queue_r4
mkdir -p $Q

# 0. rerun gpp500-2/3/4 with the fixed f64 polish (polar fallback above
# side 384 + 192/256 subspace buckets); -1 already solved clean
for inst in gpp500-2 gpp500-3 gpp500-4; do
  timeout 2700 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out $Q/g_${inst}.csv > $Q/g_${inst}.log 2>&1
done
python benchmarks/consolidate.py $OUT/parity_gpp500_tpu.csv "$Q/g_*.csv"

# 1. batch scale-out (VERDICT missing #5 — has never run on the device)
timeout 5400 python benchmarks/batch_compile_probe.py > $Q/batch_probe.log 2>&1

# 2. maxG32 rerun with the big-side f64 fallback fix
timeout 5400 python benchmarks/parity.py --instances maxG32 --time-limit 900 \
  --out $Q/t_maxG32.csv > $Q/t_maxG32.log 2>&1
python benchmarks/consolidate.py $OUT/parity_tail_r4_tpu.csv "$Q/t_*.csv"

# 3. families with the final solver (replaces the contradicted CPU CSV)
for inst in theta1 theta2 theta3 theta4 arch0 arch2 arch4 arch8 \
            control1 control2 control3 control4 control5 control6 \
            truss1 truss2 truss3 truss4 truss5 truss6 truss7 truss8 \
            qap5 qap6 qap7 qap8 qap9 qap10; do
  timeout 1200 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out $Q/f_${inst}.csv > $Q/f_${inst}.log 2>&1
done
python benchmarks/consolidate.py $OUT/parity_families_r4_tpu.csv "$Q/f_*.csv"

# 4. applications sweep (MIMO 100/500/1000, SENSORLOC 100-400, RANDSDP)
timeout 5400 python benchmarks/applications.py --set full \
  --out $OUT/applications_r4_tpu.csv > $Q/applications.log 2>&1

# 5. parity refresh — skip instances the r4a queue already recorded
for inst in mcp124-1 mcp124-2 mcp124-3 mcp124-4 gpp124-1 gpp124-2 gpp124-3 gpp124-4 \
            mcp250-1 mcp250-2 mcp250-3 mcp250-4 gpp250-1 gpp250-2 gpp250-3 gpp250-4 \
            mcp500-1 mcp500-2 mcp500-3 mcp500-4; do
  [ -s $Q/p_${inst}.csv ] && [ $(wc -l < $Q/p_${inst}.csv) -gt 1 ] && continue
  timeout 1200 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out $Q/p_${inst}.csv > $Q/p_${inst}.log 2>&1
done
python benchmarks/consolidate.py $OUT/parity_r4_tpu.csv "$Q/p_*.csv" "$Q/g_*.csv"

# 6. headline bench
timeout 3000 python bench.py > $Q/bench.log 2>&1
grep -h '"metric"' $Q/bench.log > $Q/bench_r4.json 2>/dev/null

echo QUEUE_R4B_DONE > $Q/DONE
