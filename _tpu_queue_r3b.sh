#!/bin/bash
# Round-3b TPU queue — FINAL-solver sweep (polar projection, certified
# statuses, warm reruns).  One TPU client at a time; every instance in
# its own process (a worker fault poisons a process).  Results land in
# benchmarks/results/ as they complete, consolidated at the end.
set -x
cd /root/repo
OUT=/root/repo/benchmarks/results
Q=$OUT/tpu_queue_r3b
mkdir -p $Q

# 1. headline bench (THE round artifact; warms the mcp250 compile cache)
timeout 3000 python bench.py > $Q/bench.log 2>&1
grep -h '"metric"' $Q/bench.log > $Q/bench_r3b.json 2>/dev/null

# 2. consolidated parity: gpp/mcp 124-500 (runbench.jl:118-141)
for inst in mcp124-1 mcp124-2 mcp124-3 mcp124-4 gpp124-1 gpp124-2 gpp124-3 gpp124-4 \
            mcp250-1 mcp250-2 mcp250-3 mcp250-4 gpp250-1 gpp250-2 gpp250-3 gpp250-4 \
            mcp500-1 mcp500-2 mcp500-3 mcp500-4 gpp500-1 gpp500-2 gpp500-3 gpp500-4; do
  timeout 1800 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out $Q/p_${inst}.csv > $Q/p_${inst}.log 2>&1
done
python benchmarks/consolidate.py $OUT/parity_r3_tpu.csv "$Q/p_mcp*.csv" "$Q/p_gpp*.csv"

# 3. families (theta/arch/control/truss/qap) — per instance
for inst in theta1 theta2 theta3 theta4 arch0 arch2 arch4 arch8 \
            control1 control2 control3 control4 control5 control6 \
            truss1 truss2 truss3 truss4 truss5 truss6 truss7 truss8 \
            qap5 qap6 qap7 qap8 qap9 qap10; do
  timeout 1500 python benchmarks/parity.py --instances $inst --time-limit 300 \
    --out $Q/f_${inst}.csv > $Q/f_${inst}.log 2>&1
done
python benchmarks/consolidate.py $OUT/parity_families_r3_tpu.csv "$Q/f_*.csv"

# 4. large-side tail (sides 800-2000; the low-rank thesis workload)
for inst in theta5 theta6 maxG11 thetaG11 qpG11 maxG51 maxG32; do
  timeout 3600 python benchmarks/parity.py --instances $inst --time-limit 600 \
    --out $Q/t_${inst}.csv > $Q/t_${inst}.log 2>&1
done
python benchmarks/consolidate.py $OUT/parity_tail_r3_tpu.csv "$Q/t_*.csv"

# 5. applications full sweep (MIMO 100/500/1000, SENSORLOC 100-400, RANDSDP)
timeout 7200 python benchmarks/applications.py --set full \
  --out $OUT/applications_r3_tpu.csv > $Q/applications.log 2>&1

# 6. batch sweep incl. B>=128 (the eigh-free batch subspace program)
timeout 7200 python benchmarks/batch_compile_probe.py > $Q/batch_probe.log 2>&1

echo QUEUE_R3B_DONE > $Q/DONE
