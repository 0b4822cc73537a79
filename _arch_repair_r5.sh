#!/bin/bash
# Round-5 arch repair pass — runs when the families sweep frees the box.
# The arch family is bimodal under load (BASELINE.md round-5 findings:
# solo 500 it/s -> rel_err 2e-3 @170k iters; contended 54 it/s ->
# 0.1-0.5): re-run the four arch instances solo at the same 300 s
# reference cap, with the recipe plus chunk_iters pinned (decision
# cadence decoupled from wall-clock), arch0 twice to measure
# reproducibility, then arch0/arch4 at 900 s for the convergence tail.
set -x
cd /root/repo
OUT=benchmarks/results

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

R="--opt block_equilibration=true --opt restart=none --opt polish_restart=false --opt chunk_iters=4000 --opt max_iter=10000000"

for run in a b; do
  JAX_PLATFORM_NAME=cpu timeout 500 python benchmarks/parity.py \
    --instances arch0 --backend cpu --no-warm-rerun --time-limit 300 \
    $R --out /tmp/arch0_repair_$run.csv > /tmp/arch0_repair_$run.log 2>&1
done
for inst in arch2 arch4 arch8; do
  JAX_PLATFORM_NAME=cpu timeout 500 python benchmarks/parity.py \
    --instances $inst --backend cpu --no-warm-rerun --time-limit 300 \
    $R --out /tmp/${inst}_repair.csv > /tmp/${inst}_repair.log 2>&1
done
for inst in arch0 arch4; do
  JAX_PLATFORM_NAME=cpu timeout 1100 python benchmarks/parity.py \
    --instances $inst --backend cpu --no-warm-rerun --time-limit 900 \
    $R --out /tmp/${inst}_repair900.csv > /tmp/${inst}_repair900.log 2>&1
done
echo ARCH_REPAIR_DONE
