#!/bin/bash
# arch0 cadence matrix — the 0.42 attractor is deterministic at
# chunk_iters=4000 (same result in-sweep and solo): the poison is the
# f32->f64 stall handover fired at small-chunk cadence.  Test cadences.
set -x
cd /root/repo
R="--opt block_equilibration=true --opt restart=none --opt polish_restart=false --opt max_iter=10000000"
JAX_PLATFORM_NAME=cpu timeout 500 python benchmarks/parity.py \
  --instances arch0 --backend cpu --no-warm-rerun --time-limit 300 \
  $R --opt chunk_iters=16000 --out /tmp/arch0_c16k.csv > /tmp/arch0_c16k.log 2>&1
JAX_PLATFORM_NAME=cpu timeout 500 python benchmarks/parity.py \
  --instances arch0 --backend cpu --no-warm-rerun --time-limit 300 \
  $R --out /tmp/arch0_adapt.csv > /tmp/arch0_adapt.log 2>&1
JAX_PLATFORM_NAME=cpu timeout 500 python benchmarks/parity.py \
  --instances arch0 --backend cpu --no-warm-rerun --time-limit 300 \
  $R --opt convergence_window=2000 --out /tmp/arch0_cw2k.csv > /tmp/arch0_cw2k.log 2>&1
echo CADENCE_DONE
