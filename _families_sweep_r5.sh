#!/bin/bash
# Round-5 full families sweep (28 instances, reference 5-min cap,
# isolated children with checkpoint auto-resume, zero-empty-row policy,
# per-family tuned recipes — see RECIPES in benchmarks/parity.py).
set -x
cd /root/repo
OUT=benchmarks/results/parity_families_r5b_cpu.csv
JAX_PLATFORM_NAME=cpu timeout 14400 python benchmarks/parity.py \
  --set families --backend cpu --isolate --retries 2 \
  --time-limit 300 --no-warm-rerun --recipes \
  --opt max_iter=10000000 "$@" \
  --out $OUT > benchmarks/results/families_r5b.log 2>&1
echo SWEEP_EXIT=$?
