#!/bin/bash
# r5g: maxG55 k=128 full attempt — the k128 probe reached gap 9.2e-3
# at iter 209 (vs rel_err 0.287 @ 2649 iters with the default rank
# schedule): the k=34 subspace could never capture the ~sqrt(2m)=100
# solution rank.  3600 s at ~0.7 it/s -> ~2500 iters, checkpointed.
set -x
cd /root/repo
Q=/root/repo/benchmarks/results/tpu_queue_r5
while [ ! -f $Q/DONE_F ]; do sleep 30; done
timeout 5400 python benchmarks/parity.py --instances maxG55 \
  --isolate --retries 2 --time-limit 3600 --no-warm-rerun \
  --opt subspace_rank=128 \
  --out $Q/maxG55_k128_full.csv > $Q/maxG55_k128_full.log 2>&1
echo QUEUE_R5G_DONE > $Q/DONE_G
