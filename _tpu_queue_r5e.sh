#!/bin/bash
# Round-5e TPU queue — maxG55 projection-engine probes (retry with
# realistic timeouts: the k=128 bucket at side 5000 compiles for
# minutes on axon, and the parity finalize pays a host eigh(5000)).
set -x
cd /root/repo
Q=/root/repo/benchmarks/results/tpu_queue_r5

while [ ! -f $Q/DONE_D ]; do sleep 30; done

timeout 1500 python benchmarks/parity.py --instances maxG55 \
  --time-limit 600 --no-warm-rerun \
  --opt subspace_rank=128 --opt log_verbose=true --opt log_freq=100 \
  --out $Q/maxG55_k128b.csv > $Q/maxG55_k128b.log 2>&1

timeout 1500 python benchmarks/parity.py --instances maxG55 \
  --time-limit 600 --no-warm-rerun \
  --opt rank_increment=0 --opt rank_increment_factor=2 \
  --opt log_verbose=true --opt log_freq=100 \
  --out $Q/maxG55_rmul.csv > $Q/maxG55_rmul.log 2>&1

echo QUEUE_R5E_DONE > $Q/DONE_E
