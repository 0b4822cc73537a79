#!/bin/bash
# r5f: giant-rate microbenchmark after r5e
set -x
cd /root/repo
Q=/root/repo/benchmarks/results/tpu_queue_r5
while [ ! -f $Q/DONE_E ]; do sleep 30; done
timeout 1800 python benchmarks/giant_rate_probe.py --iters 50 > $Q/giant_rate_probe.log 2>&1
echo QUEUE_R5F_DONE > $Q/DONE_F
