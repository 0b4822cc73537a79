#!/bin/bash
# poll the TPU backend; when it answers, launch the queue
while true; do
  if timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
    echo "TPU BACK at $(date)" > /tmp/q_watch.log
    bash /root/repo/_tpu_queue.sh >> /tmp/q_watch.log 2>&1
    exit 0
  fi
  sleep 120
done
