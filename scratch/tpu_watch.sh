#!/bin/sh
# Watch for TPU tunnel recovery; on first success, run the measurement queue.
# Runs inside tmux (no harness timeout).  Log: /tmp/tpu_watch.log
cd /root/repo
while true; do
  echo "$(date -u +%H:%M:%S) probe..." >> /tmp/tpu_watch.log
  if timeout 180 python -c "import jax; d=jax.devices(); print(d)" >> /tmp/tpu_watch.log 2>&1; then
    echo "$(date -u +%H:%M:%S) TPU BACK — starting queue" >> /tmp/tpu_watch.log
    sh scratch/tpu_queue.sh >> /tmp/tpu_watch.log 2>&1
    echo "$(date -u +%H:%M:%S) QUEUE FINISHED" >> /tmp/tpu_watch.log
    break
  fi
  sleep 600
done
