#!/bin/bash
# Successor watcher: takes over if the first watcher (PID in /tmp/r3_watch.pid)
# exhausts its 80 probes before the TPU returns. Defers while the first
# watcher is alive; exits as soon as the queue has been started by anyone.
cd /root/repo
FIRST_PID=$(cat /tmp/r3_watch.pid 2>/dev/null)
for i in $(seq 1 400); do
  if grep -q "TPU back" /tmp/r3_tpu_back.log 2>/dev/null; then
    echo "queue already started; watcher2 exiting" >> /tmp/r3_probe_hist.log
    exit 0
  fi
  if [ -n "$FIRST_PID" ] && kill -0 "$FIRST_PID" 2>/dev/null; then
    sleep 120
    continue
  fi
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; import jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" 2>/tmp/r3_probe_err.log; then
    echo "TPU back (watcher2) at $(date)" | tee -a /tmp/r3_tpu_back.log
    bash scripts/r3_tpu_queue.sh > /tmp/r3_queue_full.log 2>&1
    echo "queue done at $(date)" >> /tmp/r3_tpu_back.log
    exit 0
  fi
  echo "probe2 $i failed at $(date)" >> /tmp/r3_probe_hist.log
  sleep 240
done
echo "watcher2 gave up" >> /tmp/r3_tpu_back.log
