#!/bin/bash
# Round-4 successor watcher: watcher2 (PID in /tmp/r3_watch2.pid) is still
# probing and will run the (updated, round-4) queue when the TPU returns.
# This one only takes over if watcher2 dies or exhausts its probes, so two
# queues never race on the single chip. Exits once anyone started the queue.
cd /root/repo
W2_PID=$(cat /tmp/r3_watch2.pid 2>/dev/null)
for i in $(seq 1 200); do
  if grep -q "TPU back" /tmp/r3_tpu_back.log /tmp/r4_tpu_back.log 2>/dev/null; then
    echo "queue already started; r4 watcher exiting" >> /tmp/r4_probe_hist.log
    exit 0
  fi
  if [ -n "$W2_PID" ] && kill -0 "$W2_PID" 2>/dev/null; then
    sleep 180
    continue
  fi
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; import jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" 2>/tmp/r4_probe_err.log; then
    echo "TPU back (r4) at $(date)" | tee -a /tmp/r4_tpu_back.log
    bash scripts/r3_tpu_queue.sh > /tmp/r4_queue_full.log 2>&1
    echo "queue done at $(date)" >> /tmp/r4_tpu_back.log
    exit 0
  fi
  echo "probe $i failed at $(date)" >> /tmp/r4_probe_hist.log
  sleep 240
done
echo "r4 watcher gave up" >> /tmp/r4_tpu_back.log
