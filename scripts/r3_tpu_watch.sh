#!/bin/bash
# Poll TPU availability; when back, run the round-3 measurement queue.
cd /root/repo
for i in $(seq 1 80); do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; import jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" 2>/tmp/r3_probe_err.log; then
    echo "TPU back at $(date)" | tee /tmp/r3_tpu_back.log
    bash scripts/r3_tpu_queue.sh > /tmp/r3_queue_full.log 2>&1
    echo "queue done at $(date)" >> /tmp/r3_tpu_back.log
    exit 0
  fi
  echo "probe $i failed at $(date)" >> /tmp/r3_probe_hist.log
  sleep 240
done
echo "gave up" > /tmp/r3_tpu_back.log
