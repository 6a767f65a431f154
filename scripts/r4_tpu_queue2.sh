#!/bin/bash
# Round-4 follow-up TPU queue (run AFTER bench.py validation; one TPU
# process at a time). Produces:
#   * the standard-model training baseline (the r3 queue's `standard` arg
#     silently no-opped -- script expects `std`)
#   * the two-sided SSL L/16 ratio with remat on BOTH sides (hybrid L/16
#     at B=16 OOMs by ~0.7G without remat)
#   * a refreshed train trace with OCTIC_FLAT_LN_VJP default ON
#   * an XLA HLO dump of the inference forward for the octic-glue hunt
set -x
cd /root/repo

echo "=== 1. standard training baseline B=32 ==="
timeout 1800 python scripts/check_train_step_tpu.py std 32 2>&1 | tail -3 | tee /tmp/r4q2_train_std.log

echo "=== 2. SSL L/16 two-sided with remat ==="
timeout 2400 python scripts/bench_ssl_step.py hybrid 16 --size large --remat 2>&1 | tail -6 | tee /tmp/r4q2_ssl_hybrid_l16.log
timeout 2400 python scripts/bench_ssl_step.py standard 16 --size large --remat 2>&1 | tail -6 | tee /tmp/r4q2_ssl_std_l16.log

echo "=== 3. refreshed train trace (LN-VJP on) ==="
timeout 2400 python scripts/trace_train.py hybrid 60 > /tmp/r4q2_trace_train_hybrid.log 2>&1

echo "=== 4. fwd HLO dump (octic glue hunt) ==="
rm -rf /tmp/xla_dump_fwd
# fresh cache dir so XLA actually recompiles (a cache hit skips the dump)
JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_dump \
  XLA_FLAGS="--xla_dump_to=/tmp/xla_dump_fwd --xla_dump_hlo_as_text" \
  timeout 2400 python scripts/trace_model.py hybrid_fuseqkv 60 > /tmp/r4q2_trace_fwd_hybrid.log 2>&1

echo "=== 5. train HLO dump (stacked-grad DUS hunt) ==="
rm -rf /tmp/xla_dump_train
JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_dump_train \
  XLA_FLAGS="--xla_dump_to=/tmp/xla_dump_train --xla_dump_hlo_as_text" \
  timeout 2400 python scripts/trace_train.py standard 60 > /tmp/r4q2_trace_train_std_dump.log 2>&1

echo "queue2 all done"
