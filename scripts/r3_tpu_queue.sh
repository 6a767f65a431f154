#!/bin/bash
# Round-4 measurement queue (run when the TPU returns). ONE TPU process at
# a time; each step logs to /tmp/r4q_*.log. Highest-value first in case the
# backend drops again mid-queue:
#   driver contract -> bench.py (driver-verified headline) -> landing A/Bs
#   (packed carry, attention group) -> training A/Bs -> SSL L/16 two-sided
#   ratio (VERDICT item 9) -> traces for the octic bwd glue hunt.
set -x
cd /root/repo

echo "=== 1. driver contract ==="
timeout 900 python scripts/check_entry.py 2>&1 | tail -3 | tee /tmp/r4q_entry.log

echo "=== 2. headline bench (driver protocol) ==="
BENCH_BUDGET_S=900 timeout 1000 python bench.py 2>&1 | tail -5 | tee /tmp/r4q_bench.log

echo "=== 3. inference A/B: flat_fuseqkv vs packed ==="
timeout 1800 python scripts/r3_model_ab.py flat_fuseqkv packed 2>&1 | tail -5 | tee /tmp/r4q_ab_packed.log

echo "=== 4. inference A/B: attention group 2 (default) vs 4 vs 8 ==="
timeout 1800 python scripts/r3_model_ab.py flat_fuseqkv 2>&1 | tail -3 | tee /tmp/r4q_g2.log
OCTIC_ATTN_GROUP=4 timeout 1800 python scripts/r3_model_ab.py flat_fuseqkv 2>&1 | tail -3 | tee /tmp/r4q_g4.log
OCTIC_ATTN_GROUP=8 timeout 1800 python scripts/r3_model_ab.py flat_fuseqkv 2>&1 | tail -3 | tee /tmp/r4q_g8.log

echo "=== 5. training A/B: baseline / packed / group-4 / flat-LN VJP ==="
timeout 1800 python scripts/check_train_step_tpu.py hybrid 32 2>&1 | tail -3 | tee /tmp/r4q_train_base.log
timeout 1800 python scripts/check_train_step_tpu.py hybrid 32 --packed 2>&1 | tail -3 | tee /tmp/r4q_train_packed.log
OCTIC_ATTN_GROUP=4 timeout 1800 python scripts/check_train_step_tpu.py hybrid 32 2>&1 | tail -3 | tee /tmp/r4q_train_g4.log
timeout 1800 python scripts/check_train_step_tpu.py std 32 2>&1 | tail -3 | tee /tmp/r4q_train_std.log
# analytic LN backward (targets the 1.07 ms/block octic bwd
# norm/ls/residual glue): covers BOTH the default flat-E tuple carry and
# the packed flat carry
OCTIC_FLAT_LN_VJP=1 timeout 1800 python scripts/check_train_step_tpu.py hybrid 32 2>&1 | tail -3 | tee /tmp/r4q_train_lnvjp.log
OCTIC_FLAT_LN_VJP=1 timeout 1800 python scripts/check_train_step_tpu.py hybrid 32 --packed 2>&1 | tail -3 | tee /tmp/r4q_train_packed_lnvjp.log

echo "=== 6. SSL L/16 two-sided ratio (VERDICT item 9) ==="
timeout 2400 python scripts/bench_ssl_step.py hybrid 16 --size large 2>&1 | tail -30 | tee /tmp/r4q_ssl_hybrid_l16.log
timeout 2400 python scripts/bench_ssl_step.py standard 16 --size large 2>&1 | tail -30 | tee /tmp/r4q_ssl_std_l16.log

echo "=== 7. train traces (octic bwd glue hunt: norm/ls/residual 1.07 vs 0.48) ==="
timeout 2400 python scripts/trace_train.py hybrid 60 > /tmp/r4q_trace_train_hybrid.log 2>&1
timeout 2400 python scripts/trace_train.py standard 60 > /tmp/r4q_trace_train_std.log 2>&1

echo "=== 8. fwd traces (0.35 ms/block octic waste hunt) ==="
timeout 1800 python scripts/trace_model.py hybrid_fuseqkv 50 > /tmp/r4q_trace_fwd_hybrid.log 2>&1

echo "queue all done"
