#!/bin/bash
# Round-3 measurement queue (run when the TPU returns). ONE TPU process at
# a time; each step logs to /tmp/r3q_*.log. Order: cheap contract check ->
# inference A/B (packed carry) -> head-major kernel A/B -> training A/B.
set -x
cd /root/repo

echo "=== 1. driver contract ==="
timeout 900 python scripts/check_entry.py 2>&1 | tail -3 | tee /tmp/r3q_entry.log

echo "=== 2. inference A/B: flat_fuseqkv vs packed ==="
timeout 1800 python scripts/r3_model_ab.py flat_fuseqkv packed 2>&1 | tail -5 | tee /tmp/r3q_ab.log

echo "=== 3. head-major attention kernel A/B ==="
timeout 1800 python scripts/r3_attn_headmajor.py 2>&1 | tail -12 | tee /tmp/r3q_hm.log

echo "=== 4. training A/B: packed vs current default ==="
timeout 1800 python scripts/check_train_step_tpu.py hybrid 32 2>&1 | tail -3 | tee /tmp/r3q_train_base.log
timeout 1800 python scripts/check_train_step_tpu.py hybrid 32 --packed 2>&1 | tail -3 | tee /tmp/r3q_train_packed.log

echo "=== 5. fwd traces (shared-cost split) ==="
timeout 1800 python scripts/trace_model.py hybrid_fuseqkv 50 > /tmp/r3q_trace_fwd_hybrid.log 2>&1
timeout 1800 python scripts/trace_model.py standard 50 > /tmp/r3q_trace_fwd_std.log 2>&1

echo "=== 6. train traces (remainder hunt) ==="
timeout 2400 python scripts/trace_train.py hybrid 60 > /tmp/r3q_trace_train_hybrid.log 2>&1
timeout 2400 python scripts/trace_train.py standard 60 > /tmp/r3q_trace_train_std.log 2>&1
echo "queue all done"

echo "=== 7. maskquad octic kernel A/B ==="
timeout 1800 python scripts/r3_attn_bwd_ablate.py --quad-only 2>&1 | tail -8 | tee /tmp/r3q_quad.log

echo "=== 8. model-level group-4 A/B (inference, bench protocol) ==="
timeout 1800 python scripts/r3_model_ab.py flat_fuseqkv 2>&1 | tail -3 | tee /tmp/r3q_g2_model.log
OCTIC_ATTN_GROUP=4 timeout 1800 python scripts/r3_model_ab.py flat_fuseqkv 2>&1 | tail -3 | tee /tmp/r3q_g4_model.log
OCTIC_ATTN_GROUP=8 timeout 1800 python scripts/r3_model_ab.py flat_fuseqkv 2>&1 | tail -3 | tee /tmp/r3q_g8_model.log

echo "=== 9. training A/B: attention group 4 (bwd effect) ==="
OCTIC_ATTN_GROUP=4 timeout 1800 python scripts/check_train_step_tpu.py hybrid 32 2>&1 | tail -3 | tee /tmp/r3q_train_g4.log

echo "=== 10. bench.py refresh (best-known defaults) ==="
timeout 3600 python bench.py 2>&1 | tail -3 | tee /tmp/r3q_bench.log
echo "queue v2 all done"

echo "=== 11. packed x group-4 combo (inference) ==="
OCTIC_ATTN_GROUP=4 timeout 1800 python scripts/r3_model_ab.py packed 2>&1 | tail -3 | tee /tmp/r3q_packed_g4.log
echo "queue v3 all done"
