"""Attention implementation shootout at ViT-H shapes (B=64, H=16, N=257,
dh=80): jax.nn.dot_product_attention vs manual einsum vs Pallas flash
attention (padded) — the block profile showed attention is ~5.5ms of the
~8.5ms block."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.utils.benchlib import measure_steps

B, H, N, DH = 64, 16, 257, 80
DT = jnp.bfloat16
SCALE = DH ** -0.5


def bench(name, fn, q):
    # params slot unused; feed q as the data input
    step = measure_steps(lambda _p, x: fn(x), None, q, k1=2, k2=22)
    print(f"{name:44s} {step*1e3:8.3f} ms", flush=True)


q = jnp.zeros((B, N, H, DH), DT)  # BTNH


def dpa(x):
    return jax.nn.dot_product_attention(x, x, x)


def einsum_f32_softmax(x):
    logits = jnp.einsum("bqhd,bkhd->bhqk", x, x) * SCALE
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, x)


def einsum_bf16_softmax(x):
    logits = jnp.einsum("bqhd,bkhd->bhqk", x, x) * SCALE
    probs = jax.nn.softmax(logits, -1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, x)


def einsum_bhnd(x):
    xt = x.transpose(0, 2, 1, 3)  # BHND
    logits = jnp.einsum("bhqd,bhkd->bhqk", xt, xt) * SCALE
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, xt)
    return out.transpose(0, 2, 1, 3)


def flash_padded(x):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )

    npad = 384
    xt = x.transpose(0, 2, 1, 3)  # BHND
    pad = [(0, 0), (0, 0), (0, npad - N), (0, 0)]
    xp = jnp.pad(xt, pad)
    seg = jnp.concatenate(
        [jnp.zeros((B, N), jnp.int32), jnp.ones((B, npad - N), jnp.int32)],
        axis=1,
    )
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    bs = BlockSizes(
        block_q=128, block_k_major=128, block_k=128, block_b=1,
        block_q_major_dkv=128, block_k_major_dkv=128, block_k_dkv=128,
        block_q_dkv=128, block_k_major_dq=128, block_k_dq=128, block_q_dq=128,
    )
    out = flash_attention(
        xp, xp, xp, segment_ids=SegmentIds(q=seg, kv=seg),
        sm_scale=SCALE, block_sizes=bs,
    )
    return out[:, :, :N].transpose(0, 2, 1, 3)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "dpa"):
    bench("jax.nn.dot_product_attention (BTNH)", dpa, q)
if which in ("all", "einsum"):
    bench("einsum, fp32 softmax (BTNH in/out)", einsum_f32_softmax, q)
    bench("einsum, bf16 softmax", einsum_bf16_softmax, q)
    bench("einsum via BHND transpose", einsum_bhnd, q)
if which in ("all", "flash"):
    try:
        bench("pallas flash_attention (pad 384 + seg)", flash_padded, q)
    except Exception as e:
        print("flash failed:", repr(e)[:300], flush=True)
