"""Round-3 experiment: HEAD-MAJOR standard attention kernel.

Hypothesis: the std attention kernel's floor is Mosaic's per-sliced-operand
copy (~0.35 us x 48 lane slices per image, BENCH.md cost law). If qkv is
pre-transposed to head-major [B, 3, H, N, dh], the kernel can index heads on
a LEADING dim (contiguous sub-buffer, no lane copy) and should drop toward
its matmul+softmax floor (~0.5 ms vs ~1.03 at ViT-H B=64). The XLA-side
transpose costs ~126 MB r+w (~0.3 ms) — net win iff leading-dim indexing is
actually copy-free in Mosaic (dead ends #3/#6 tried per-head DMA grids and
batched matmuls, NOT an in-kernel loop over leading-dim slices).

Usage: python scripts/r3_attn_headmajor.py [--cpu]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.ops.pallas_attention import (
    _attn_head,
    _attn_head_bwd,
    _auto_interpret,
    standard_attention,
)

B, N, C, H = 64, 257, 1280, 16
DH = C // H


def _hm_fwd_kernel(qkv, o, *, num_heads, scale):
    dtype = qkv.dtype
    for h in range(num_heads):
        q = qkv[0, 0, h]
        k = qkv[0, 1, h]
        v = qkv[0, 2, h]
        o[0, h] = _attn_head(q, k, v, scale, dtype).astype(dtype)


def headmajor_attention(qkv_hm, num_heads, interpret=None):
    """qkv_hm [B, 3, H, N, dh] -> out [B, H, N, dh]."""
    b, _, nh, n, dh = qkv_hm.shape
    scale = dh ** -0.5
    return pl.pallas_call(
        functools.partial(_hm_fwd_kernel, num_heads=num_heads, scale=scale),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 3, nh, n, dh), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nh, n, dh), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nh, n, dh), qkv_hm.dtype),
        interpret=_auto_interpret(interpret),
    )(qkv_hm)


def _hm_bwd_kernel(qkv, g, dqkv, *, num_heads, scale):
    dtype = qkv.dtype
    for h in range(num_heads):
        q = qkv[0, 0, h]
        k = qkv[0, 1, h]
        v = qkv[0, 2, h]
        gh = g[0, h]
        dq, dk, dv = _attn_head_bwd(q, k, v, gh, scale, dtype)
        dqkv[0, 0, h] = dq.astype(dtype)
        dqkv[0, 1, h] = dk.astype(dtype)
        dqkv[0, 2, h] = dv.astype(dtype)


def headmajor_attention_bwd(qkv_hm, g_hm, num_heads, interpret=None):
    b, _, nh, n, dh = qkv_hm.shape
    scale = dh ** -0.5
    return pl.pallas_call(
        functools.partial(_hm_bwd_kernel, num_heads=num_heads, scale=scale),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, nh, n, dh), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, n, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, nh, n, dh), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qkv_hm.shape, qkv_hm.dtype),
        interpret=_auto_interpret(interpret),
    )(qkv_hm, g_hm)


def to_headmajor(qkv):
    """[B, N, 3C] (feature order (3, H, dh)) -> [B, 3, H, N, dh]."""
    b, n, w = qkv.shape
    return qkv.reshape(b, n, 3, H, DH).transpose(0, 2, 3, 1, 4)


def from_headmajor(o_hm):
    """[B, H, N, dh] -> [B, N, C]."""
    b, nh, n, dh = o_hm.shape
    return o_hm.transpose(0, 2, 1, 3).reshape(b, n, nh * dh)


def check_parity():
    k = jax.random.PRNGKey(0)
    qkv = jax.random.normal(k, (2, 13, 3 * C), jnp.float32)
    ref = standard_attention(qkv, H)
    got = from_headmajor(headmajor_attention(to_headmajor(qkv), H))
    print("fwd max diff:", float(jnp.abs(ref - got).max()))
    g = jax.random.normal(jax.random.PRNGKey(1), ref.shape)
    dref = jax.vjp(lambda q: standard_attention(q, H), qkv)[1](g)[0]
    dhm = headmajor_attention_bwd(to_headmajor(qkv), to_headmajor(
        jnp.concatenate([g, g, g], axis=-1))[:, 0], H)
    # rebuild [B,N,3C] from head-major dqkv
    b, _, nh, n, dh = dhm.shape
    dgot = dhm.transpose(0, 3, 1, 2, 4).reshape(b, n, 3 * nh * dh)
    print("bwd max diff:", float(jnp.abs(dref - dgot).max()))


def _bench(name, fn, args, feedback_idx=0):
    from octic_vits_tpu.utils.benchlib import measure_steps

    x = jnp.zeros((), jnp.bfloat16)

    def run(params, xx):
        parts = list(params)
        i = feedback_idx
        parts[i] = parts[i] + xx * jnp.asarray(1e-30, parts[i].dtype)
        outs = fn(*parts)
        if isinstance(outs, (tuple, list)):
            return jnp.stack([jnp.max(o) for o in outs])
        return jnp.max(outs)

    step = measure_steps(run, tuple(args), x, k1=2, k2=22)
    print(f"{name:28s} {step*1e6:9.1f} us", flush=True)
    return step


def bench():
    k = jax.random.PRNGKey(0)
    qkv = (jax.random.normal(k, (B, N, 3 * C)) * 0.02).astype(jnp.bfloat16)
    qkv_hm = to_headmajor(qkv)

    _bench("std fwd kernel", lambda x: standard_attention(x, H), (qkv,))
    _bench("headmajor fwd kernel",
           lambda x: headmajor_attention(x, H), (qkv_hm,))
    _bench("transpose+hm fwd",
           lambda x: headmajor_attention(to_headmajor(x), H), (qkv,))
    _bench("transpose+hm+untranspose",
           lambda x: from_headmajor(headmajor_attention(to_headmajor(x), H)),
           (qkv,))
    _bench("transpose alone", to_headmajor, (qkv,))

    Bb = 32
    qkv32 = qkv[:Bb]
    qkv_hm32 = to_headmajor(qkv32)
    g32 = (jax.random.normal(k, (Bb, N, C)) * 0.02).astype(jnp.bfloat16)
    g_hm32 = to_headmajor(jnp.concatenate([g32, g32, g32], axis=-1))[:, 0]
    _bench("std bwd kernel (B=32)",
           lambda x, gg: jax.vjp(
               lambda q: standard_attention(q, H), x)[1](gg)[0],
           (qkv32, g32))
    _bench("headmajor bwd kernel",
           lambda x, gg: headmajor_attention_bwd(x, gg, H),
           (qkv_hm32, g_hm32))
    _bench("T+hm bwd+unT",
           lambda x, gg: headmajor_attention_bwd(
               to_headmajor(x), gg, H
           ).transpose(0, 3, 1, 2, 4).reshape(Bb, N, 3 * C),
           (qkv32, g_hm32))


if __name__ == "__main__":
    check_parity()
    if "--cpu" not in sys.argv:
        bench()
