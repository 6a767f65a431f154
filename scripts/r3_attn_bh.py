"""Grid-(b, h) attention: one head per grid step, q/k/v delivered as FULL
BlockSpec blocks (1, N, 128) from a 128-stride padded qkv layout
[B, N, 3*H*128]. Hypothesis (from r3_attn_ablate): per-head operand
slicing inside the kernel costs ~0.4 us/operand because Mosaic copies
every sliced matmul operand; full-block operands delivered by the DMA
pipeline avoid the copy entirely and overlap the fetch with compute.

Variants:
  std-bh     : padded out blocks (1, N, 128) at (b, 0, h)   [aligned store]
  octic-bh   : natural per-irrep outputs resident at (b, 0, 0),
               per-step dynamic scatter stores                [octic tax]

Run: python scripts/r3_attn_bh.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from octic_vits_tpu.ops.pallas_attention import (
    _attn_head,
    octic_attention,
    standard_attention,
)
from octic_vits_tpu.utils.benchlib import measure_steps

B, H, N = 64, 16, 257
C = 1280
C8 = C // 8
D1 = C8 // H
DE = 2 * C8 // H
DH = C // H
DHP = 128
SCALE = DH ** -0.5
DT = jnp.bfloat16


def k_bh_std(qp, kp, vp, o):
    out = _attn_head(qp[0], kp[0], vp[0], SCALE, qp.dtype)
    o[0] = out.astype(qp.dtype)


def k_bh_octic(qp, kp, vp, o1, o2, o3, o4, oe0, oe1):
    dtype = qp.dtype
    h = pl.program_id(1)
    out = _attn_head(qp[0], kp[0], vp[0], SCALE, dtype)
    outs = (o1, o2, o3, o4)
    for g in range(4):
        outs[g][0, :, pl.ds(h * D1, D1)] = (
            out[:, g * D1:(g + 1) * D1].astype(dtype)
        )
    for r, oref in ((0, oe0), (1, oe1)):
        off = 4 * D1 + r * DE
        oref[0, :, pl.ds(h * DE, DE)] = out[:, off:off + DE].astype(dtype)


def _in_specs_bh():
    return [
        pl.BlockSpec((1, N, DHP), lambda b, h, s=s: (b, 0, s * H + h),
                     memory_space=pltpu.VMEM)
        for s in range(3)
    ]


def call_std_bh(qkvp):
    return pl.pallas_call(
        k_bh_std,
        grid=(B, H),
        in_specs=_in_specs_bh(),
        out_specs=pl.BlockSpec((1, N, DHP), lambda b, h: (b, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, H * DHP), DT),
        interpret=jax.default_backend() == "cpu",
    )(qkvp, qkvp, qkvp)


def call_octic_bh(qkvp):
    shapes = (
        *(jax.ShapeDtypeStruct((B, N, C8), DT) for _ in range(4)),
        jax.ShapeDtypeStruct((B, N, 2 * C8), DT),
        jax.ShapeDtypeStruct((B, N, 2 * C8), DT),
    )
    return pl.pallas_call(
        k_bh_octic,
        grid=(B, H),
        in_specs=_in_specs_bh(),
        out_specs=tuple(
            pl.BlockSpec((1,) + s.shape[1:], lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM)
            for s in shapes
        ),
        out_shape=shapes,
        interpret=jax.default_backend() == "cpu",
    )(qkvp, qkvp, qkvp)


def bench(name, fn, params):
    x = jnp.zeros((1,), DT)
    step = measure_steps(fn, params, x, k1=2, k2=22)
    print(f"{name:34s} {step*1e6:9.1f} us", flush=True)
    return step


def pad_qkv(qkv):
    """[B, N, 3*H*80] (s, h, dh) -> [B, N, 3*H*128] zero-padded slots."""
    idx = jnp.arange(3 * H * DHP)
    keep = (idx % DHP) < DH
    src = jnp.where(keep, (idx // DHP) * DH + (idx % DHP), 0)
    return jnp.where(keep[None, None, :], qkv[:, :, src], 0).astype(qkv.dtype)


def main():
    qkv = (jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C)) * 0.02
           ).astype(DT)
    qkvp = pad_qkv(qkv)

    # numerics: std-bh unpadded columns match standard_attention
    ref = standard_attention(qkv, H, False)
    got = call_std_bh(qkvp)
    gotn = got.reshape(B, N, H, DHP)[..., :DH].reshape(B, N, C)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                gotn.astype(jnp.float32))))
    print(f"std-bh max err: {err:.5f}", flush=True)
    assert err < 2e-2

    def run_std_bh(params, x):
        q = jnp.maximum(params[0], x - 100.0)
        return jnp.max(call_std_bh(q))

    def run_octic_bh(params, x):
        q = jnp.maximum(params[0], x - 100.0)
        return jnp.stack([jnp.max(o) for o in call_octic_bh(q)])

    def run_std_cur(params, x):
        q = jnp.maximum(params[0], x - 100.0)
        return jnp.max(standard_attention(q, H, False))

    bench("std current (natural)", run_std_cur, (qkv,))
    bench("std grid-(b,h) padded", run_std_bh, (qkvp,))
    # octic scatter variant: dynamic-offset stores must be 128-aligned
    # (Mosaic constraint) — padded-out variant below instead
    bench("octic grid-(b,h) padded out", run_std_bh, (qkvp,))


if __name__ == "__main__":
    main()
