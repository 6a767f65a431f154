"""Decompose the fused attention kernel's time at hybrid ViT-H shapes
(B=64, H=16, N=257, dh=80, bf16).

The octic and standard kernels do IDENTICAL matmul+softmax work; they differ
only in how many misaligned channel slices/concats/scatter-stores they do
per head (octic: 18 loads + 3 concats + 6 stores; standard: 3 loads +
1 store). Two synthetic variants with lane-aligned fake slices separate the
load-side cost from the store-side cost from the compute floor:

  current octic      = loads + stores + compute
  aligned-loads      =         stores + compute   (fake 128-aligned q/k/v)
  aligned-everything =                  compute   (single wide store)

All variants read the same bytes and share the same perturbation harness, so
pairwise differences are clean. Run on TPU: python scripts/profile_attn_kernel.py
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
    _attn_head, octic_attention, standard_attention,
)
from octic_vits_tpu.utils.benchlib import measure_steps

B, H, N = 64, 16, 257
C = 1280
C8 = C // 8          # 160
D1 = C8 // H         # 10
DE = 2 * C8 // H     # 20
DH = C // H          # 80
SCALE = DH ** -0.5
DT = jnp.bfloat16


def _perturbed(params, x):
    return tuple(p + x for p in params)


def bench(name, fn, params):
    x = jnp.zeros((1,), DT)
    step = measure_steps(fn, params, x, k1=2, k2=22)
    print(f"{name:34s} {step*1e6:9.1f} us", flush=True)
    return step


# --- synthetic kernels: same compute, lane-aligned fake slices -------------

def _aligned_loads_kernel(a1, a2, b1, b2, e0, e1, o1, o2, o3, o4, oe0, oe1):
    dtype = a1.dtype
    del e0, e1
    for h in range(H):
        base = 128 * (h % 3)
        q = a1[0][:, base : base + DH]
        k = a2[0][:, base : base + DH]
        v = b1[0][:, base : base + DH]
        out = _attn_head(q, k, v, SCALE, dtype)
        outs = (o1, o2, o3, o4)
        for g in range(4):
            outs[g][0, :, h * D1 : (h + 1) * D1] = (
                out[:, g * D1 : (g + 1) * D1].astype(dtype)
            )
        for r, oref in ((0, oe0), (1, oe1)):
            off = 4 * D1 + r * DE
            oref[0, :, h * DE : (h + 1) * DE] = (
                out[:, off : off + DE].astype(dtype)
            )


def _aligned_all_kernel(a1, a2, b1, b2, e0, e1, o):
    dtype = a1.dtype
    del b2, e0, e1
    for h in range(H):
        base = 128 * (h % 3)
        q = a1[0][:, base : base + DH]
        k = a2[0][:, base : base + DH]
        v = b1[0][:, base : base + DH]
        out = _attn_head(q, k, v, SCALE, dtype)
        o[0, :, h * 128 : h * 128 + DH] = out.astype(dtype)


def _attn_head_nosm(q, k, v, scale, out_dtype):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    return jnp.dot(s.astype(out_dtype), v, preferred_element_type=jnp.float32)


def _attn_head_cheapsm(q, k, v, scale, out_dtype):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp((s - m).astype(out_dtype))
    den = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    return o * (1.0 / den)


def _aligned_all_variant(head_fn):
    def kernel(a1, a2, b1, b2, e0, e1, o):
        dtype = a1.dtype
        del b2, e0, e1
        for h in range(H):
            base = 128 * (h % 3)
            q = a1[0][:, base : base + DH]
            k = a2[0][:, base : base + DH]
            v = b1[0][:, base : base + DH]
            out = head_fn(q, k, v, SCALE, dtype)
            o[0, :, h * 128 : h * 128 + DH] = out.astype(dtype)
    return kernel


def _wide_in_kernel(qkv, o1, o2, o3, o4, oe0, oe1):
    """Wide interleaved qkv [N, 3C]: per head ONE 80-wide slice per q/k/v
    (the standard kernel's cheap load pattern); octic scatter stores."""
    dtype = qkv.dtype
    for h in range(H):
        q = qkv[0][:, (0 * H + h) * DH : (0 * H + h + 1) * DH]
        k = qkv[0][:, (1 * H + h) * DH : (1 * H + h + 1) * DH]
        v = qkv[0][:, (2 * H + h) * DH : (2 * H + h + 1) * DH]
        out = _attn_head(q, k, v, SCALE, dtype)
        outs = (o1, o2, o3, o4)
        for g in range(4):
            outs[g][0, :, h * D1 : (h + 1) * D1] = (
                out[:, g * D1 : (g + 1) * D1].astype(dtype)
            )
        for r, oref in ((0, oe0), (1, oe1)):
            off = 4 * D1 + r * DE
            oref[0, :, h * DE : (h + 1) * DE] = (
                out[:, off : off + DE].astype(dtype)
            )


def _interleave_wide(arrs):
    """XLA-side column permutation: (a1,a2,b1,b2,e0,e1) per-irrep qkv
    arrays -> ONE [B, N, 3C] with order (s, head, [a1|a2|b1|b2|e0|e1])."""
    a1, a2, b1, b2, e0, e1 = arrs
    pieces = []
    for s in range(3):
        for h in range(H):
            for arr, d in ((a1, D1), (a2, D1), (b1, D1), (b2, D1),
                           (e0, DE), (e1, DE)):
                off = (s * H + h) * d
                pieces.append(arr[:, :, off : off + d])
    return jnp.concatenate(pieces, axis=2)


def _call_synth(kernel, out_shapes, args):
    in_specs = [
        pl.BlockSpec((1,) + a.shape[1:], lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)
        for a in args
    ]
    out_specs = tuple(
        pl.BlockSpec((1,) + s.shape[1:], lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)
        for s in out_shapes
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(out_shapes),
        interpret=jax.default_backend() == "cpu",
    )(*args)


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), 7)
    ones = tuple(
        (jax.random.normal(keys[i], (B, N, 3 * C8)) * 0.02).astype(DT)
        for i in range(4)
    )
    es = tuple(
        (jax.random.normal(keys[4 + i], (B, N, 6 * C8)) * 0.02).astype(DT)
        for i in range(2)
    )
    qkv = (jax.random.normal(keys[6], (B, N, 3 * C)) * 0.02).astype(DT)

    def perturb_only(params, x):
        arrs = _perturbed(params, x)
        return jnp.stack([jnp.max(a) for a in arrs])

    def run_octic(params, x):
        arrs = _perturbed(params, x)
        outs = octic_attention(*arrs, H, False)
        return jnp.stack([jnp.max(o) for o in outs])

    def run_std(params, x):
        (p,) = _perturbed(params, x)
        return jnp.max(standard_attention(p, H, False))

    def run_aligned_loads(params, x):
        arrs = _perturbed(params, x)
        shapes = (
            *(jax.ShapeDtypeStruct((B, N, C8), DT) for _ in range(4)),
            jax.ShapeDtypeStruct((B, N, 2 * C8), DT),
            jax.ShapeDtypeStruct((B, N, 2 * C8), DT),
        )
        outs = _call_synth(_aligned_loads_kernel, shapes, arrs)
        return jnp.stack([jnp.max(o) for o in outs])

    def run_aligned_all(params, x):
        arrs = _perturbed(params, x)
        shapes = (jax.ShapeDtypeStruct((B, N, 128 * H), DT),)
        outs = _call_synth(_aligned_all_kernel, shapes, arrs)
        return jnp.max(outs[0])

    def make_runner(head_fn):
        def run(params, x):
            arrs = _perturbed(params, x)
            shapes = (jax.ShapeDtypeStruct((B, N, 128 * H), DT),)
            outs = _call_synth(_aligned_all_variant(head_fn), shapes, arrs)
            return jnp.max(outs[0])
        return run

    t0 = bench("perturb floor (6 adds)", perturb_only, ones + es)
    ts = bench("standard kernel", run_std, (qkv,))
    toc = bench("octic kernel (current)", run_octic, ones + es)
    tal = bench("aligned loads, octic stores", run_aligned_loads, ones + es)
    taa = bench("aligned everything", run_aligned_all, ones + es)
    tns = bench("aligned, NO softmax", make_runner(_attn_head_nosm), ones + es)
    tcs = bench("aligned, cheap softmax", make_runner(_attn_head_cheapsm),
                ones + es)

    def run_wide(params, x):
        arrs = _perturbed(params, x)
        wide = _interleave_wide(arrs)
        shapes = (
            *(jax.ShapeDtypeStruct((B, N, C8), DT) for _ in range(4)),
            jax.ShapeDtypeStruct((B, N, 2 * C8), DT),
            jax.ShapeDtypeStruct((B, N, 2 * C8), DT),
        )
        outs = _call_synth(_wide_in_kernel, shapes, (wide,))
        return jnp.stack([jnp.max(o) for o in outs])

    def run_interleave_only(params, x):
        arrs = _perturbed(params, x)
        return jnp.max(_interleave_wide(arrs))

    til = bench("xla interleave only", run_interleave_only, ones + es)
    twd = bench("xla interleave + wide kernel", run_wide, ones + es)

    print()
    print(f"softmax share         : {(taa - tns)*1e6:9.1f} us")
    print(f"cheap-softmax floor   : {(tcs - t0)*1e6:9.1f} us "
          f"(vs f32 {(taa - t0)*1e6:.1f})")
    print(f"interleave+wide net   : {(twd - t0)*1e6:9.1f} us "
          f"(interleave alone {(til - t0)*1e6:.1f}) vs octic "
          f"{(toc - t0)*1e6:.1f}")
    print(f"octic kernel net      : {(toc - t0)*1e6:9.1f} us")
    print(f"standard kernel net   : {(ts - t0)*1e6:9.1f} us")
    print(f"  (std perturbs 1 array of the SAME total bytes -> same floor)")
    print(f"load-side cost (octic): {(toc - tal)*1e6:9.1f} us")
    print(f"store-side cost       : {(tal - taa)*1e6:9.1f} us")
    print(f"compute floor         : {(taa - t0)*1e6:9.1f} us")
    flops = 4 * B * N * N * C
    print(f"roofline @182 TF/s    : {flops/182e12*1e6:9.1f} us (matmuls only)")


if __name__ == "__main__":
    main()
