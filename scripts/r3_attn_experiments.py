"""Round-3 octic attention fwd experiments (ViT-H shapes, B=64, bf16).

Two levers measured head-to-head against the shipping kernels:

1. HOISTED ASSEMBLY: do all per-head q/k/v channel assembly (the measured
   ~600us/B64 vreg-shuffle tax) into a 128-padded VMEM scratch in ONE pass,
   then run the per-head attention loop on aligned scratch slices. The
   assembly ops have no data dependence on any matmul, so Mosaic's
   scheduler is free to overlap VPU shuffles with MXU work.

2. CLS-SPLIT: N=257 pads to 384 lanes in the scores matmul and to K=384 in
   the AV matmul (1.5x MXU waste each). Split the keys as [256 | 1]: the
   first 256 keys hit the MXU at exactly 2 lane tiles, the last key is a
   rank-1 VPU update folded into the softmax. Shared floor: helps octic and
   standard equally (ratio-positive since std blocks outnumber octic 2:1
   model-wide).

Run on TPU: python scripts/r3_attn_experiments.py
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
    _octic_slices,
    octic_attention,
    standard_attention,
)
from octic_vits_tpu.utils.benchlib import measure_steps

B, H, N = 64, 16, 257
C = 1280
C8 = C // 8
D1 = C8 // H          # 10
DE = 2 * C8 // H      # 20
DH = C // H           # 80
DHP = 128             # padded per-head stride in scratch
NKM = 256             # aligned key block; key NKM..N-1 handled rank-1
SCALE = DH ** -0.5
DT = jnp.bfloat16


def _attn_head_split(q, k, v, scale, out_dtype):
    """Fast-softmax attention with keys split [NKM | rest] so the scores
    matmul runs at 256 output lanes and AV contracts K=256 (vs 384-padded).
    bf16-path numerics identical in structure to _attn_head."""
    f32 = jnp.float32
    km, kl = k[:NKM], k[NKM:]
    vm, vl = v[:NKM], v[NKM:]
    s_main = jax.lax.dot_general(
        q, km, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ) * scale                                             # [N, 256]
    # rank-1 tail on the VPU (a [N,1]-lane matmul trips a Mosaic
    # verification bug and would waste a full MXU pass anyway)
    s_last = jnp.sum(
        q.astype(f32) * kl.astype(f32), axis=1, keepdims=True
    ) * scale                                             # [N, 1]
    m = jnp.maximum(
        jnp.max(s_main, axis=1, keepdims=True),
        jnp.max(s_last, axis=1, keepdims=True),
    )
    if out_dtype == jnp.bfloat16:
        p_main = jnp.exp((s_main - m).astype(out_dtype))
        p_last = jnp.exp((s_last - m).astype(f32))
        inv = 1.0 / (
            jnp.sum(p_main.astype(f32), axis=1, keepdims=True)
            + jnp.sum(p_last, axis=1, keepdims=True)
        )
        out = jnp.dot(p_main, vm, preferred_element_type=f32)
        out = out + p_last * vl.astype(f32)
        return out * inv
    p_main = jnp.exp(s_main - m)
    p_last = jnp.exp(s_last - m)
    inv = 1.0 / (
        jnp.sum(p_main, axis=1, keepdims=True)
        + jnp.sum(p_last, axis=1, keepdims=True)
    )
    out = jnp.dot((p_main * inv).astype(out_dtype), vm,
                  preferred_element_type=f32)
    return out + (p_last * inv) * vl.astype(f32)


def _store_octic(out, h, outs, oe0, oe1, dtype):
    for g in range(4):
        outs[g][0, :, h * D1:(h + 1) * D1] = (
            out[:, g * D1:(g + 1) * D1].astype(dtype)
        )
    for r, oref in ((0, oe0), (1, oe1)):
        off = 4 * D1 + r * DE
        oref[0, :, h * DE:(h + 1) * DE] = out[:, off:off + DE].astype(dtype)


def _octic_hoist_kernel(a1, a2, b1, b2, e0, e1,
                        o1, o2, o3, o4, oe0, oe1, sq, sk, sv,
                        *, split):
    dtype = a1.dtype
    refs = (a1, a2, b1, b2, e0, e1)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        sq[...] = jnp.zeros_like(sq)
        sk[...] = jnp.zeros_like(sk)
        sv[...] = jnp.zeros_like(sv)

    # phase 1: all assembly (VPU shuffles), no matmul dependencies
    for h in range(H):
        for s_idx, s in ((0, sq), (1, sk), (2, sv)):
            s[:, h * DHP:h * DHP + DH] = jnp.concatenate(
                _octic_slices(refs, h, H, D1, DE, s_idx), axis=1
            )
    # phase 2: per-head attention on aligned scratch slices
    head = _attn_head_split if split else _attn_head
    for h in range(H):
        q = sq[:, h * DHP:h * DHP + DH]
        k = sk[:, h * DHP:h * DHP + DH]
        v = sv[:, h * DHP:h * DHP + DH]
        out = head(q, k, v, SCALE, dtype)
        _store_octic(out, h, (o1, o2, o3, o4), oe0, oe1, dtype)


def _octic_split_kernel(a1, a2, b1, b2, e0, e1, o1, o2, o3, o4, oe0, oe1):
    """Current assembly pattern + cls-split heads (no scratch)."""
    dtype = a1.dtype
    refs = (a1, a2, b1, b2, e0, e1)
    for h in range(H):
        q = jnp.concatenate(_octic_slices(refs, h, H, D1, DE, 0), axis=1)
        k = jnp.concatenate(_octic_slices(refs, h, H, D1, DE, 1), axis=1)
        v = jnp.concatenate(_octic_slices(refs, h, H, D1, DE, 2), axis=1)
        out = _attn_head_split(q, k, v, SCALE, dtype)
        _store_octic(out, h, (o1, o2, o3, o4), oe0, oe1, dtype)


def _std_split_kernel(qkv, o):
    dtype = qkv.dtype
    for h in range(H):
        q = qkv[0][:, (0 * H + h) * DH:(0 * H + h + 1) * DH]
        k = qkv[0][:, (1 * H + h) * DH:(1 * H + h + 1) * DH]
        v = qkv[0][:, (2 * H + h) * DH:(2 * H + h + 1) * DH]
        out = _attn_head_split(q, k, v, SCALE, dtype)
        o[0, :, h * DH:(h + 1) * DH] = out.astype(dtype)


def _std_multib_kernel(qkv, o, *, nb):
    """`nb` images per grid step: more independent matmuls per scheduling
    window (amortizes grid-step overhead and MXU pipeline fill)."""
    dtype = qkv.dtype
    for b in range(nb):
        for h in range(H):
            q = qkv[b][:, (0 * H + h) * DH:(0 * H + h + 1) * DH]
            k = qkv[b][:, (1 * H + h) * DH:(1 * H + h + 1) * DH]
            v = qkv[b][:, (2 * H + h) * DH:(2 * H + h + 1) * DH]
            out = _attn_head(q, k, v, SCALE, dtype)
            o[b, :, h * DH:(h + 1) * DH] = out.astype(dtype)


def _octic_multib_kernel(a1, a2, b1, b2, e0, e1, o1, o2, o3, o4, oe0, oe1,
                         *, nb):
    dtype = a1.dtype
    for b in range(nb):
        refs = tuple((x[b],) for x in (a1, a2, b1, b2, e0, e1))
        # _octic_slices indexes arr[0]; shim with per-b views
        for h in range(H):
            q = jnp.concatenate(_octic_slices(refs, h, H, D1, DE, 0), axis=1)
            k = jnp.concatenate(_octic_slices(refs, h, H, D1, DE, 1), axis=1)
            v = jnp.concatenate(_octic_slices(refs, h, H, D1, DE, 2), axis=1)
            out = _attn_head(q, k, v, SCALE, dtype)
            outs = (o1, o2, o3, o4)
            for g in range(4):
                outs[g][b, :, h * D1:(h + 1) * D1] = (
                    out[:, g * D1:(g + 1) * D1].astype(dtype)
                )
            for r, oref in ((0, oe0), (1, oe1)):
                off = 4 * D1 + r * DE
                oref[b, :, h * DE:(h + 1) * DE] = (
                    out[:, off:off + DE].astype(dtype)
                )


def _call_octic_multib(kernel, args, nb):
    in_specs = [
        pl.BlockSpec((nb,) + a.shape[1:], lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)
        for a in args
    ]
    shapes = (
        *(jax.ShapeDtypeStruct((B, N, C8), DT) for _ in range(4)),
        jax.ShapeDtypeStruct((B, N, 2 * C8), DT),
        jax.ShapeDtypeStruct((B, N, 2 * C8), DT),
    )
    out_specs = tuple(
        pl.BlockSpec((nb,) + s.shape[1:], lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)
        for s in shapes
    )
    return pl.pallas_call(
        functools.partial(kernel, nb=nb),
        grid=(B // nb,), in_specs=in_specs, out_specs=out_specs,
        out_shape=shapes, interpret=jax.default_backend() == "cpu",
    )(*args)


def _call_octic(kernel, args, scratch=False):
    in_specs = [
        pl.BlockSpec((1,) + a.shape[1:], lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)
        for a in args
    ]
    shapes = (
        *(jax.ShapeDtypeStruct((B, N, C8), DT) for _ in range(4)),
        jax.ShapeDtypeStruct((B, N, 2 * C8), DT),
        jax.ShapeDtypeStruct((B, N, 2 * C8), DT),
    )
    out_specs = tuple(
        pl.BlockSpec((1,) + s.shape[1:], lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)
        for s in shapes
    )
    kw = {}
    if scratch:
        kw["scratch_shapes"] = [pltpu.VMEM((N, H * DHP), DT) for _ in range(3)]
    return pl.pallas_call(
        kernel, grid=(B,), in_specs=in_specs, out_specs=out_specs,
        out_shape=shapes, interpret=jax.default_backend() == "cpu", **kw,
    )(*args)


def _perturbed(params, x):
    return tuple(p + x for p in params)


def bench(name, fn, params):
    x = jnp.zeros((1,), DT)
    step = measure_steps(fn, params, x, k1=2, k2=22)
    print(f"{name:34s} {step*1e6:9.1f} us", flush=True)
    return step


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

    def run_current(params, x):
        outs = octic_attention(*_perturbed(params, x), H, False)
        return jnp.stack([jnp.max(o) for o in outs])

    def run_variant(kernel, scratch):
        def run(params, x):
            outs = _call_octic(kernel, _perturbed(params, x), scratch)
            return jnp.stack([jnp.max(o) for o in outs])
        return run

    def run_std(params, x):
        (q,) = _perturbed(params, x)
        return jnp.max(standard_attention(q, H, False))

    def run_std_split(params, x):
        (q,) = _perturbed(params, x)
        out = pl.pallas_call(
            _std_split_kernel, grid=(B,),
            in_specs=[pl.BlockSpec((1, N, 3 * C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, C), DT),
            interpret=jax.default_backend() == "cpu",
        )(q)
        return jnp.max(out)

    params6 = ones + es

    # numerics check: split vs current on one batch
    ref = octic_attention(*params6, H, False)
    got = _call_octic(_octic_split_kernel, params6, False)
    for r, g in zip(ref, got):
        err = float(jnp.max(jnp.abs(r.astype(jnp.float32) - g.astype(jnp.float32))))
        assert err < 2e-2, err
    print("numerics: split matches current (bf16 tol)", flush=True)

    def run_std_multib(nb):
        def run(params, x):
            (q,) = _perturbed(params, x)
            out = pl.pallas_call(
                functools.partial(_std_multib_kernel, nb=nb),
                grid=(B // nb,),
                in_specs=[pl.BlockSpec((nb, N, 3 * C), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((nb, N, C), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, N, C), DT),
                interpret=jax.default_backend() == "cpu",
            )(q)
            return jnp.max(out)
        return run

    def run_octic_multib(nb):
        def run(params, x):
            outs = _call_octic_multib(
                _octic_multib_kernel, _perturbed(params, x), nb)
            return jnp.stack([jnp.max(o) for o in outs])
        return run

    bench("std current", run_std, (qkv,))
    bench("std nb=2", run_std_multib(2), (qkv,))
    bench("octic nb=2", run_octic_multib(2), params6)
    bench("std cls-split", run_std_split, (qkv,))
    bench("octic current", run_current, params6)
    bench("octic cls-split", run_variant(_octic_split_kernel, False), params6)
    bench("octic hoist", run_variant(
        functools.partial(_octic_hoist_kernel, split=False), True), params6)
    bench("octic hoist+split", run_variant(
        functools.partial(_octic_hoist_kernel, split=True), True), params6)


if __name__ == "__main__":
    main()
