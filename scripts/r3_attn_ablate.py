"""Ablate the standard attention kernel's time: loads+scores / +softmax /
+AV / store, plus restructured variants:

- interleave2: two heads' chains manually interleaved (scheduler window)
- phased: ALL scores -> scratch, ONE batched softmax over [H*264, N],
  then all AV matmuls (amortizes VPU op overhead, exposes max ILP)

Run: python scripts/r3_attn_ablate.py
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
    _probs_unnormalized,
    standard_attention,
)
from octic_vits_tpu.utils.benchlib import measure_steps

B, H, N = 64, 16, 257
C = 1280
DH = C // H
NP = 264          # sublane-padded per-head row stride in scores scratch
SCALE = DH ** -0.5
DT = jnp.bfloat16


def _qkv_h(qkv, h):
    q = qkv[0][:, (0 * H + h) * DH:(0 * H + h + 1) * DH]
    k = qkv[0][:, (1 * H + h) * DH:(1 * H + h + 1) * DH]
    v = qkv[0][:, (2 * H + h) * DH:(2 * H + h + 1) * DH]
    return q, k, v


def _scores(q, k):
    return jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * SCALE


def k_scores_only(qkv, o):
    for h in range(H):
        q, k, v = _qkv_h(qkv, h)
        s = _scores(q, k)
        o[0, :, h * DH:(h + 1) * DH] = (
            jnp.max(s, axis=1, keepdims=True) + v
        ).astype(qkv.dtype)


def k_scores_softmax(qkv, o):
    for h in range(H):
        q, k, v = _qkv_h(qkv, h)
        p, inv = _probs_unnormalized(_scores(q, k), qkv.dtype)
        o[0, :, h * DH:(h + 1) * DH] = (
            (jnp.max(p, axis=1, keepdims=True).astype(jnp.float32) + inv) + v
        ).astype(qkv.dtype)


def k_full(qkv, o):
    for h in range(H):
        q, k, v = _qkv_h(qkv, h)
        o[0, :, h * DH:(h + 1) * DH] = _attn_head(
            q, k, v, SCALE, qkv.dtype
        ).astype(qkv.dtype)


def k_interleave2(qkv, o):
    for h in range(0, H, 2):
        q0, k0, v0 = _qkv_h(qkv, h)
        q1, k1, v1 = _qkv_h(qkv, h + 1)
        s0 = _scores(q0, k0)
        s1 = _scores(q1, k1)
        p0, i0 = _probs_unnormalized(s0, qkv.dtype)
        p1, i1 = _probs_unnormalized(s1, qkv.dtype)
        o0 = jnp.dot(p0, v0, preferred_element_type=jnp.float32) * i0
        o1 = jnp.dot(p1, v1, preferred_element_type=jnp.float32) * i1
        o[0, :, h * DH:(h + 1) * DH] = o0.astype(qkv.dtype)
        o[0, :, (h + 1) * DH:(h + 2) * DH] = o1.astype(qkv.dtype)


def k_phased(qkv, o, ps):
    """Phase 1: scores for all heads into [H*NP, 384] scratch (bf16 after
    max-subtraction). Phase 2: one wide exp + row-sum. Phase 3: AV."""
    dtype = qkv.dtype
    for h in range(H):
        q, k, _ = _qkv_h(qkv, h)
        s = _scores(q, k)
        m = jnp.max(s, axis=1, keepdims=True)
        ps[h * NP:h * NP + N, :] = (s - m).astype(dtype)
    # one batched exp over the whole scratch
    ps[...] = jnp.exp(ps[...])
    for h in range(H):
        _, _, v = _qkv_h(qkv, h)
        p = ps[h * NP:h * NP + N, :]
        inv = 1.0 / jnp.sum(
            p.astype(jnp.float32), axis=1, keepdims=True
        )
        out = jnp.dot(p, v, preferred_element_type=jnp.float32) * inv
        o[0, :, h * DH:(h + 1) * DH] = out.astype(dtype)


DHP = 128


def k_padded_full(qkvp, o):
    """qkv in 128-stride padded head layout [1, N, 3*H*128] (zeros in the
    pad lanes): every per-head operand is one full-tile slice."""
    dtype = qkvp.dtype
    for h in range(H):
        q = qkvp[0][:, (0 * H + h) * DHP:(0 * H + h + 1) * DHP]
        k = qkvp[0][:, (1 * H + h) * DHP:(1 * H + h + 1) * DHP]
        v = qkvp[0][:, (2 * H + h) * DHP:(2 * H + h + 1) * DHP]
        out = _attn_head(q, k, v, SCALE, dtype)   # [N, 128], cols 80: junk*0
        o[0, :, h * DHP:(h + 1) * DHP] = out.astype(dtype)


def k_padded_scores(qkvp, o):
    dtype = qkvp.dtype
    for h in range(H):
        q = qkvp[0][:, (0 * H + h) * DHP:(0 * H + h + 1) * DHP]
        k = qkvp[0][:, (1 * H + h) * DHP:(1 * H + h + 1) * DHP]
        v = qkvp[0][:, (2 * H + h) * DHP:(2 * H + h + 1) * DHP]
        s = _scores(q, k)
        o[0, :, h * DHP:(h + 1) * DHP] = (
            jnp.max(s, axis=1, keepdims=True) + v
        ).astype(dtype)


def k_padded_octic_store(qkvp, o1, o2, o3, o4, oe0, oe1):
    """Aligned padded loads + the octic kernel's scatter stores: estimates
    the octic kernel floor under a padded-interleaved qkv layout."""
    dtype = qkvp.dtype
    D1 = 10
    DE = 20
    for h in range(H):
        q = qkvp[0][:, (0 * H + h) * DHP:(0 * H + h + 1) * DHP]
        k = qkvp[0][:, (1 * H + h) * DHP:(1 * H + h + 1) * DHP]
        v = qkvp[0][:, (2 * H + h) * DHP:(2 * H + h + 1) * DHP]
        out = _attn_head(q, k, v, SCALE, dtype)
        outs = (o1, o2, o3, o4)
        for g in range(4):
            outs[g][0, :, h * D1:(h + 1) * D1] = (
                out[:, g * D1:(g + 1) * D1].astype(dtype)
            )
        for r, oref in ((0, oe0), (1, oe1)):
            off = 4 * D1 + r * DE
            oref[0, :, h * DE:(h + 1) * DE] = (
                out[:, off:off + DE].astype(dtype)
            )


def _call_std(kernel, qkv, scratch=False, extra_args=()):
    in_specs = [pl.BlockSpec((1, N, 3 * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for a in extra_args:
        in_specs.append(
            pl.BlockSpec((1,) + a.shape[1:], lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    kw = {}
    if scratch:
        kw["scratch_shapes"] = [pltpu.VMEM((H * NP, N), DT)]
    return pl.pallas_call(
        kernel, grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), DT),
        interpret=jax.default_backend() == "cpu", **kw,
    )(qkv, *extra_args)


def bench(name, fn, params):
    x = jnp.zeros((1,), DT)
    step = measure_steps(fn, params, x, k1=2, k2=22)
    print(f"{name:34s} {step*1e6:9.1f} us", flush=True)
    return step


def main():
    qkv = (jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C)) * 0.02
           ).astype(DT)

    def mk(kernel, scratch=False, extra=()):
        def run(params, x):
            q = jnp.maximum(params[0], x - 100.0)
            out = _call_std(kernel, q, scratch, extra)
            return jnp.max(out)
        return run

    def run_current(params, x):
        q = jnp.maximum(params[0], x - 100.0)
        return jnp.max(standard_attention(q, H, False))

    # numerics: phased matches current
    ref = standard_attention(qkv, H, False)
    got = _call_std(k_phased, qkv, True, ())
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                got.astype(jnp.float32))))
    print(f"phased max err vs current: {err:.4f}", flush=True)
    assert err < 2e-2

    bench("std current", run_current, (qkv,))
    bench("scores only", mk(k_scores_only), (qkv,))
    bench("scores+softmax", mk(k_scores_softmax), (qkv,))
    bench("full (local)", mk(k_full), (qkv,))
    bench("interleave2", mk(k_interleave2), (qkv,))
    bench("phased", mk(k_phased, True), (qkv,))

    # padded-layout probes
    qkvp = jnp.zeros((B, N, 3 * H * DHP), DT)
    idx = jnp.arange(3 * H * DHP)
    keep = (idx % DHP) < DH
    src = (idx // DHP) * DH + (idx % DHP)
    src = jnp.where(keep, src, 0)
    qkvp = jnp.where(keep[None, None, :], qkv[:, :, src], 0).astype(DT)

    def mk_pad(kernel, n_outs=1):
        if n_outs == 1:
            def run(params, x):
                q = jnp.maximum(params[0], x - 100.0)
                out = pl.pallas_call(
                    kernel, grid=(B,),
                    in_specs=[pl.BlockSpec((1, N, 3 * H * DHP),
                                           lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((1, N, H * DHP),
                                           lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((B, N, H * DHP), DT),
                    interpret=jax.default_backend() == "cpu",
                )(q)
                return jnp.max(out)
            return run

        C8 = C // 8
        shapes = (
            *(jax.ShapeDtypeStruct((B, N, C8), DT) for _ in range(4)),
            jax.ShapeDtypeStruct((B, N, 2 * C8), DT),
            jax.ShapeDtypeStruct((B, N, 2 * C8), DT),
        )

        def run(params, x):
            q = jnp.maximum(params[0], x - 100.0)
            outs = pl.pallas_call(
                kernel, grid=(B,),
                in_specs=[pl.BlockSpec((1, N, 3 * H * DHP),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=tuple(
                    pl.BlockSpec((1,) + s.shape[1:], lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
                    for s in shapes
                ),
                out_shape=shapes,
                interpret=jax.default_backend() == "cpu",
            )(q)
            return jnp.stack([jnp.max(o) for o in outs])
        return run

    bench("PADDED scores only", mk_pad(k_padded_scores), (qkvp,))
    bench("PADDED full", mk_pad(k_padded_full), (qkvp,))
    bench("PADDED + octic scatter", mk_pad(k_padded_octic_store, 6), (qkvp,))


if __name__ == "__main__":
    main()
