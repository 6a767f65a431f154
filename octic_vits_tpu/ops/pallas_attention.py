"""Fused short-sequence multi-head attention Pallas kernels (ViT shapes).

ViT sequences are tiny (N = 257 at 224^2/p14): a whole [N, N] score matrix
fits in VMEM, so flash-style online softmax is unnecessary — but XLA's
attention path materializes [B,H,N,N] through HBM AND surrounds it with
per-head interleave transposes that dominate block time (profiled ~4ms of a
~8.5ms ViT-H block). These kernels take the qkv projections in their
NATURAL [B, N, features] layouts, do the per-head channel slicing inside
VMEM, run scores+softmax+AV per (batch, head) without touching HBM, and
write outputs back in natural layout. Backward kernels recompute the probs
(flash-style) so only the qkv tensors are saved.

Two variants:
* `standard_attention(qkv)`: qkv [B, N, 3*C] with feature order (3, H, dh).
* `octic_attention(a1..b2, e0, e1)`: the LinearD8 qkv outputs — four
  [B, N, 3C/8] with order (3, H, d1) and the two packed-E rows as separate
  [B, N, 3C/4] arrays (order (3, H, de)); splitting the rows outside avoids
  a 0.67 ms/block tiled-layout relayout that flattening [B,N,2,*] costs.
  Head channel assignment identical to the reference interleave
  (reference: octic_vits/d8_layers.py:623-656).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _softmax_rows(s):
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _probs_unnormalized(s, out_dtype):
    """Unnormalized probs in out_dtype plus the f32 row normalizer.

    bf16 path: the exp runs on bf16 vregs (half the VPU passes) and the
    [N, N] divide disappears — normalization is folded into a [N, dh]
    output rescale. Per-element relative error ~2^-8 on unnormalized
    probs, which averages down ~1/sqrt(N) in the weighted mean — below
    bf16 activation rounding. f32 inputs keep the exact path (oracle /
    parity-test path), mirroring the cheap-erf convention in pallas_gelu.
    """
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp((s - m).astype(out_dtype))
    inv = 1.0 / jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
    return p, inv


def _attn_head(q, k, v, scale, out_dtype):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if out_dtype == jnp.bfloat16:
        p, inv = _probs_unnormalized(s, out_dtype)
        return jnp.dot(p, v, preferred_element_type=jnp.float32) * inv
    p = _softmax_rows(s).astype(out_dtype)
    return jnp.dot(p, v, preferred_element_type=jnp.float32)


def _attn_head_bwd(q, k, v, g, scale, dtype):
    """Returns (dq, dk, dv) for one head; recomputes probs."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if dtype == jnp.bfloat16:
        # unnormalized probs; fold the row normalizer `inv` into g (for
        # dv) and into the ds row scaling — no [N, N] divide anywhere
        ph, inv = _probs_unnormalized(s, dtype)
        ginv = (g.astype(jnp.float32) * inv).astype(dtype)
        dv = jax.lax.dot_general(
            ph, ginv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g.astype(dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p32 = ph.astype(jnp.float32) * inv
        row = jnp.sum(dp * p32, axis=1, keepdims=True)
        ds = (p32 * (dp - row) * scale).astype(dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dq, dk, dv
    p = _softmax_rows(s)
    pc = p.astype(dtype)
    g32 = g.astype(dtype)
    dv = jax.lax.dot_general(
        pc, g32, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        g32, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    row = jnp.sum(dp * p, axis=1, keepdims=True)
    ds = (p * (dp - row) * scale).astype(dtype)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dq, dk, dv


# ---------------------------------------------------------------------------
# octic variant
# ---------------------------------------------------------------------------


def _octic_slices(refs, h, num_heads, d1, de, s_idx):
    """Per-head (q|k|v chosen by s_idx) channel slices from the natural
    layouts; returns list of [N, *] pieces in reference head order."""
    a1, a2, b1, b2, e0, e1 = refs
    pieces = []
    for arr in (a1, a2, b1, b2):
        off = (s_idx * num_heads + h) * d1
        pieces.append(arr[0][:, off : off + d1])
    off = (s_idx * num_heads + h) * de
    pieces.append(e0[0][:, off : off + de])
    pieces.append(e1[0][:, off : off + de])
    return pieces


# Heads per loop iteration in the octic kernels (the masked head-GROUP
# trick): adjacent heads are contiguous in every per-irrep array, so a
# group of G heads costs the same SIX operand slices as one head at G
# times the width — 1/G the Mosaic operand-copy count, the measured
# kernel floor (BENCH.md v5e cost law). Per-head scores use a lane-masked
# K (cross-head terms die in the contraction), so outputs are bitwise
# identical to the per-head loop while masked-matmul FLOPs grow ~G/2 x
# vs pairs. 2 = pairs (measured best fwd); 4 = quads (flip after the
# r3_attn_bwd_ablate --quad-only A/B). Heads beyond the largest multiple
# of the group run per-head.
OCTIC_ATTN_GROUP = int(os.environ.get("OCTIC_ATTN_GROUP", "2"))


def _octic_group_masks(group, d1, de, dtype):
    """Lane masks selecting head h+i's channels of the GROUP column order
    a1[h..h+G) a2[..] b1[..] b2[..] e0[h..h+G) e1[..]. Built with iota
    arithmetic (constants would be captured consts)."""
    w = group * (4 * d1 + 2 * de)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    blk = jnp.where(col < 4 * group * d1, col // d1,
                    (col - 4 * group * d1) // de)
    return [(blk % group == i).astype(dtype) for i in range(group)]


def _octic_group_slices(refs, h, num_heads, d1, de, s_idx, group):
    """Channel slices for heads [h, h+group) — six slices at group x the
    per-head width."""
    a1, a2, b1, b2, e0, e1 = refs
    pieces = []
    for arr in (a1, a2, b1, b2):
        off = (s_idx * num_heads + h) * d1
        pieces.append(arr[0][:, off : off + group * d1])
    off = (s_idx * num_heads + h) * de
    pieces.append(e0[0][:, off : off + group * de])
    pieces.append(e1[0][:, off : off + group * de])
    return jnp.concatenate(pieces, axis=1)


def _group_attn_fwd(qp, kp, vp, masks, scale, dtype):
    """len(masks) heads' attention from group-wide operands: per-head
    scores use a lane-masked K (cross-head terms die under the mask), AV
    runs group-wide and the results merge with full-width selects."""
    acc = None
    for m in masks:
        s = jax.lax.dot_general(
            qp, kp * m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        ph, inv = _probs_unnormalized(s, dtype)
        o = jnp.dot(ph, vp, preferred_element_type=jnp.float32) * inv
        part = o * m.astype(jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _group_attn_bwd(qp, kp, vp, gp, masks, scale, dtype):
    """Group-wide bwd: recomputes each head's probs from the masked K; the
    off-head columns of dq/dk/dv are garbage and die in the mask merge."""
    dq = dk = dv = None
    for m in masks:
        km = kp * m
        s = jax.lax.dot_general(
            qp, km, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        ph, inv = _probs_unnormalized(s, dtype)
        ginv = (gp.astype(jnp.float32) * inv).astype(dtype)
        dv_m = jax.lax.dot_general(
            ph, ginv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            (gp * m).astype(dtype), vp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p32 = ph.astype(jnp.float32) * inv
        row = jnp.sum(dp * p32, axis=1, keepdims=True)
        ds = (p32 * (dp - row) * scale).astype(dtype)
        dq_m = jnp.dot(ds, km, preferred_element_type=jnp.float32)
        dk_m = jax.lax.dot_general(
            ds, qp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mf = m.astype(jnp.float32)
        dq = dq_m * mf if dq is None else dq + dq_m * mf
        dk = dk_m * mf if dk is None else dk + dk_m * mf
        dv = dv_m * mf if dv is None else dv + dv_m * mf
    return dq, dk, dv


def _octic_fwd_kernel(a1, a2, b1, b2, e0, e1, o1, o2, o3, o4, oe0, oe1,
                      *, num_heads, d1, de, scale, group=2):
    dtype = a1.dtype
    refs = (a1, a2, b1, b2, e0, e1)
    outs = (o1, o2, o3, o4)
    # masked head-GROUP path: 1/G the sliced-operand copies and stores;
    # math is bitwise-identical to the per-head loop (pair ablation:
    # 1234 -> 876 us at ViT-H B=64, scripts/r3_attn_bwd_ablate.py)
    g_sz = min(group, num_heads)
    main = num_heads - (num_heads % g_sz)
    if g_sz > 1:
        masks = _octic_group_masks(g_sz, d1, de, dtype)
        for h in range(0, main, g_sz):
            qp = _octic_group_slices(refs, h, num_heads, d1, de, 0, g_sz)
            kp = _octic_group_slices(refs, h, num_heads, d1, de, 1, g_sz)
            vp = _octic_group_slices(refs, h, num_heads, d1, de, 2, g_sz)
            out = _group_attn_fwd(qp, kp, vp, masks, scale, dtype)
            for g in range(4):
                outs[g][0, :, h * d1 : (h + g_sz) * d1] = (
                    out[:, g_sz * g * d1 : g_sz * (g + 1) * d1].astype(dtype)
                )
            base = 4 * g_sz * d1
            for r, oref in ((0, oe0), (1, oe1)):
                off = base + r * g_sz * de
                oref[0, :, h * de : (h + g_sz) * de] = (
                    out[:, off : off + g_sz * de].astype(dtype)
                )
    else:
        main = 0
    for h in range(main, num_heads):
        q = jnp.concatenate(_octic_slices(refs, h, num_heads, d1, de, 0), axis=1)
        k = jnp.concatenate(_octic_slices(refs, h, num_heads, d1, de, 1), axis=1)
        v = jnp.concatenate(_octic_slices(refs, h, num_heads, d1, de, 2), axis=1)
        out = _attn_head(q, k, v, scale, dtype)
        for g in range(4):
            outs[g][0, :, h * d1 : (h + 1) * d1] = (
                out[:, g * d1 : (g + 1) * d1].astype(dtype)
            )
        for r, oref in ((0, oe0), (1, oe1)):
            off = 4 * d1 + r * de
            oref[0, :, h * de : (h + 1) * de] = (
                out[:, off : off + de].astype(dtype)
            )


def _octic_bwd_kernel(a1, a2, b1, b2, e0, e1, g1, g2, g3, g4, ge0, ge1,
                      da1, da2, db1, db2, de0_, de1_,
                      *, num_heads, d1, de, scale, group=2):
    dtype = a1.dtype
    refs = (a1, a2, b1, b2, e0, e1)
    # every (s_idx, head) writes a disjoint column slice; together they
    # cover each output exactly once — no accumulation needed. Masked
    # head-GROUP path: Gx-wide loads/stores at 1/G the count (pairs:
    # 1740 -> 1295 us B=32)
    g_sz = min(group, num_heads)
    main = num_heads - (num_heads % g_sz)
    if g_sz > 1:
        masks = _octic_group_masks(g_sz, d1, de, dtype)
        for h in range(0, main, g_sz):
            qp = _octic_group_slices(refs, h, num_heads, d1, de, 0, g_sz)
            kp = _octic_group_slices(refs, h, num_heads, d1, de, 1, g_sz)
            vp = _octic_group_slices(refs, h, num_heads, d1, de, 2, g_sz)
            g_pieces = []
            for arr in (g1, g2, g3, g4):
                g_pieces.append(arr[0][:, h * d1 : (h + g_sz) * d1])
            for arr in (ge0, ge1):
                g_pieces.append(arr[0][:, h * de : (h + g_sz) * de])
            gp = jnp.concatenate(g_pieces, axis=1)
            dq, dk, dv = _group_attn_bwd(qp, kp, vp, gp, masks, scale, dtype)
            for s_idx, dmat in ((0, dq), (1, dk), (2, dv)):
                for gix, arr in enumerate((da1, da2, db1, db2)):
                    off = (s_idx * num_heads + h) * d1
                    arr[0, :, off : off + g_sz * d1] = (
                        dmat[:, g_sz * gix * d1 : g_sz * (gix + 1) * d1]
                        .astype(dtype)
                    )
                base = 4 * g_sz * d1
                for r, arr in ((0, de0_), (1, de1_)):
                    off = (s_idx * num_heads + h) * de
                    arr[0, :, off : off + g_sz * de] = (
                        dmat[:, base + r * g_sz * de : base + (r + 1) * g_sz * de]
                        .astype(dtype)
                    )
    else:
        main = 0
    for h in range(main, num_heads):
        q = jnp.concatenate(_octic_slices(refs, h, num_heads, d1, de, 0), axis=1)
        k = jnp.concatenate(_octic_slices(refs, h, num_heads, d1, de, 1), axis=1)
        v = jnp.concatenate(_octic_slices(refs, h, num_heads, d1, de, 2), axis=1)
        g_pieces = []
        for arr in (g1, g2, g3, g4):
            g_pieces.append(arr[0][:, h * d1 : (h + 1) * d1])
        for arr in (ge0, ge1):
            g_pieces.append(arr[0][:, h * de : (h + 1) * de])
        g = jnp.concatenate(g_pieces, axis=1)
        dq, dk, dv = _attn_head_bwd(q, k, v, g, scale, dtype)
        for s_idx, dmat in ((0, dq), (1, dk), (2, dv)):
            col = 0
            for arr in (da1, da2, db1, db2):
                off = (s_idx * num_heads + h) * d1
                arr[0, :, off : off + d1] = dmat[:, col : col + d1].astype(dtype)
                col += d1
            for arr in (de0_, de1_):
                off = (s_idx * num_heads + h) * de
                arr[0, :, off : off + de] = dmat[:, col : col + de].astype(dtype)
                col += de


def _octic_call(kernel, n_out, shapes, args, grid_b, interpret, kwargs):
    in_specs = [
        pl.BlockSpec((1,) + a.shape[1:], lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        for a in args
    ]
    out_specs = tuple(
        pl.BlockSpec((1,) + s.shape[1:], lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        for s in shapes
    )
    return pl.pallas_call(
        functools.partial(kernel, **kwargs),
        grid=(grid_b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(jax.ShapeDtypeStruct(s.shape, s.dtype) for s in shapes),
        interpret=interpret,
    )(*args)


def _auto_interpret(flag):
    return jax.default_backend() == "cpu" if flag is None else flag


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def octic_attention(a1, a2, b1, b2, e0, e1, num_heads: int,
                    interpret: Optional[bool] = None):
    """LinearD8 qkv outputs -> attention outputs (natural layouts).

    a1..b2: [B, N, 3C/8] (feature order (3, H, d1));
    e0, e1: [B, N, 3C/4] — the two packed-E rows (order (3, H, de)).
    Returns (o1..o4 [B,N,C/8], oe0, oe1 [B,N,C/4])."""
    return _octic_fwd(a1, a2, b1, b2, e0, e1, num_heads, interpret)


def _octic_fwd(a1, a2, b1, b2, e0, e1, num_heads, interpret):
    b, n, w = a1.shape
    c8 = w // 3
    c = 8 * c8
    d1 = c8 // num_heads
    de = 2 * c8 // num_heads
    scale = (c // num_heads) ** -0.5
    shapes = (
        *(jax.ShapeDtypeStruct((b, n, c8), a1.dtype) for _ in range(4)),
        jax.ShapeDtypeStruct((b, n, 2 * c8), a1.dtype),
        jax.ShapeDtypeStruct((b, n, 2 * c8), a1.dtype),
    )
    kwargs = dict(num_heads=num_heads, d1=d1, de=de, scale=scale,
                  group=OCTIC_ATTN_GROUP)
    return _octic_call(
        _octic_fwd_kernel, 6, shapes, (a1, a2, b1, b2, e0, e1), b,
        _auto_interpret(interpret), kwargs,
    )


def _octic_fwd_rule(a1, a2, b1, b2, e0, e1, num_heads, interpret):
    out = _octic_fwd(a1, a2, b1, b2, e0, e1, num_heads, interpret)
    return out, (a1, a2, b1, b2, e0, e1)


def _octic_bwd_rule(num_heads, interpret, res, cots):
    a1, a2, b1, b2, e0, e1 = res
    g1, g2, g3, g4, ge0, ge1 = cots
    b, n, w = a1.shape
    c8 = w // 3
    c = 8 * c8
    d1 = c8 // num_heads
    de = 2 * c8 // num_heads
    scale = (c // num_heads) ** -0.5
    shapes = tuple(jax.ShapeDtypeStruct(x.shape, x.dtype)
                   for x in (a1, a2, b1, b2, e0, e1))
    kwargs = dict(num_heads=num_heads, d1=d1, de=de, scale=scale,
                  group=OCTIC_ATTN_GROUP)
    douts = _octic_call(
        _octic_bwd_kernel, 6, shapes,
        (a1, a2, b1, b2, e0, e1, g1, g2, g3, g4, ge0, ge1), b,
        _auto_interpret(interpret), kwargs,
    )
    return douts


octic_attention.defvjp(_octic_fwd_rule, _octic_bwd_rule)


# ---------------------------------------------------------------------------
# fused qkv+attention: the block-diagonal qkv weights are tiny (~1.2 MB at
# ViT-H vs 9.8 MB for the dense standard qkv — VMEM-resident only for the
# octic half), so the qkv matmuls run INSIDE the attention kernel and the
# [B, N, 3C] qkv tensor never touches HBM (126 MB write + 126 MB read per
# block at ViT-H B=64). Measured: qkv(XLA)+attn 1390 us -> fused 1076 us
# per block (B=64); extending the fusion through the proj measured WORSE
# (1186 vs 1106 — XLA pipelines the proj with the next block), so proj
# stays in XLA. The backward recomputes qkv via the same XLA dots and
# chains the existing attention-bwd kernel with the linear transpose —
# identical cost to the unfused training path, which training keeps.
# ---------------------------------------------------------------------------


def _group_slices_vals(vals, h, num_heads, d1, de, s_idx, group):
    """Head-group channel slices of COMPUTED qkv values (arrays, not refs)."""
    qa1, qa2, qb1, qb2, r0, r1 = vals
    pieces = []
    for arr in (qa1, qa2, qb1, qb2):
        off = (s_idx * num_heads + h) * d1
        pieces.append(arr[:, off : off + group * d1])
    off = (s_idx * num_heads + h) * de
    pieces.append(r0[:, off : off + group * de])
    pieces.append(r1[:, off : off + group * de])
    return jnp.concatenate(pieces, axis=1)


def _head_slices_vals(vals, h, num_heads, d1, de, s_idx):
    qa1, qa2, qb1, qb2, r0, r1 = vals
    pieces = []
    for arr in (qa1, qa2, qb1, qb2):
        off = (s_idx * num_heads + h) * d1
        pieces.append(arr[:, off : off + d1])
    off = (s_idx * num_heads + h) * de
    pieces.append(r0[:, off : off + de])
    pieces.append(r1[:, off : off + de])
    return jnp.concatenate(pieces, axis=1)


def _octic_qkv_attn_kernel(a1, a2, b1, b2, ef, w1, we, bias,
                           o1, o2, o3, o4, oe0, oe1,
                           *, num_heads, d1, de, scale, use_bias, group=2):
    dtype = a1.dtype
    c8 = a1.shape[-1]

    def mm(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    qa1 = mm(a1[0], w1[0])
    if use_bias:
        qa1 = qa1 + bias[...].astype(dtype)
    qa2 = mm(a2[0], w1[1])
    qb1 = mm(b1[0], w1[2])
    qb2 = mm(b2[0], w1[3])
    r0 = mm(ef[0][:, : 2 * c8], we[...])
    r1 = mm(ef[0][:, 2 * c8 :], we[...])
    vals = (qa1, qa2, qb1, qb2, r0, r1)
    _qkv_attn_store(vals, (o1, o2, o3, o4), oe0, oe1,
                    num_heads, d1, de, scale, dtype, group=group)


def _qkv_attn_store(vals, outs, oe0, oe1, num_heads, d1, de, scale, dtype,
                    group=2):
    """Shared masked head-group attention loop over computed qkv values,
    storing the per-irrep outputs (used by both the tuple- and packed-input
    fused qkv+attention kernels)."""
    g_sz = min(group, num_heads)
    main = num_heads - (num_heads % g_sz)
    if g_sz > 1:
        masks = _octic_group_masks(g_sz, d1, de, dtype)
        for h in range(0, main, g_sz):
            qp = _group_slices_vals(vals, h, num_heads, d1, de, 0, g_sz)
            kp = _group_slices_vals(vals, h, num_heads, d1, de, 1, g_sz)
            vp = _group_slices_vals(vals, h, num_heads, d1, de, 2, g_sz)
            out = _group_attn_fwd(qp, kp, vp, masks, scale, dtype)
            for g in range(4):
                outs[g][0, :, h * d1 : (h + g_sz) * d1] = (
                    out[:, g_sz * g * d1 : g_sz * (g + 1) * d1].astype(dtype)
                )
            base = 4 * g_sz * d1
            for r, oref in ((0, oe0), (1, oe1)):
                off = base + r * g_sz * de
                oref[0, :, h * de : (h + g_sz) * de] = (
                    out[:, off : off + g_sz * de].astype(dtype)
                )
    else:
        main = 0
    for h in range(main, num_heads):
        q = _head_slices_vals(vals, h, num_heads, d1, de, 0)
        k = _head_slices_vals(vals, h, num_heads, d1, de, 1)
        v = _head_slices_vals(vals, h, num_heads, d1, de, 2)
        out = _attn_head(q, k, v, scale, dtype)
        for g in range(4):
            outs[g][0, :, h * d1 : (h + 1) * d1] = (
                out[:, g * d1 : (g + 1) * d1].astype(dtype)
            )
        for r, oref in ((0, oe0), (1, oe1)):
            off = 4 * d1 + r * de
            oref[0, :, h * de : (h + 1) * de] = (
                out[:, off : off + de].astype(dtype)
            )


def _fused_qkv_eager(a1, a2, b1, b2, ef, w1, we, bias):
    """The qkv linear exactly as LinearD8's XLA path (flat-E)."""
    dt = a1.dtype
    c8 = a1.shape[-1]
    ones = jnp.stack((a1, a2, b1, b2), axis=0)
    out1 = jax.lax.dot_general(
        ones, w1, (((3,), (1,)), ((0,), (0,))), preferred_element_type=dt
    )
    qa1 = out1[0]
    if bias is not None:
        qa1 = qa1 + bias.astype(dt)
    e0 = jnp.dot(ef[..., : 2 * c8], we, preferred_element_type=dt)
    e1 = jnp.dot(ef[..., 2 * c8 :], we, preferred_element_type=dt)
    return qa1, out1[1], out1[2], out1[3], e0, e1


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def octic_attention_fused_qkv(a1, a2, b1, b2, ef, w1, we, bias,
                              num_heads: int,
                              interpret: Optional[bool] = None):
    """x-tuple (flat-E) + qkv weights -> attention outputs.

    a1..b2: [B, N, C/8]; ef: [B, N, C/2] flat E [row0|row1];
    w1 [4, C/8, 3C/8], we [C/4, 3C/2], bias [3C/8] or None (A1 only).
    Returns (o1..o4 [B,N,C/8], oe0, oe1 [B,N,C/4]) — identical to
    octic_attention(LinearD8_qkv(x))."""
    return _fused_fwd(a1, a2, b1, b2, ef, w1, we, bias, num_heads, interpret)


def _fused_fwd(a1, a2, b1, b2, ef, w1, we, bias, num_heads, interpret):
    b, n, c8 = a1.shape
    c = 8 * c8
    d1 = c8 // num_heads
    de = 2 * c8 // num_heads
    scale = (c // num_heads) ** -0.5
    use_bias = bias is not None
    bias2d = (jnp.zeros((1, 3 * c8), a1.dtype) if bias is None
              else bias.reshape(1, 3 * c8))
    in_specs = [
        pl.BlockSpec((1, n, c8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(4)
    ] + [
        pl.BlockSpec((1, n, 4 * c8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, c8, 3 * c8), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * c8, 6 * c8), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * c8), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    shapes = (
        *(jax.ShapeDtypeStruct((b, n, c8), a1.dtype) for _ in range(4)),
        jax.ShapeDtypeStruct((b, n, 2 * c8), a1.dtype),
        jax.ShapeDtypeStruct((b, n, 2 * c8), a1.dtype),
    )
    out_specs = tuple(
        pl.BlockSpec((1,) + s.shape[1:], lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for s in shapes
    )
    return pl.pallas_call(
        functools.partial(
            _octic_qkv_attn_kernel, num_heads=num_heads, d1=d1, de=de,
            scale=scale, use_bias=use_bias, group=OCTIC_ATTN_GROUP,
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(shapes),
        interpret=_auto_interpret(interpret),
    )(a1, a2, b1, b2, ef, w1, we, bias2d)


def _fused_fwd_rule(a1, a2, b1, b2, ef, w1, we, bias, num_heads, interpret):
    out = _fused_fwd(a1, a2, b1, b2, ef, w1, we, bias, num_heads, interpret)
    return out, (a1, a2, b1, b2, ef, w1, we, bias)


def _octic_qkv_attn_bwd_kernel(a1, a2, b1, b2, ef, w1, we, bias,
                               g1, g2, g3, g4, ge0, ge1,
                               da1, da2, db1, db2, def_, dw1, dwe, dbias,
                               *, num_heads, d1, de, scale, use_bias):
    """Whole attention bwd in ONE kernel: recompute qkv from (x, w) on the
    MXU, pair-bwd through the attention, fold the linear transpose (dx) and
    the weight grads in — neither qkv nor dqkv ever touch HBM. Weight grads
    accumulate in f32 output refs across the sequential grid."""
    dtype = a1.dtype
    c8 = a1.shape[-1]
    f32 = jnp.float32

    def mm(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=f32
        ).astype(dtype)

    qa1 = mm(a1[0], w1[0])
    if use_bias:
        qa1 = qa1 + bias[...].astype(dtype)
    vals = (qa1, mm(a2[0], w1[1]), mm(b1[0], w1[2]), mm(b2[0], w1[3]),
            mm(ef[0][:, : 2 * c8], we[...]), mm(ef[0][:, 2 * c8 :], we[...]))

    masks2 = _octic_group_masks(2, d1, de, dtype)
    # dqkv pieces per (irrep, s) in head order; concatenated below into the
    # same s-major channel layout the weights use
    p1d = [[[] for _ in range(3)] for _ in range(4)]
    pe = [[[] for _ in range(3)] for _ in range(2)]
    for h in range(0, num_heads - 1, 2):
        qp = _group_slices_vals(vals, h, num_heads, d1, de, 0, 2)
        kp = _group_slices_vals(vals, h, num_heads, d1, de, 1, 2)
        vp = _group_slices_vals(vals, h, num_heads, d1, de, 2, 2)
        gs = [arr[0][:, h * d1 : (h + 2) * d1] for arr in (g1, g2, g3, g4)]
        gs += [arr[0][:, h * de : (h + 2) * de] for arr in (ge0, ge1)]
        gp = jnp.concatenate(gs, axis=1)
        dq, dk, dv = _group_attn_bwd(qp, kp, vp, gp, masks2, scale, dtype)
        for s_idx, dmat in enumerate((dq, dk, dv)):
            for gix in range(4):
                p1d[gix][s_idx].append(
                    dmat[:, 2 * gix * d1 : 2 * (gix + 1) * d1]
                )
            base = 8 * d1
            for r in range(2):
                pe[r][s_idx].append(
                    dmat[:, base + r * 2 * de : base + (r + 1) * 2 * de]
                )
    if num_heads % 2:
        h = num_heads - 1
        q = _head_slices_vals(vals, h, num_heads, d1, de, 0)
        k = _head_slices_vals(vals, h, num_heads, d1, de, 1)
        v = _head_slices_vals(vals, h, num_heads, d1, de, 2)
        gs = [arr[0][:, h * d1 : (h + 1) * d1] for arr in (g1, g2, g3, g4)]
        gs += [arr[0][:, h * de : (h + 1) * de] for arr in (ge0, ge1)]
        g = jnp.concatenate(gs, axis=1)
        dq, dk, dv = _attn_head_bwd(q, k, v, g, scale, dtype)
        for s_idx, dmat in enumerate((dq, dk, dv)):
            for gix in range(4):
                p1d[gix][s_idx].append(
                    dmat[:, gix * d1 : (gix + 1) * d1]
                )
            for r in range(2):
                off = 4 * d1 + r * de
                pe[r][s_idx].append(dmat[:, off : off + de])
    dq1d = [
        jnp.concatenate(
            [p for s in range(3) for p in p1d[g][s]], axis=1
        ).astype(dtype)
        for g in range(4)
    ]
    dre = [
        jnp.concatenate(
            [p for s in range(3) for p in pe[r][s]], axis=1
        ).astype(dtype)
        for r in range(2)
    ]
    # dx_g = dqkv_g @ w1[g]^T ; dE rows via we^T
    for g, dref in enumerate((da1, da2, db1, db2)):
        dref[0] = jax.lax.dot_general(
            dq1d[g], w1[g], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dtype)
    def_[0] = jnp.concatenate(
        [
            jax.lax.dot_general(
                dre[r], we[...], (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ).astype(dtype)
            for r in range(2)
        ],
        axis=1,
    )
    # weight grads: per-step [c8,3c8]/[2c8,6c8] dots, f32 accumulation
    xs = (a1, a2, b1, b2)
    dw1_step = jnp.stack(
        [
            jax.lax.dot_general(
                xs[g][0], dq1d[g], (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            for g in range(4)
        ]
    )
    dwe_step = (
        jax.lax.dot_general(
            ef[0][:, : 2 * c8], dre[0], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + jax.lax.dot_general(
            ef[0][:, 2 * c8 :], dre[1], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    )
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dw1[...] = dw1_step
        dwe[...] = dwe_step

    @pl.when(jnp.logical_not(first))
    def _():
        dw1[...] += dw1_step
        dwe[...] += dwe_step

    if use_bias:
        db_step = jnp.sum(
            dq1d[0].astype(f32), axis=0, keepdims=True
        )

        @pl.when(first)
        def _():
            dbias[...] = db_step

        @pl.when(jnp.logical_not(first))
        def _():
            dbias[...] += db_step


def _fused_bwd_kernel_call(a1, a2, b1, b2, ef, w1, we, bias, cots,
                           num_heads, interpret):
    b, n, c8 = a1.shape
    c = 8 * c8
    d1 = c8 // num_heads
    de = 2 * c8 // num_heads
    scale = (c // num_heads) ** -0.5
    use_bias = bias is not None
    bias2d = (jnp.zeros((1, 3 * c8), a1.dtype) if bias is None
              else bias.reshape(1, 3 * c8))
    f32 = jnp.float32
    in_specs = [
        pl.BlockSpec((1, n, c8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(4)
    ] + [
        pl.BlockSpec((1, n, 4 * c8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, c8, 3 * c8), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * c8, 6 * c8), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * c8), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, n, c8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(4)
    ] + [
        pl.BlockSpec((1, n, 2 * c8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(2)
    ]
    shapes = (
        *(jax.ShapeDtypeStruct((b, n, c8), a1.dtype) for _ in range(4)),
        jax.ShapeDtypeStruct((b, n, 4 * c8), a1.dtype),
        jax.ShapeDtypeStruct((4, c8, 3 * c8), f32),
        jax.ShapeDtypeStruct((2 * c8, 6 * c8), f32),
        jax.ShapeDtypeStruct((1, 3 * c8), f32),
    )
    out_specs = (
        *(pl.BlockSpec((1, n, c8), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM) for _ in range(4)),
        pl.BlockSpec((1, n, 4 * c8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, c8, 3 * c8), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * c8, 6 * c8), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * c8), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    outs = pl.pallas_call(
        functools.partial(
            _octic_qkv_attn_bwd_kernel, num_heads=num_heads, d1=d1, de=de,
            scale=scale, use_bias=use_bias,
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=shapes,
        interpret=_auto_interpret(interpret),
    )(a1, a2, b1, b2, ef, w1, we, bias2d, *cots)
    da1, da2, db1, db2, def_, dw1, dwe, dbias = outs
    dw1 = dw1.astype(w1.dtype)
    dwe = dwe.astype(we.dtype)
    db = None if bias is None else dbias.reshape(3 * c8).astype(bias.dtype)
    return (da1, da2, db1, db2, def_, dw1, dwe, db)


# Measured on v5e (B=32 train step): the all-in-one bwd kernel LOSES to the
# eager chain (339.7 vs 334.4 ms) — Mosaic serializes the recompute/transpose
# /wgrad matmuls it pulls in, while XLA pipelines them with neighbor blocks;
# the saved qkv/dqkv HBM round trips don't cover that. Kept switchable for
# future toolchains; parity-tested either way.
FUSED_BWD_KERNEL = False


def _fused_bwd_rule(num_heads, interpret, res, cots):
    if FUSED_BWD_KERNEL:
        a1, a2, b1, b2, ef, w1, we, bias = res
        return _fused_bwd_kernel_call(
            a1, a2, b1, b2, ef, w1, we, bias, cots, num_heads, interpret
        )
    return _fused_bwd_rule_eager(num_heads, interpret, res, cots)


def _fused_bwd_rule_eager(num_heads, interpret, res, cots):
    a1, a2, b1, b2, ef, w1, we, bias = res
    c8 = a1.shape[-1]
    # recompute qkv (same math as the in-kernel dots), then the existing
    # attention-bwd kernel, then the linear transpose
    qkv = _fused_qkv_eager(a1, a2, b1, b2, ef, w1, we, bias)
    dq = _octic_bwd_rule(num_heads, interpret, qkv, cots)
    dqa1, dqa2, dqb1, dqb2, dr0, dr1 = dq
    f32 = jnp.float32
    dt = a1.dtype
    dstack = jnp.stack((dqa1, dqa2, dqb1, dqb2), axis=0)  # [4,B,N,3c8]
    # dx_g = dqkv_g @ w1[g]^T  (contract the feature dim)
    dx = jax.lax.dot_general(
        dstack, w1, (((3,), (2,)), ((0,), (0,))), preferred_element_type=f32
    ).astype(dt)
    xstack = jnp.stack((a1, a2, b1, b2), axis=0)
    # dw1[g] = x_g^T dqkv_g  (contract batch and token dims)
    dw1 = jax.lax.dot_general(
        xstack, dstack, (((1, 2), (1, 2)), ((0,), (0,))),
        preferred_element_type=f32,
    ).astype(w1.dtype)
    dbias = (None if bias is None
             else jnp.sum(dqa1, axis=(0, 1), dtype=f32).astype(bias.dtype))
    # E rows share the weight
    def_ = jnp.concatenate(
        (
            jax.lax.dot_general(dr0, we, (((2,), (1,)), ((), ())),
                                preferred_element_type=f32),
            jax.lax.dot_general(dr1, we, (((2,), (1,)), ((), ())),
                                preferred_element_type=f32),
        ),
        axis=-1,
    ).astype(dt)
    e_r0 = ef[..., : 2 * c8]
    e_r1 = ef[..., 2 * c8 :]
    dwe = (
        jax.lax.dot_general(e_r0, dr0, (((0, 1), (0, 1)), ((), ())),
                            preferred_element_type=f32)
        + jax.lax.dot_general(e_r1, dr1, (((0, 1), (0, 1)), ((), ())),
                              preferred_element_type=f32)
    ).astype(we.dtype)
    return (dx[0], dx[1], dx[2], dx[3], def_, dw1, dwe, dbias)


octic_attention_fused_qkv.defvjp(_fused_fwd_rule, _fused_bwd_rule)


# ---------------------------------------------------------------------------
# packed-input fused qkv+attention: the residual stream arrives as ONE flat
# [B, N, C] array ([A1|A2|B1|B2|E row0|E row1], d8/group.py:pack_5_to_flat)
# and the per-irrep views are sliced INSIDE the kernel (VMEM operand slices,
# ~0.35 us each) instead of XLA materializing five sliced copies in HBM.
# This is the packed-trunk-carry counterpart of octic_attention_fused_qkv;
# outputs and math are identical.
# ---------------------------------------------------------------------------


def _octic_qkv_attn_kernel_packed(x, w1, we, bias,
                                  o1, o2, o3, o4, oe0, oe1,
                                  *, num_heads, d1, de, scale, use_bias,
                                  group=2):
    dtype = x.dtype
    c8 = w1.shape[1]
    xb = x[0]

    def mm(v, w):
        return jax.lax.dot_general(
            v, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    qa1 = mm(xb[:, :c8], w1[0])
    if use_bias:
        qa1 = qa1 + bias[...].astype(dtype)
    qa2 = mm(xb[:, c8 : 2 * c8], w1[1])
    qb1 = mm(xb[:, 2 * c8 : 3 * c8], w1[2])
    qb2 = mm(xb[:, 3 * c8 : 4 * c8], w1[3])
    r0 = mm(xb[:, 4 * c8 : 6 * c8], we[...])
    r1 = mm(xb[:, 6 * c8 :], we[...])
    _qkv_attn_store((qa1, qa2, qb1, qb2, r0, r1), (o1, o2, o3, o4), oe0, oe1,
                    num_heads, d1, de, scale, dtype, group=group)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def octic_attention_fused_qkv_packed(x, w1, we, bias, num_heads: int,
                                     interpret: Optional[bool] = None):
    """Flat packed [B, N, C] x + qkv weights -> attention outputs.

    Same contract as :func:`octic_attention_fused_qkv` with the five input
    arrays replaced by the packed container; returns the identical 6-tuple
    (o1..o4 [B,N,C/8], oe0, oe1 [B,N,C/4])."""
    return _fused_packed_fwd(x, w1, we, bias, num_heads, interpret)


def _fused_packed_fwd(x, w1, we, bias, num_heads, interpret):
    b, n, c = x.shape
    c8 = c // 8
    d1 = c8 // num_heads
    de = 2 * c8 // num_heads
    scale = (c // num_heads) ** -0.5
    use_bias = bias is not None
    bias2d = (jnp.zeros((1, 3 * c8), x.dtype) if bias is None
              else bias.reshape(1, 3 * c8))
    in_specs = [
        pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, c8, 3 * c8), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * c8, 6 * c8), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * c8), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    shapes = (
        *(jax.ShapeDtypeStruct((b, n, c8), x.dtype) for _ in range(4)),
        jax.ShapeDtypeStruct((b, n, 2 * c8), x.dtype),
        jax.ShapeDtypeStruct((b, n, 2 * c8), x.dtype),
    )
    out_specs = tuple(
        pl.BlockSpec((1,) + s.shape[1:], lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for s in shapes
    )
    return pl.pallas_call(
        functools.partial(
            _octic_qkv_attn_kernel_packed, num_heads=num_heads, d1=d1, de=de,
            scale=scale, use_bias=use_bias, group=OCTIC_ATTN_GROUP,
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(shapes),
        interpret=_auto_interpret(interpret),
    )(x, w1, we, bias2d)


def _fused_packed_fwd_rule(x, w1, we, bias, num_heads, interpret):
    out = _fused_packed_fwd(x, w1, we, bias, num_heads, interpret)
    return out, (x, w1, we, bias)


def _fused_packed_bwd_rule(num_heads, interpret, res, cots):
    x, w1, we, bias = res
    c8 = w1.shape[1]
    a1 = x[..., :c8]
    a2 = x[..., c8 : 2 * c8]
    b1 = x[..., 2 * c8 : 3 * c8]
    b2 = x[..., 3 * c8 : 4 * c8]
    ef = x[..., 4 * c8 :]
    da1, da2, db1, db2, def_, dw1, dwe, dbias = _fused_bwd_rule_eager(
        num_heads, interpret, (a1, a2, b1, b2, ef, w1, we, bias), cots
    )
    dx = jnp.concatenate((da1, da2, db1, db2, def_), axis=-1)
    return (dx, dw1, dwe, dbias)


octic_attention_fused_qkv_packed.defvjp(
    _fused_packed_fwd_rule, _fused_packed_bwd_rule
)


# ---------------------------------------------------------------------------
# octic wide-1d variant: the four 1-dim irreps' qkv arrive as THREE
# [B, N, 4*C/8] arrays (q1d, k1d, v1d) whose columns are (head, irrep, d1)
# interleaved — produced by a column-permuted block-diagonal qkv matmul
# (AttentionD8 wide path). Per head the 1d part of each operand is ONE
# 4*d1-wide slice instead of four d1-wide slices from four arrays (the
# measured ~0.6 ms/block assembly tax); E keeps the natural per-row layout.
# The backward stores dq/dk/dv in the same wide layout (three wide stores
# per head instead of twelve d1-wide ones).
# ---------------------------------------------------------------------------


def _w1d_operand(arr, e0, e1, h, num_heads, d1, de, s_idx):
    w1 = 4 * d1
    off = (s_idx * num_heads + h) * de
    return jnp.concatenate(
        (
            arr[0][:, h * w1:(h + 1) * w1],
            e0[0][:, off:off + de],
            e1[0][:, off:off + de],
        ),
        axis=1,
    )


def _octic_w1d_fwd_kernel(q1d, k1d, v1d, e0, e1,
                          o1, o2, o3, o4, oe0, oe1,
                          *, num_heads, d1, de, scale):
    dtype = q1d.dtype
    w1 = 4 * d1
    for h in range(num_heads):
        q = _w1d_operand(q1d, e0, e1, h, num_heads, d1, de, 0)
        k = _w1d_operand(k1d, e0, e1, h, num_heads, d1, de, 1)
        v = _w1d_operand(v1d, e0, e1, h, num_heads, d1, de, 2)
        out = _attn_head(q, k, v, scale, dtype)  # [N, 4*d1 + 2*de] fp32
        outs = (o1, o2, o3, o4)
        for g in range(4):
            outs[g][0, :, h * d1:(h + 1) * d1] = (
                out[:, g * d1:(g + 1) * d1].astype(dtype)
            )
        for r, oref in ((0, oe0), (1, oe1)):
            off = w1 + r * de
            oref[0, :, h * de:(h + 1) * de] = (
                out[:, off:off + de].astype(dtype)
            )


def _octic_w1d_bwd_kernel(q1d, k1d, v1d, e0, e1,
                          g1, g2, g3, g4, ge0, ge1,
                          dq1d, dk1d, dv1d, de0_, de1_,
                          *, num_heads, d1, de, scale):
    dtype = q1d.dtype
    w1 = 4 * d1
    for h in range(num_heads):
        q = _w1d_operand(q1d, e0, e1, h, num_heads, d1, de, 0)
        k = _w1d_operand(k1d, e0, e1, h, num_heads, d1, de, 1)
        v = _w1d_operand(v1d, e0, e1, h, num_heads, d1, de, 2)
        g_pieces = [arr[0][:, h * d1:(h + 1) * d1] for arr in (g1, g2, g3, g4)]
        g_pieces += [arr[0][:, h * de:(h + 1) * de] for arr in (ge0, ge1)]
        g = jnp.concatenate(g_pieces, axis=1)
        dq, dk, dv = _attn_head_bwd(q, k, v, g, scale, dtype)
        for s_idx, dmat, dref in ((0, dq, dq1d), (1, dk, dk1d), (2, dv, dv1d)):
            dref[0, :, h * w1:(h + 1) * w1] = dmat[:, :w1].astype(dtype)
            off = (s_idx * num_heads + h) * de
            de0_[0, :, off:off + de] = dmat[:, w1:w1 + de].astype(dtype)
            de1_[0, :, off:off + de] = dmat[:, w1 + de:].astype(dtype)


def _w1d_params(q1d, num_heads):
    b, n, w = q1d.shape         # w = 4*C/8
    c = 2 * w
    c8 = c // 8
    d1 = c8 // num_heads
    de = 2 * c8 // num_heads
    scale = (c // num_heads) ** -0.5
    return b, n, c8, d1, de, scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def octic_attention_wide1d(q1d, k1d, v1d, e0, e1, num_heads: int,
                           interpret: Optional[bool] = None):
    """Wide-1d octic attention.

    q1d/k1d/v1d: [B, N, C/2], columns (head, [a1|a2|b1|b2], d1);
    e0, e1: [B, N, 3C/4] packed-E rows, columns (3, head, de) — identical
    to `octic_attention`. Outputs in the same natural per-irrep layouts."""
    return _w1d_fwd(q1d, k1d, v1d, e0, e1, num_heads, interpret)


def _w1d_fwd(q1d, k1d, v1d, e0, e1, num_heads, interpret):
    b, n, c8, d1, de, scale = _w1d_params(q1d, num_heads)
    shapes = (
        *(jax.ShapeDtypeStruct((b, n, c8), q1d.dtype) for _ in range(4)),
        jax.ShapeDtypeStruct((b, n, 2 * c8), q1d.dtype),
        jax.ShapeDtypeStruct((b, n, 2 * c8), q1d.dtype),
    )
    kwargs = dict(num_heads=num_heads, d1=d1, de=de, scale=scale)
    return _octic_call(
        _octic_w1d_fwd_kernel, 6, shapes, (q1d, k1d, v1d, e0, e1), b,
        _auto_interpret(interpret), kwargs,
    )


def _w1d_fwd_rule(q1d, k1d, v1d, e0, e1, num_heads, interpret):
    out = _w1d_fwd(q1d, k1d, v1d, e0, e1, num_heads, interpret)
    return out, (q1d, k1d, v1d, e0, e1)


def _w1d_bwd_rule(num_heads, interpret, res, cots):
    q1d, k1d, v1d, e0, e1 = res
    g1, g2, g3, g4, ge0, ge1 = cots
    b, n, c8, d1, de, scale = _w1d_params(q1d, num_heads)
    shapes = tuple(jax.ShapeDtypeStruct(x.shape, x.dtype)
                   for x in (q1d, k1d, v1d, e0, e1))
    kwargs = dict(num_heads=num_heads, d1=d1, de=de, scale=scale)
    return _octic_call(
        _octic_w1d_bwd_kernel, 5, shapes,
        (q1d, k1d, v1d, e0, e1, g1, g2, g3, g4, ge0, ge1), b,
        _auto_interpret(interpret), kwargs,
    )


octic_attention_wide1d.defvjp(_w1d_fwd_rule, _w1d_bwd_rule)


# ---------------------------------------------------------------------------
# octic wide-qkv variant: qkv is ONE [B, N, 3C] array with per-(s, head)
# contiguous [a1|a2|b1|b2|e0|e1] columns (produced by
# pallas_linear.linear_d8_qkv_wide). Loads are the standard kernel's cheap
# aligned pattern; outputs land in the natural per-irrep layouts.
# ---------------------------------------------------------------------------


def _octic_wide_fwd_kernel(qkv, o1, o2, o3, o4, oe0, oe1,
                           *, num_heads, d1, de, scale):
    dtype = qkv.dtype
    dh = 4 * d1 + 2 * de
    for h in range(num_heads):
        q = qkv[0][:, (0 * num_heads + h) * dh : (0 * num_heads + h + 1) * dh]
        k = qkv[0][:, (1 * num_heads + h) * dh : (1 * num_heads + h + 1) * dh]
        v = qkv[0][:, (2 * num_heads + h) * dh : (2 * num_heads + h + 1) * dh]
        out = _attn_head(q, k, v, scale, dtype)
        outs = (o1, o2, o3, o4)
        for g in range(4):
            outs[g][0, :, h * d1 : (h + 1) * d1] = (
                out[:, g * d1 : (g + 1) * d1].astype(dtype)
            )
        for r, oref in ((0, oe0), (1, oe1)):
            off = 4 * d1 + r * de
            oref[0, :, h * de : (h + 1) * de] = (
                out[:, off : off + de].astype(dtype)
            )


def _octic_wide_bwd_kernel(qkv, g1, g2, g3, g4, ge0, ge1, dqkv,
                           *, num_heads, d1, de, scale):
    dtype = qkv.dtype
    dh = 4 * d1 + 2 * de
    for h in range(num_heads):
        q = qkv[0][:, (0 * num_heads + h) * dh : (0 * num_heads + h + 1) * dh]
        k = qkv[0][:, (1 * num_heads + h) * dh : (1 * num_heads + h + 1) * dh]
        v = qkv[0][:, (2 * num_heads + h) * dh : (2 * num_heads + h + 1) * dh]
        g_pieces = []
        for arr in (g1, g2, g3, g4):
            g_pieces.append(arr[0][:, h * d1 : (h + 1) * d1])
        for arr in (ge0, ge1):
            g_pieces.append(arr[0][:, h * de : (h + 1) * de])
        g = jnp.concatenate(g_pieces, axis=1)
        dq, dk, dv = _attn_head_bwd(q, k, v, g, scale, dtype)
        for s_idx, dmat in ((0, dq), (1, dk), (2, dv)):
            off = (s_idx * num_heads + h) * dh
            dqkv[0, :, off : off + dh] = dmat.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def octic_attention_wide(qkv, num_heads: int,
                         interpret: Optional[bool] = None):
    """Wide interleaved qkv [B, N, 3C] -> attention outputs in natural
    per-irrep layouts (o1..o4 [B,N,C/8], oe0, oe1 [B,N,C/4])."""
    return _octic_wide_fwd(qkv, num_heads, interpret)


def _octic_wide_params(qkv, num_heads):
    b, n, w = qkv.shape
    c = w // 3
    c8 = c // 8
    d1 = c8 // num_heads
    de = 2 * c8 // num_heads
    scale = (c // num_heads) ** -0.5
    return b, n, c8, dict(num_heads=num_heads, d1=d1, de=de, scale=scale)


def _octic_wide_fwd(qkv, num_heads, interpret):
    b, n, c8, kwargs = _octic_wide_params(qkv, num_heads)
    shapes = (
        *(jax.ShapeDtypeStruct((b, n, c8), qkv.dtype) for _ in range(4)),
        jax.ShapeDtypeStruct((b, n, 2 * c8), qkv.dtype),
        jax.ShapeDtypeStruct((b, n, 2 * c8), qkv.dtype),
    )
    return _octic_call(
        _octic_wide_fwd_kernel, 6, shapes, (qkv,), b,
        _auto_interpret(interpret), kwargs,
    )


def _octic_wide_fwd_rule(qkv, num_heads, interpret):
    return _octic_wide_fwd(qkv, num_heads, interpret), qkv


def _octic_wide_bwd_rule(num_heads, interpret, qkv, cots):
    b, n, c8, kwargs = _octic_wide_params(qkv, num_heads)
    g1, g2, g3, g4, ge0, ge1 = cots
    (dqkv,) = _octic_call(
        _octic_wide_bwd_kernel, 1,
        (jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),),
        (qkv, g1, g2, g3, g4, ge0, ge1), b,
        _auto_interpret(interpret), kwargs,
    )
    return (dqkv,)


octic_attention_wide.defvjp(_octic_wide_fwd_rule, _octic_wide_bwd_rule)


# ---------------------------------------------------------------------------
# standard variant
# ---------------------------------------------------------------------------


def _std_fwd_kernel(qkv, o, *, num_heads, dh, scale):
    dtype = qkv.dtype
    c = num_heads * dh
    for h in range(num_heads):
        q = qkv[0][:, (0 * num_heads + h) * dh : (0 * num_heads + h + 1) * dh]
        k = qkv[0][:, (1 * num_heads + h) * dh : (1 * num_heads + h + 1) * dh]
        v = qkv[0][:, (2 * num_heads + h) * dh : (2 * num_heads + h + 1) * dh]
        out = _attn_head(q, k, v, scale, dtype)
        o[0, :, h * dh : (h + 1) * dh] = out.astype(dtype)


def _std_bwd_kernel(qkv, g, dqkv, *, num_heads, dh, scale):
    dtype = qkv.dtype
    dqkv[...] = jnp.zeros_like(dqkv)
    for h in range(num_heads):
        q = qkv[0][:, (0 * num_heads + h) * dh : (0 * num_heads + h + 1) * dh]
        k = qkv[0][:, (1 * num_heads + h) * dh : (1 * num_heads + h + 1) * dh]
        v = qkv[0][:, (2 * num_heads + h) * dh : (2 * num_heads + h + 1) * dh]
        gh = g[0][:, h * dh : (h + 1) * dh]
        dq, dk, dv = _attn_head_bwd(q, k, v, gh, scale, dtype)
        for s_idx, dmat in ((0, dq), (1, dk), (2, dv)):
            off = (s_idx * num_heads + h) * dh
            dqkv[0, :, off : off + dh] = dmat.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def standard_attention(qkv, num_heads: int, interpret: Optional[bool] = None):
    """qkv [B, N, 3C] (feature order (3, H, dh)) -> out [B, N, C]."""
    return _std_fwd(qkv, num_heads, interpret)


def _std_fwd(qkv, num_heads, interpret):
    b, n, w = qkv.shape
    c = w // 3
    dh = c // num_heads
    scale = dh ** -0.5
    out_shape = jax.ShapeDtypeStruct((b, n, c), qkv.dtype)
    return pl.pallas_call(
        functools.partial(_std_fwd_kernel, num_heads=num_heads, dh=dh, scale=scale),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=_auto_interpret(interpret),
    )(qkv)


def _std_fwd_rule(qkv, num_heads, interpret):
    return _std_fwd(qkv, num_heads, interpret), qkv


def _std_bwd_rule(num_heads, interpret, qkv, g):
    b, n, w = qkv.shape
    c = w // 3
    dh = c // num_heads
    scale = dh ** -0.5
    dqkv = pl.pallas_call(
        functools.partial(_std_bwd_kernel, num_heads=num_heads, dh=dh, scale=scale),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        interpret=_auto_interpret(interpret),
    )(qkv, g)
    return (dqkv,)


standard_attention.defvjp(_std_fwd_rule, _std_bwd_rule)
