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
* `octic_attention(a1..b2, ef)`: the five LinearD8 qkv outputs — four
  [B, N, 3C/8] with order (3, H, d1) and E-flat [B, N, 2 * 3C/4] with order
  (row, 3, H, de). Head channel assignment identical to the reference
  interleave (reference: octic_vits/d8_layers.py:623-656).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _softmax_last(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _attn_heads_batched(q, k, v, scale, out_dtype):
    """q,k,v [Hc, N, dh] -> out [Hc, N, dh]; scores stay in VMEM (fp32)."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    p = _softmax_last(s).astype(out_dtype)
    return jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def _attn_heads_batched_bwd(q, k, v, g, scale, dtype):
    """Batched-head backward; recomputes probs. All [Hc, N, dh]."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    p = _softmax_last(s)
    pc = p.astype(dtype)
    gc = g.astype(dtype)
    dv = jax.lax.dot_general(
        pc, gc, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        gc, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - row) * scale).astype(dtype)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    return dq, dk, dv


# ---------------------------------------------------------------------------
# octic variant
# ---------------------------------------------------------------------------


def _head_chunk(num_heads: int) -> int:
    # keep the fp32 score tensor [Hc, N, N] well inside VMEM
    return min(num_heads, 8)


def _octic_gather(refs, num_heads, d1, de, s_idx, h0, hc):
    """Build q|k|v [hc, N, dh] for heads h0..h0+hc from natural layouts."""
    a1, a2, b1, b2, ef = refs
    n = a1.shape[1]
    c8 = num_heads * d1
    pieces = []
    for arr in (a1, a2, b1, b2):
        x = arr[0][:, s_idx * c8 : (s_idx + 1) * c8]       # [N, C/8]
        x = x.reshape(n, num_heads, d1)[:, h0 : h0 + hc]    # [N, hc, d1]
        pieces.append(x)
    c34 = ef.shape[-1] // 2
    c4 = num_heads * de
    for r in range(2):
        x = ef[0][:, r * c34 + s_idx * c4 : r * c34 + (s_idx + 1) * c4]
        pieces.append(x.reshape(n, num_heads, de)[:, h0 : h0 + hc])
    cat = jnp.concatenate(pieces, axis=-1)                  # [N, hc, dh]
    return cat.transpose(1, 0, 2)                           # [hc, N, dh]


def _octic_scatter(out, outs1, oe, num_heads, d1, de, h0, hc, dtype):
    """out [hc, N, dh] -> the five natural output layouts."""
    n = out.shape[1]
    o = out.transpose(1, 0, 2).astype(dtype)                # [N, hc, dh]
    for g in range(4):
        piece = o[:, :, g * d1 : (g + 1) * d1].reshape(n, hc * d1)
        outs1[g][0, :, h0 * d1 : (h0 + hc) * d1] = piece
    c14 = oe.shape[-1] // 2
    for r in range(2):
        off = 4 * d1 + r * de
        piece = o[:, :, off : off + de].reshape(n, hc * de)
        oe[0, :, r * c14 + h0 * de : r * c14 + (h0 + hc) * de] = piece


def _octic_fwd_kernel(a1, a2, b1, b2, ef, o1, o2, o3, o4, oe,
                      *, num_heads, d1, de, scale):
    dtype = a1.dtype
    refs = (a1, a2, b1, b2, ef)
    hc = _head_chunk(num_heads)
    for h0 in range(0, num_heads, hc):
        q = _octic_gather(refs, num_heads, d1, de, 0, h0, hc)
        k = _octic_gather(refs, num_heads, d1, de, 1, h0, hc)
        v = _octic_gather(refs, num_heads, d1, de, 2, h0, hc)
        out = _attn_heads_batched(q, k, v, scale, dtype)
        _octic_scatter(out, (o1, o2, o3, o4), oe, num_heads, d1, de, h0, hc, dtype)


def _octic_bwd_kernel(a1, a2, b1, b2, ef, g1, g2, g3, g4, gef,
                      da1, da2, db1, db2, def_,
                      *, num_heads, d1, de, scale):
    dtype = a1.dtype
    refs = (a1, a2, b1, b2, ef)
    c14 = gef.shape[-1] // 2
    c34 = def_.shape[-1] // 2
    n = a1.shape[1]
    hc = _head_chunk(num_heads)
    # every (s_idx, head-chunk) writes a disjoint column slice; together
    # they cover each output exactly once — no accumulation needed
    for h0 in range(0, num_heads, hc):
        q = _octic_gather(refs, num_heads, d1, de, 0, h0, hc)
        k = _octic_gather(refs, num_heads, d1, de, 1, h0, hc)
        v = _octic_gather(refs, num_heads, d1, de, 2, h0, hc)
        # incoming grad for this head chunk, [hc, N, dh] in concat order
        g_pieces = []
        for arr in (g1, g2, g3, g4):
            g_pieces.append(
                arr[0].reshape(n, num_heads, d1)[:, h0 : h0 + hc]
            )
        for r in range(2):
            x = gef[0][:, r * c14 : (r + 1) * c14]
            g_pieces.append(x.reshape(n, num_heads, de)[:, h0 : h0 + hc])
        g = jnp.concatenate(g_pieces, axis=-1).transpose(1, 0, 2)
        dq, dk, dv = _attn_heads_batched_bwd(q, k, v, g, scale, dtype)
        for s_idx, dmat in ((0, dq), (1, dk), (2, dv)):
            o = dmat.transpose(1, 0, 2).astype(dtype)  # [N, hc, dh]
            col = 0
            for arr in (da1, da2, db1, db2):
                off = s_idx * num_heads * d1 + h0 * d1
                arr[0, :, off : off + hc * d1] = (
                    o[:, :, col : col + d1].reshape(n, hc * d1)
                )
                col += d1
            for r in range(2):
                off = r * c34 + s_idx * num_heads * de + h0 * de
                def_[0, :, off : off + hc * de] = (
                    o[:, :, col : col + de].reshape(n, hc * de)
                )
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def octic_attention(a1, a2, b1, b2, ef, num_heads: int,
                    interpret: Optional[bool] = None):
    """Five qkv LinearD8 outputs -> five attention outputs (natural layouts).

    a1..b2: [B, N, 3C/8] (feature order (3, H, d1));
    ef:     [B, N, 2*(3C/4)] flat E rows (order (row, 3, H, de)).
    Returns (o1..o4 [B,N,C/8], oe_flat [B,N,2*(C/4)])."""
    return _octic_fwd(a1, a2, b1, b2, ef, num_heads, interpret)


def _octic_fwd(a1, a2, b1, b2, ef, num_heads, interpret):
    b, n, w = a1.shape
    c8 = w // 3
    c = 8 * c8
    d1 = c8 // num_heads
    de = 2 * c8 // num_heads
    scale = (c // num_heads) ** -0.5
    shapes = (
        *(jax.ShapeDtypeStruct((b, n, c8), a1.dtype) for _ in range(4)),
        jax.ShapeDtypeStruct((b, n, 2 * (2 * c8)), a1.dtype),
    )
    kwargs = dict(num_heads=num_heads, d1=d1, de=de, scale=scale)
    return _octic_call(
        _octic_fwd_kernel, 5, shapes, (a1, a2, b1, b2, ef), b,
        _auto_interpret(interpret), kwargs,
    )


def _octic_fwd_rule(a1, a2, b1, b2, ef, num_heads, interpret):
    out = _octic_fwd(a1, a2, b1, b2, ef, num_heads, interpret)
    return out, (a1, a2, b1, b2, ef)


def _octic_bwd_rule(num_heads, interpret, res, cots):
    a1, a2, b1, b2, ef = res
    g1, g2, g3, g4, gef = cots
    b, n, w = a1.shape
    c8 = w // 3
    c = 8 * c8
    d1 = c8 // num_heads
    de = 2 * c8 // num_heads
    scale = (c // num_heads) ** -0.5
    shapes = tuple(jax.ShapeDtypeStruct(x.shape, x.dtype)
                   for x in (a1, a2, b1, b2, ef))
    kwargs = dict(num_heads=num_heads, d1=d1, de=de, scale=scale)
    douts = _octic_call(
        _octic_bwd_kernel, 5, shapes,
        (a1, a2, b1, b2, ef, g1, g2, g3, g4, gef), b,
        _auto_interpret(interpret), kwargs,
    )
    return douts


octic_attention.defvjp(_octic_fwd_rule, _octic_bwd_rule)


# ---------------------------------------------------------------------------
# standard variant
# ---------------------------------------------------------------------------


def _std_gather(qkv, num_heads, dh, s_idx, h0, hc):
    n = qkv.shape[1]
    c = num_heads * dh
    x = qkv[0][:, s_idx * c : (s_idx + 1) * c]
    return x.reshape(n, num_heads, dh)[:, h0 : h0 + hc].transpose(1, 0, 2)


def _std_fwd_kernel(qkv, o, *, num_heads, dh, scale):
    dtype = qkv.dtype
    n = qkv.shape[1]
    hc = _head_chunk(num_heads)
    for h0 in range(0, num_heads, hc):
        q = _std_gather(qkv, num_heads, dh, 0, h0, hc)
        k = _std_gather(qkv, num_heads, dh, 1, h0, hc)
        v = _std_gather(qkv, num_heads, dh, 2, h0, hc)
        out = _attn_heads_batched(q, k, v, scale, dtype)
        o[0, :, h0 * dh : (h0 + hc) * dh] = (
            out.transpose(1, 0, 2).astype(dtype).reshape(n, hc * dh)
        )


def _std_bwd_kernel(qkv, g, dqkv, *, num_heads, dh, scale):
    dtype = qkv.dtype
    n = qkv.shape[1]
    hc = _head_chunk(num_heads)
    for h0 in range(0, num_heads, hc):
        q = _std_gather(qkv, num_heads, dh, 0, h0, hc)
        k = _std_gather(qkv, num_heads, dh, 1, h0, hc)
        v = _std_gather(qkv, num_heads, dh, 2, h0, hc)
        gh = (
            g[0].reshape(n, num_heads, dh)[:, h0 : h0 + hc].transpose(1, 0, 2)
        )
        dq, dk, dv = _attn_heads_batched_bwd(q, k, v, gh, scale, dtype)
        for s_idx, dmat in ((0, dq), (1, dk), (2, dv)):
            off = s_idx * num_heads * dh + h0 * dh
            dqkv[0, :, off : off + hc * dh] = (
                dmat.transpose(1, 0, 2).astype(dtype).reshape(n, hc * dh)
            )


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
