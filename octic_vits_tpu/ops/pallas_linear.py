"""Pallas TPU kernel: fused block-diagonal equivariant linear (LinearD8),
optionally fused with the octic GELU.

One kernel evaluates all five irrep blocks of an equivariant linear layer
(the reference leaves five separate cuBLAS calls, octic_vits/
d8_layers.py:104-127): per token tile it runs the four 1-dim-irrep GEMMs
[TM,c]x[c,f] and the two E-row GEMMs [TM,2c]x[2c,2f] back-to-back from VMEM,
adds the A1 bias, and (for MLP fc1) applies the fused
isotypic->regular->GELU->isotypic butterfly before the single store — the
hidden activations of the MLP never round-trip HBM in regular coordinates.

Layouts (irrep-major so tiles are well-shaped for the MXU):
  x1  [4, M, c]   stacked A1 A2 B1 B2        w1 [4, c, f]
  xef [M, 4c]     flat E rows = E11|E12|E21|E22   we [2c, 2f]
  y1  [4, M, f]   yef [M, 4f]

Backward (custom VJP) recomputes the pre-activation in XLA (flash-style
recompute: the fused-GELU path saves no hidden activations).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from octic_vits_tpu.d8.group import isotypic_to_regular, regular_to_isotypic
from octic_vits_tpu.ops.pallas_gelu import _gelu_exact, _gelu_grad

Array = jnp.ndarray


def _apply_gelu_tiles(a1, a2, b1, b2, e11, e12, e21, e22, cheap=False):
    # NOTE (measured, round 2): casting these tiles to bf16 before the
    # butterfly+gelu made fc1 SLOWER (0.92 -> 1.39 ms/blk traced) — generic
    # bf16 VPU arithmetic is emulated with converts; only exp benefits
    # (the attention fast-softmax). Keep the pipeline in f32.
    reg = isotypic_to_regular((a1, a2, b1, b2, e11, e21, e12, e22))
    act = tuple(_gelu_exact(u, cheap) for u in reg)
    iso = regular_to_isotypic(act)
    # back to (a1,a2,b1,b2,e11,e12,e21,e22) ordering
    return iso[0], iso[1], iso[2], iso[3], iso[4], iso[6], iso[5], iso[7]


def _kernel(x1, xef, w1, we, bias, *rest, fuse_gelu: bool, use_bias: bool,
            use_epilogue: bool):
    if use_epilogue:
        ls1, lse, r1, ref_, y1, yef = rest
    else:
        y1, yef = rest
    dtype = y1.dtype
    f = w1.shape[-1]
    c = w1.shape[-2]
    outs1 = []
    for g in range(4):
        acc = jax.lax.dot_general(
            x1[g], w1[g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs1.append(acc)
    if use_bias:
        outs1[0] = outs1[0] + bias[0].astype(jnp.float32)

    row0 = jax.lax.dot_general(
        xef[:, : 2 * c], we[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    row1 = jax.lax.dot_general(
        xef[:, 2 * c :], we[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if fuse_gelu:
        e11, e12 = row0[:, :f], row0[:, f:]
        e21, e22 = row1[:, :f], row1[:, f:]
        a1, a2, b1, b2 = outs1
        a1, a2, b1, b2, e11, e12, e21, e22 = _apply_gelu_tiles(
            a1, a2, b1, b2, e11, e12, e21, e22, cheap=dtype == jnp.bfloat16
        )
        outs1 = [a1, a2, b1, b2]
        cat_e = jnp.concatenate((e11, e12, e21, e22), axis=-1)
    else:
        # flat-E layout [e11|e12|e21|e22] IS [row0|row1]: concatenate the
        # row results directly (2f boundary, lane-aligned) instead of
        # slicing them into four f-wide pieces and re-concatenating
        # (f=480 at ViT-H: two misaligned vreg-shuffle boundaries)
        cat_e = jnp.concatenate((row0, row1), axis=-1)
    if use_epilogue:
        # y = residual + layerscale * linear_out, fused before the store
        for g in range(4):
            y1[g] = (
                r1[g].astype(jnp.float32)
                + ls1[g : g + 1, :].astype(jnp.float32) * outs1[g]
            ).astype(dtype)
        yef[...] = (
            ref_[...].astype(jnp.float32)
            + lse[...].astype(jnp.float32) * cat_e
        ).astype(dtype)
    else:
        for g in range(4):
            y1[g] = outs1[g].astype(dtype)
        yef[...] = cat_e.astype(dtype)


def _row_tile(m: int, c: int, f: int, itemsize: int) -> int:
    # Pallas double-buffers activation blocks; weights (4cf + 4cf values)
    # are resident. Stay well under the ~16MB VMEM scoped limit.
    budget = 2 * 1024 * 1024
    per_row = (8 * c + 8 * f) * itemsize  # in + out streams per token row
    tm = max(8, budget // max(per_row, 1))
    return max(8, min((tm // 8) * 8, m, 1024))


def _fwd_pallas(x1, xef, w1, we, bias, ls1, lse, r1, ref_, fuse_gelu, interpret):
    m = x1.shape[1]
    c = w1.shape[1]
    f = w1.shape[2]
    use_bias = bias is not None
    use_epilogue = ls1 is not None
    assert not (use_epilogue and fuse_gelu), "epilogue and gelu are exclusive"
    if bias is None:
        bias = jnp.zeros((1, f), x1.dtype)
    else:
        bias = bias.reshape(1, f)
    tm = _row_tile(m, c, f, x1.dtype.itemsize)
    grid = (pl.cdiv(m, tm),)
    kern = functools.partial(
        _kernel, fuse_gelu=fuse_gelu, use_bias=use_bias, use_epilogue=use_epilogue
    )
    in_specs = [
        pl.BlockSpec((4, tm, c), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, 4 * c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, c, f), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * c, 2 * f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x1, xef, w1, we, bias]
    if use_epilogue:
        lse_full = jnp.concatenate((lse, lse)).reshape(1, 4 * f)
        in_specs += [
            pl.BlockSpec((4, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tm, f), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        args += [ls1, lse_full, r1, ref_]
    y1, yef = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((4, tm, f), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, m, f), x1.dtype),
            jax.ShapeDtypeStruct((m, 4 * f), x1.dtype),
        ),
        interpret=interpret,
    )(*args)
    return y1, yef


def _eager_linear(x1, xef, w1, we, bias):
    c = w1.shape[1]
    y1 = jnp.einsum("gmc,gcf->gmf", x1.astype(jnp.float32), w1.astype(jnp.float32))
    if bias is not None:
        y1 = y1.at[0].add(bias.astype(jnp.float32))
    row0 = xef[:, : 2 * c].astype(jnp.float32) @ we.astype(jnp.float32)
    row1 = xef[:, 2 * c :].astype(jnp.float32) @ we.astype(jnp.float32)
    return y1, row0, row1


def _eager_ref(x1, xef, w1, we, bias, fuse_gelu):
    """Eager oracle with identical semantics (used for tests + backward)."""
    f = w1.shape[2]
    y1, row0, row1 = _eager_linear(x1, xef, w1, we, bias)
    e11, e12, e21, e22 = row0[:, :f], row0[:, f:], row1[:, :f], row1[:, f:]
    if fuse_gelu:
        a1, a2, b1, b2, e11, e12, e21, e22 = _apply_gelu_tiles(
            y1[0], y1[1], y1[2], y1[3], e11, e12, e21, e22
        )
        y1 = jnp.stack((a1, a2, b1, b2))
    yef = jnp.concatenate((e11, e12, e21, e22), axis=-1)
    return y1.astype(x1.dtype), yef.astype(x1.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def linear_d8_fused(
    x1: Array, xef: Array, w1: Array, we: Array, bias: Optional[Array],
    ls1: Optional[Array] = None, lse: Optional[Array] = None,
    r1: Optional[Array] = None, ref_: Optional[Array] = None,
    fuse_gelu: bool = False, interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Fused equivariant linear. Optional epilogue
    y = residual + layerscale * linear(x) (for proj / fc2 + the block
    residual): ls1 [4, f] per-irrep scales, lse [2f] E scales, r1/ref_ the
    residual in kernel layouts."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fwd_pallas(x1, xef, w1, we, bias, ls1, lse, r1, ref_,
                       fuse_gelu, interpret)


def _fwd_rule(x1, xef, w1, we, bias, ls1, lse, r1, ref_, fuse_gelu, interpret):
    out = linear_d8_fused(x1, xef, w1, we, bias, ls1, lse, r1, ref_,
                          fuse_gelu, interpret)
    return out, (x1, xef, w1, we, bias, ls1, lse)


def _bwd_rule(fuse_gelu, interpret, res, cot):
    x1, xef, w1, we, bias, ls1, lse = res
    g1, gef = cot
    c = w1.shape[1]
    f = w1.shape[2]
    g1 = g1.astype(jnp.float32)
    gef = gef.astype(jnp.float32)

    dls1 = dlse = dr1 = dref = None
    if ls1 is not None:
        # y = r + ls * z  with z = linear(x):
        # dr = g; dls = sum_m g*z; dz = g*ls
        z1, zrow0, zrow1 = _eager_linear(x1, xef, w1, we, bias)
        zef = jnp.concatenate(
            (zrow0[:, :f], zrow0[:, f:], zrow1[:, :f], zrow1[:, f:]), axis=-1
        )
        dr1 = g1.astype(x1.dtype)
        dref = gef.astype(xef.dtype)
        dls1 = jnp.sum(g1 * z1, axis=1).astype(ls1.dtype)
        dlse_full = jnp.sum(gef * zef, axis=0)
        dlse = (dlse_full[: 2 * f] + dlse_full[2 * f :]).astype(lse.dtype)
        lse_full = jnp.concatenate((lse, lse)).astype(jnp.float32)
        g1 = g1 * ls1.astype(jnp.float32)[:, None, :]
        gef = gef * lse_full[None, :]

    if fuse_gelu:
        # recompute pre-activation z, push cotangent through the octic GELU:
        # dz = R(gelu'(S z) * (S g))
        z1, row0, row1 = _eager_linear(x1, xef, w1, we, bias)
        z = (z1[0], z1[1], z1[2], z1[3],
             row0[:, :f], row1[:, :f], row0[:, f:], row1[:, f:])  # isotypic order
        g = (g1[0], g1[1], g1[2], g1[3],
             gef[:, :f], gef[:, 2 * f : 3 * f], gef[:, f : 2 * f], gef[:, 3 * f :])
        u = isotypic_to_regular(z)
        v = isotypic_to_regular(g)
        d = regular_to_isotypic(tuple(_gelu_grad(ui) * vi for ui, vi in zip(u, v)))
        g1 = jnp.stack(d[:4])
        # back to flat-E layout E11|E12|E21|E22
        gef = jnp.concatenate((d[4], d[6], d[5], d[7]), axis=-1)

    x1f = x1.astype(jnp.float32)
    dx1 = jnp.einsum("gmf,gcf->gmc", g1, w1.astype(jnp.float32))
    dw1 = jnp.einsum("gmc,gmf->gcf", x1f, g1)
    grow0, grow1 = gef[:, : 2 * f], gef[:, 2 * f :]
    wef = we.astype(jnp.float32)
    dxef = jnp.concatenate((grow0 @ wef.T, grow1 @ wef.T), axis=-1)
    xef_f = xef.astype(jnp.float32)
    dwe = xef_f[:, : 2 * c].T @ grow0 + xef_f[:, 2 * c :].T @ grow1
    dbias = None if bias is None else jnp.sum(g1[0], axis=0).astype(bias.dtype)
    return (
        dx1.astype(x1.dtype),
        dxef.astype(xef.dtype),
        dw1.astype(w1.dtype),
        dwe.astype(we.dtype),
        dbias,
        dls1,
        dlse,
        dr1,
        dref,
    )


linear_d8_fused.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# wide-qkv mode: store ONE [M, 3C] output with (s, head, [a1|a2|b1|b2|e0|e1])
# column order. The per-head interleave tax rides the linear's existing
# stores, so the attention kernel degenerates to the standard kernel's
# aligned load pattern (one dh-wide slice per q/k/v per head) — see
# BENCH.md "why the ratio is 1.16" item 1.
# ---------------------------------------------------------------------------


def _wide_kernel(x1, xef, w1, we, bias, y, *, num_heads, use_bias):
    dtype = y.dtype
    f = w1.shape[-1]          # 3C/8
    c = w1.shape[-2]
    d1 = f // (3 * num_heads)
    de = 2 * d1
    outs1 = []
    for g in range(4):
        acc = jax.lax.dot_general(
            x1[g], w1[g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs1.append(acc)
    if use_bias:
        outs1[0] = outs1[0] + bias[0].astype(jnp.float32)
    row0 = jax.lax.dot_general(
        xef[:, : 2 * c], we[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    row1 = jax.lax.dot_general(
        xef[:, 2 * c :], we[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # cast BEFORE the interleave: half the vregs to shuffle in bf16
    outs1 = [o.astype(dtype) for o in outs1]
    row0 = row0.astype(dtype)   # [TM, 2f]: the e0 array, (s, h, de) order
    row1 = row1.astype(dtype)
    pieces = []
    for sh in range(3 * num_heads):
        for o in outs1:
            pieces.append(o[:, sh * d1 : (sh + 1) * d1])
        pieces.append(row0[:, sh * de : (sh + 1) * de])
        pieces.append(row1[:, sh * de : (sh + 1) * de])
    y[...] = jnp.concatenate(pieces, axis=1)


def _qkv_wide_fwd(x1, xef, w1, we, bias, num_heads, interpret):
    m = x1.shape[1]
    c = w1.shape[1]
    f = w1.shape[2]
    assert f % (3 * num_heads) == 0, (f, num_heads)
    use_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((1, f), x1.dtype)
    else:
        bias = bias.reshape(1, f)
    tm = _row_tile(m, c, f, x1.dtype.itemsize)
    grid = (pl.cdiv(m, tm),)
    return pl.pallas_call(
        functools.partial(_wide_kernel, num_heads=num_heads, use_bias=use_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, tm, c), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c, f), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * c, 2 * f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 8 * f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 8 * f), x1.dtype),
        interpret=interpret,
    )(x1, xef, w1, we, bias)


def uninterleave_wide(y, num_heads):
    """XLA-side inverse of the wide store: [.., M, 3C] ->
    (y1 [4, M, 3C/8], yef [M, 4*(3C/8)] = e11|e12|e21|e22)."""
    lead = y.shape[:-1]
    w = y.shape[-1]
    f = w // 8
    d1 = f // (3 * num_heads)
    blocks = y.reshape(*lead, 3 * num_heads, 8 * d1)
    ones = [
        blocks[..., :, g * d1 : (g + 1) * d1].reshape(*lead, f)
        for g in range(4)
    ]
    e0 = blocks[..., :, 4 * d1 : 6 * d1].reshape(*lead, 2 * f)
    e1 = blocks[..., :, 6 * d1 : 8 * d1].reshape(*lead, 2 * f)
    y1 = jnp.stack(ones)
    yef = jnp.concatenate((e0, e1), axis=-1)
    return y1, yef


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def linear_d8_qkv_wide(x1, xef, w1, we, bias, num_heads: int,
                       interpret: Optional[bool] = None):
    """Fused equivariant qkv linear with ONE wide interleaved output.

    Inputs as `linear_d8_fused`; returns y [M, 3C] where the dh=C/H columns
    of each (s in q|k|v, head) group are [a1|a2|b1|b2|e_row0|e_row1] — the
    reference head-channel assignment (octic_vits/d8_layers.py:623-656)
    stored contiguously."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _qkv_wide_fwd(x1, xef, w1, we, bias, num_heads, interpret)


def _qkv_wide_fwd_rule(x1, xef, w1, we, bias, num_heads, interpret):
    y = linear_d8_qkv_wide(x1, xef, w1, we, bias, num_heads, interpret)
    return y, (x1, xef, w1, we, bias)


def _qkv_wide_bwd_rule(num_heads, interpret, res, g):
    x1, xef, w1, we, bias = res
    c = w1.shape[1]
    g1, gef = uninterleave_wide(g, num_heads)
    g1 = g1.astype(jnp.float32)
    gef = gef.astype(jnp.float32)
    f = w1.shape[2]
    x1f = x1.astype(jnp.float32)
    dx1 = jnp.einsum("gmf,gcf->gmc", g1, w1.astype(jnp.float32))
    dw1 = jnp.einsum("gmc,gmf->gcf", x1f, g1)
    grow0, grow1 = gef[:, : 2 * f], gef[:, 2 * f :]
    wef = we.astype(jnp.float32)
    dxef = jnp.concatenate((grow0 @ wef.T, grow1 @ wef.T), axis=-1)
    xef_f = xef.astype(jnp.float32)
    dwe = xef_f[:, : 2 * c].T @ grow0 + xef_f[:, 2 * c :].T @ grow1
    dbias = None if bias is None else jnp.sum(g1[0], axis=0).astype(bias.dtype)
    return (
        dx1.astype(x1.dtype),
        dxef.astype(xef.dtype),
        dw1.astype(w1.dtype),
        dwe.astype(we.dtype),
        dbias,
    )


linear_d8_qkv_wide.defvjp(_qkv_wide_fwd_rule, _qkv_wide_bwd_rule)


# ---------------------------------------------------------------------------
# fused octic MLP: fc1 -> octic GELU -> fc2 in ONE kernel. The separate-
# kernel path stores the 4x-wide hidden to HBM between fc1 and fc2
# (~336 MB/block round trip at ViT-H B=64 ~ 0.4 ms); here the hidden lives
# only in VMEM, exactly like the standard model's dense_gelu MLP kernel.
# Unlike the retired mlp_branch kernel (BENCH.md round-3 dead end 7) this
# fuses ONLY the two matmuls + GELU — norm/LayerScale/residual glue stays
# in XLA where its VPU time pipelines with neighboring ops.
# Numerics are identical to the two-kernel composition: f32 accumulators,
# f32 GELU pipeline (cheap erf on the bf16 path), hidden rounded to the
# compute dtype between GELU and fc2 (the rounding the HBM store applied).
# Reference: octic_vits/d8_layers.py:215-247 (MlpD8).
# ---------------------------------------------------------------------------


def _mlp_kernel(x1, xef, w1a, wea, b1, w1b, web, b2, y1, yef,
                *, use_bias: bool):
    dtype = y1.dtype
    c = w1a.shape[-2]
    h = w1a.shape[-1]
    hid1 = []
    for g in range(4):
        acc = jax.lax.dot_general(
            x1[g], w1a[g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hid1.append(acc)
    if use_bias:
        hid1[0] = hid1[0] + b1[0].astype(jnp.float32)
    hrow0 = jax.lax.dot_general(
        xef[:, : 2 * c], wea[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    hrow1 = jax.lax.dot_general(
        xef[:, 2 * c :], wea[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    e11, e12 = hrow0[:, :h], hrow0[:, h:]
    e21, e22 = hrow1[:, :h], hrow1[:, h:]
    a1, a2, b1g, b2g, e11, e12, e21, e22 = _apply_gelu_tiles(
        hid1[0], hid1[1], hid1[2], hid1[3], e11, e12, e21, e22,
        cheap=dtype == jnp.bfloat16,
    )
    # hidden -> compute dtype: same rounding the separate-kernel path's
    # HBM store applied, so outputs match that path bitwise
    hs = [t.astype(dtype) for t in (a1, a2, b1g, b2g)]
    he0 = jnp.concatenate((e11, e12), axis=1).astype(dtype)
    he1 = jnp.concatenate((e21, e22), axis=1).astype(dtype)
    outs = []
    for g in range(4):
        acc = jax.lax.dot_general(
            hs[g], w1b[g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(acc)
    if use_bias:
        outs[0] = outs[0] + b2[0].astype(jnp.float32)
    yrow0 = jax.lax.dot_general(
        he0, web[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    yrow1 = jax.lax.dot_general(
        he1, web[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for g in range(4):
        y1[g] = outs[g].astype(dtype)
    yef[...] = jnp.concatenate((yrow0, yrow1), axis=1).astype(dtype)


def _mlp_row_tile(m: int, c: int, h: int, itemsize: int) -> int:
    # gelu temporaries (f32, ~4x the live hidden) dominate scoped VMEM —
    # same accounting as the mlp_branch kernel. tm sweep at ViT-H B=64:
    # 136 -> 137.4 ms model-level, 224 -> 136.8 (best), 256 -> 137.1,
    # 512 -> scoped-VMEM compile failure; 224 is the measured-safe cap.
    budget = int(5.7 * 1024 * 1024)
    per_row = 16 * c * itemsize + 8 * h * 4
    tm = max(8, budget // max(per_row, 1))
    return max(8, min((tm // 8) * 8, m, 224))


def _mlp_fwd_pallas(x1, xef, w1a, wea, b1, w1b, web, b2, interpret):
    m = x1.shape[1]
    c = w1a.shape[1]
    h = w1a.shape[2]
    f = w1b.shape[2]
    use_bias = b1 is not None
    b1v = jnp.zeros((1, h), x1.dtype) if b1 is None else b1.reshape(1, h)
    b2v = jnp.zeros((1, f), x1.dtype) if b2 is None else b2.reshape(1, f)
    tm = _mlp_row_tile(m, c, h, x1.dtype.itemsize)
    grid = (pl.cdiv(m, tm),)
    y1, yef = pl.pallas_call(
        functools.partial(_mlp_kernel, use_bias=use_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, tm, c), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c, h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * c, 2 * h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, h, f), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * h, 2 * f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((4, tm, f), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, m, f), x1.dtype),
            jax.ShapeDtypeStruct((m, 4 * f), x1.dtype),
        ),
        interpret=interpret,
    )(x1, xef, w1a, wea, b1v, w1b, web, b2v)
    return y1, yef


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def mlp_d8_fused(x1, xef, w1a, wea, b1, w1b, web, b2,
                 interpret: Optional[bool] = None):
    """One-kernel octic MLP (fc1 + octic GELU + fc2, hidden in VMEM).

    Layouts as `linear_d8_fused`; w1a/wea/b1 are fc1 weights (c -> h),
    w1b/web/b2 fc2 weights (h -> c)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _mlp_fwd_pallas(x1, xef, w1a, wea, b1, w1b, web, b2, interpret)


def _mlp_fwd_rule(x1, xef, w1a, wea, b1, w1b, web, b2, interpret):
    out = mlp_d8_fused(x1, xef, w1a, wea, b1, w1b, web, b2, interpret)
    return out, (x1, xef, w1a, wea, b1, w1b, web, b2)


def _mlp_bwd_rule(interpret, res, cot):
    """Composition of the two linear kernels' backward rules: recompute the
    pre-activation and (rounded) hidden, fc2 grads, GELU grad, fc1 grads —
    operation-for-operation what the separate-kernel path's backward does."""
    x1, xef, w1a, wea, b1, w1b, web, b2 = res
    g1, gef = cot
    h = w1a.shape[2]
    c = w1a.shape[1]
    f = w1b.shape[2]
    # recompute the rounded hidden through the fc1(+GELU) KERNEL — the
    # same op the separate-kernel path replays under remat, so the
    # backward's cost and the fc2 wgrad's operand are identical to that
    # path (an eager gelu+butterfly recompute here measured ~10 ms/step
    # slower at ViT-H B=32). The eager pre-activation below only feeds the
    # GELU gradient.
    h1, hef = linear_d8_fused(
        x1, xef, w1a, wea, b1, None, None, None, None, True, interpret
    )
    z1, row0, row1 = _eager_linear(x1, xef, w1a, wea, b1)
    z = (z1[0], z1[1], z1[2], z1[3],
         row0[:, :h], row1[:, :h], row0[:, h:], row1[:, h:])
    u = isotypic_to_regular(z)
    # fc2 backward
    g1f = g1.astype(jnp.float32)
    geff = gef.astype(jnp.float32)
    dh1 = jnp.einsum("gmf,gcf->gmc", g1f, w1b.astype(jnp.float32))
    dw1b = jnp.einsum("gmc,gmf->gcf", h1.astype(jnp.float32), g1f)
    grow0, grow1 = geff[:, : 2 * f], geff[:, 2 * f :]
    webf = web.astype(jnp.float32)
    dhef = jnp.concatenate((grow0 @ webf.T, grow1 @ webf.T), axis=-1)
    heff = hef.astype(jnp.float32)
    dweb = heff[:, : 2 * h].T @ grow0 + heff[:, 2 * h :].T @ grow1
    db2 = None if b2 is None else jnp.sum(g1f[0], axis=0).astype(b2.dtype)
    # GELU backward (exact-erf grad, matching linear_d8_fused's bwd)
    gz = (dh1[0], dh1[1], dh1[2], dh1[3],
          dhef[:, :h], dhef[:, 2 * h : 3 * h],
          dhef[:, h : 2 * h], dhef[:, 3 * h :])
    v = isotypic_to_regular(gz)
    d = regular_to_isotypic(tuple(_gelu_grad(ui) * vi for ui, vi in zip(u, v)))
    gz1 = jnp.stack(d[:4])
    gzef = jnp.concatenate((d[4], d[6], d[5], d[7]), axis=-1)
    # fc1 backward
    x1f = x1.astype(jnp.float32)
    dx1 = jnp.einsum("gmf,gcf->gmc", gz1, w1a.astype(jnp.float32))
    dw1a = jnp.einsum("gmc,gmf->gcf", x1f, gz1)
    zrow0, zrow1 = gzef[:, : 2 * h], gzef[:, 2 * h :]
    weaf = wea.astype(jnp.float32)
    dxef = jnp.concatenate((zrow0 @ weaf.T, zrow1 @ weaf.T), axis=-1)
    xeff = xef.astype(jnp.float32)
    dwea = xeff[:, : 2 * c].T @ zrow0 + xeff[:, 2 * c :].T @ zrow1
    db1 = None if b1 is None else jnp.sum(gz1[0], axis=0).astype(b1.dtype)
    return (
        dx1.astype(x1.dtype),
        dxef.astype(xef.dtype),
        dw1a.astype(w1a.dtype),
        dwea.astype(wea.dtype),
        db1,
        dw1b.astype(w1b.dtype),
        dweb.astype(web.dtype),
        db2,
    )


mlp_d8_fused.defvjp(_mlp_fwd_rule, _mlp_bwd_rule)


# ---------------------------------------------------------------------------
# packed-I/O fused octic MLP: input AND output are the flat packed [M, C]
# container ([A1|A2|B1|B2|E row0|E row1], d8/group.py:pack_5_to_flat). The
# per-irrep views are sliced inside the kernel and the five outputs land in
# ONE full-width store, so the surrounding norm/LayerScale/residual glue of
# the packed trunk runs on lane-aligned full-width arrays with no XLA-side
# slice/concat materialization around the kernel. Math identical to
# mlp_d8_fused.
# ---------------------------------------------------------------------------


def _mlp_kernel_packed(x, w1a, wea, b1, w1b, web, b2, y, *, use_bias: bool):
    dtype = y.dtype
    c = w1a.shape[-2]
    h = w1a.shape[-1]
    f = w1b.shape[-1]

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    hid1 = [dot(x[:, g * c : (g + 1) * c], w1a[g]) for g in range(4)]
    if use_bias:
        hid1[0] = hid1[0] + b1[0].astype(jnp.float32)
    hrow0 = dot(x[:, 4 * c : 6 * c], wea[...])
    hrow1 = dot(x[:, 6 * c :], wea[...])
    e11, e12 = hrow0[:, :h], hrow0[:, h:]
    e21, e22 = hrow1[:, :h], hrow1[:, h:]
    a1, a2, b1g, b2g, e11, e12, e21, e22 = _apply_gelu_tiles(
        hid1[0], hid1[1], hid1[2], hid1[3], e11, e12, e21, e22,
        cheap=dtype == jnp.bfloat16,
    )
    # hidden -> compute dtype: identical rounding to the separate-kernel
    # path's HBM store, so outputs match mlp_d8_fused bitwise
    hs = [t.astype(dtype) for t in (a1, a2, b1g, b2g)]
    he0 = jnp.concatenate((e11, e12), axis=1).astype(dtype)
    he1 = jnp.concatenate((e21, e22), axis=1).astype(dtype)
    for g in range(4):
        acc = dot(hs[g], w1b[g])
        if use_bias and g == 0:
            acc = acc + b2[0].astype(jnp.float32)
        y[:, g * f : (g + 1) * f] = acc.astype(dtype)
    yrow0 = dot(he0, web[...])
    yrow1 = dot(he1, web[...])
    y[:, 4 * f : 6 * f] = yrow0.astype(dtype)
    y[:, 6 * f :] = yrow1.astype(dtype)


def _mlp_packed_fwd_pallas(x, w1a, wea, b1, w1b, web, b2, interpret):
    m = x.shape[0]
    c = w1a.shape[1]
    h = w1a.shape[2]
    f = w1b.shape[2]
    use_bias = b1 is not None
    b1v = jnp.zeros((1, h), x.dtype) if b1 is None else b1.reshape(1, h)
    b2v = jnp.zeros((1, f), x.dtype) if b2 is None else b2.reshape(1, f)
    tm = _mlp_row_tile(m, c, h, x.dtype.itemsize)
    grid = (pl.cdiv(m, tm),)
    return pl.pallas_call(
        functools.partial(_mlp_kernel_packed, use_bias=use_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, 8 * c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c, h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * c, 2 * h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, h, f), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * h, 2 * f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 8 * f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 8 * f), x.dtype),
        interpret=interpret,
    )(x, w1a, wea, b1v, w1b, web, b2v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def mlp_d8_fused_packed(x, w1a, wea, b1, w1b, web, b2,
                        interpret: Optional[bool] = None):
    """One-kernel octic MLP on the flat packed container: [M, C] -> [M, C']."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _mlp_packed_fwd_pallas(x, w1a, wea, b1, w1b, web, b2, interpret)


def _mlp_packed_fwd_rule(x, w1a, wea, b1, w1b, web, b2, interpret):
    out = mlp_d8_fused_packed(x, w1a, wea, b1, w1b, web, b2, interpret)
    return out, (x, w1a, wea, b1, w1b, web, b2)


def _mlp_packed_bwd_rule(interpret, res, cot):
    x, w1a, wea, b1, w1b, web, b2 = res
    c = w1a.shape[1]
    f = w1b.shape[2]
    x1 = jnp.stack([x[:, g * c : (g + 1) * c] for g in range(4)])
    xef = x[:, 4 * c :]
    g1 = jnp.stack([cot[:, g * f : (g + 1) * f] for g in range(4)])
    gef = cot[:, 4 * f :]
    dx1, dxef, dw1a, dwea, db1, dw1b, dweb, db2 = _mlp_bwd_rule(
        interpret, (x1, xef, w1a, wea, b1, w1b, web, b2), (g1, gef)
    )
    dx = jnp.concatenate((dx1[0], dx1[1], dx1[2], dx1[3], dxef), axis=-1)
    return (dx, dw1a, dwea, db1, dw1b, dweb, db2)


mlp_d8_fused_packed.defvjp(_mlp_packed_fwd_rule, _mlp_packed_bwd_rule)


def mlp_d8_packed(x, w1a, wea, b1, w1b, web, b2, interpret=None):
    """Packed-container wrapper with arbitrary leading dims:
    [..., C] -> [..., C']."""
    lead = x.shape[:-1]
    c = x.shape[-1]
    m = 1
    for d in lead:
        m *= d
    f = w1b.shape[-1]
    y = mlp_d8_fused_packed(
        x.reshape(m, c), w1a, wea, b1, w1b, web, b2, interpret
    )
    return y.reshape(*lead, 8 * f)


def mlp_d8_tuple(xs, w1a, wea, b1, w1b, web, b2, interpret=None,
                 flat_e=False):
    """5-tuple wrapper for the fused octic MLP (layouts as
    `linear_d8_tuple`)."""
    a1 = xs[0]
    lead = a1.shape[:-1]
    m = 1
    for dd in lead:
        m *= dd
    c = a1.shape[-1]
    f = w1b.shape[-1]
    x1 = jnp.stack([x.reshape(m, c) for x in xs[:4]])
    xef = xs[4].reshape(m, 4 * c)
    y1, yef = mlp_d8_fused(x1, xef, w1a, wea, b1, w1b, web, b2, interpret)
    outs = tuple(y1[g].reshape(*lead, f) for g in range(4))
    e = yef.reshape(*lead, 4 * f) if flat_e else yef.reshape(*lead, 2, 2 * f)
    return outs + (e,)


def linear_d8_tuple(xs, w1, we, bias, fuse_gelu=False, interpret=None,
                    layerscale=None, residual=None, flat_e=False):
    """5-tuple wrapper: (a1,a2,b1,b2,e[...,2,2c]) -> 5-tuple of width f.

    `layerscale` = (alpha_1d [4,f], alpha_e [2f]) and `residual` (a 5-tuple
    of output shape) fuse  y = residual + alpha * linear(x)  into the
    kernel epilogue (the block's LayerScale + residual add).

    `flat_e=True`: E travels as ONE flat [..., 4c] array [row0|row1] — the
    kernel's own layout — skipping the [..., 2, 2c] relayouts on both
    sides (the TPU packed-trunk path)."""
    a1 = xs[0]
    lead = a1.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    c = a1.shape[-1]
    f = w1.shape[-1]
    x1 = jnp.stack([x.reshape(m, c) for x in xs[:4]])
    xef = xs[4].reshape(m, 4 * c)
    ls1 = lse = r1 = ref_ = None
    if layerscale is not None:
        ls1, lse = layerscale
        r1 = jnp.stack([r.reshape(m, f) for r in residual[:4]])
        ref_ = residual[4].reshape(m, 4 * f)
    y1, yef = linear_d8_fused(
        x1, xef, w1, we, bias, ls1, lse, r1, ref_, fuse_gelu, interpret
    )
    outs = tuple(y1[g].reshape(*lead, f) for g in range(4))
    e = yef.reshape(*lead, 4 * f) if flat_e else yef.reshape(*lead, 2, 2 * f)
    return outs + (e,)
