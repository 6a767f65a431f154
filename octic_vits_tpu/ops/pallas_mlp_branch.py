"""Pallas TPU kernel: the ENTIRE octic MLP residual branch in one pass.

    out = x + ls * fc2( gelu_d8( fc1( layernorm_d8(x) ) ) )

Per token tile everything — the equivariant layer norm (per-irrep means,
SHARED std), both block-diagonal linears, the isotypic<->regular GELU
butterflies, LayerScale and the residual add — happens in VMEM. The hidden
activations (4x the width) never touch HBM, and the branch's HBM traffic
collapses to: read x once, write out once, stream the weights.

Backward: custom VJP whose backward is XLA autodiff of the numerically
identical eager composite (`mlp_branch_eager`) — correctness by
construction; the forward kernel is where the eval/bench time goes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from octic_vits_tpu.d8.group import SQRT2_OVER_4
from octic_vits_tpu.ops.pallas_gelu import _gelu_exact
from octic_vits_tpu.ops.pallas_linear import _apply_gelu_tiles

Array = jnp.ndarray

# params pytree layout (a plain tuple so custom_vjp sees arrays):
#  (norm_alpha_1d [4,c8], norm_alpha_e [2c8], norm_beta [c8],
#   fc1_w1 [4,c8,h8], fc1_we [2c8,2h8], fc1_b [h8],
#   fc2_w1 [4,h8,c8], fc2_we [2h8,2c8], fc2_b [c8],
#   ls_1d [4,c8], ls_e [2c8])


def _norm_d8_tiles(x1, x2, x3, x4, e0, e1, eps, na, ne, nb):
    """LayerNormD8 on tiles: per-irrep centering, shared std, affine.
    x* [TM, c8]; e0/e1 [TM, 2c8] (the two packed E rows)."""
    f32 = jnp.float32
    ones = [t.astype(f32) for t in (x1, x2, x3, x4)]
    es = [e0.astype(f32), e1.astype(f32)]
    means = [jnp.mean(t, axis=1, keepdims=True) for t in ones]
    e_means = [jnp.mean(t, axis=1, keepdims=True) for t in es]
    var = sum(
        jnp.mean((t - m) ** 2, axis=1, keepdims=True)
        for t, m in zip(ones, means)
    )
    var_e = sum(
        jnp.mean((t - m) ** 2, axis=1, keepdims=True)
        for t, m in zip(es, e_means)
    )
    std = SQRT2_OVER_4 * jnp.sqrt(var + 0.5 * var_e + eps)
    inv = 1.0 / std
    out1 = [
        (t - m) * inv * na[g : g + 1, :].astype(f32)
        for g, (t, m) in enumerate(zip(ones, means))
    ]
    out1[0] = out1[0] + nb[0:1, :].astype(f32)
    oute = [
        (t - m) * inv * ne[0:1, :].astype(f32)
        for t, m in zip(es, e_means)
    ]
    return out1, oute


def _mlp_branch_kernel(
    x1, x2, x3, x4, ef, na, ne, nb, w1a, wea, b1, w1b, web, b2, ls1, lse,
    o1, o2, o3, o4, oe, *, eps: float,
):
    dtype = o1.dtype
    f32 = jnp.float32
    c8 = x1.shape[-1]
    h8 = w1a.shape[-1]
    c4 = 2 * c8

    xs1 = [x1[0], x2[0], x3[0], x4[0]]
    e_rows = [ef[0][:, :c4], ef[0][:, c4:]]

    n1, ne_rows = _norm_d8_tiles(*xs1, *e_rows, eps, na, ne, nb)

    # fc1 (block-diagonal) -> hidden in fp32
    h1 = []
    for g in range(4):
        acc = jax.lax.dot_general(
            n1[g].astype(dtype), w1a[g].astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )
        h1.append(acc)
    h1[0] = h1[0] + b1[0].astype(f32)
    he = [
        jax.lax.dot_general(
            r.astype(dtype), wea[...].astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )
        for r in ne_rows
    ]  # each [TM, 2h8]

    # bf16 path: hidden drops to bf16 between fc1 and fc2 (same rounding
    # as the separate-kernel path) — halves the per-row VMEM footprint so
    # row tiles double and weight-block refetches halve
    if dtype == jnp.bfloat16:
        h1 = [t.astype(dtype) for t in h1]
        he = [t.astype(dtype) for t in he]

    # octic GELU on hidden slots
    e11, e12 = he[0][:, :h8], he[0][:, h8:]
    e21, e22 = he[1][:, :h8], he[1][:, h8:]
    a1g, a2g, b1g, b2g, e11, e12, e21, e22 = _apply_gelu_tiles(
        h1[0], h1[1], h1[2], h1[3], e11, e12, e21, e22,
        cheap=dtype == jnp.bfloat16,
    )

    # fc2
    y1 = []
    for g, t in enumerate((a1g, a2g, b1g, b2g)):
        acc = jax.lax.dot_general(
            t.astype(dtype), w1b[g].astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )
        y1.append(acc)
    y1[0] = y1[0] + b2[0].astype(f32)
    web_c = web[...].astype(dtype)
    yrow0 = jax.lax.dot_general(
        jnp.concatenate((e11, e12), axis=1).astype(dtype), web_c,
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )
    yrow1 = jax.lax.dot_general(
        jnp.concatenate((e21, e22), axis=1).astype(dtype), web_c,
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )

    # LayerScale + residual, single store
    outs = (o1, o2, o3, o4)
    for g in range(4):
        outs[g][0] = (
            xs1[g].astype(f32) + ls1[g : g + 1, :].astype(f32) * y1[g]
        ).astype(dtype)
    lsef = lse[0:1, :].astype(f32)
    oe[0] = jnp.concatenate(
        (
            e_rows[0].astype(f32) + lsef * yrow0,
            e_rows[1].astype(f32) + lsef * yrow1,
        ),
        axis=1,
    ).astype(dtype)


def mlp_branch_eager(xs, params, eps: float = 1e-5):
    """Numerically identical eager composite (backward + test oracle)."""
    (na, ne, nb, w1a, wea, b1, w1b, web, b2, ls1, lse) = params
    from octic_vits_tpu.layers.d8_layers import layer_norm_d8_stats
    from octic_vits_tpu.ops.gelu_d8 import gelu_d8_eager

    normed = layer_norm_d8_stats(xs, eps)
    normed = (
        normed[0] * na[0] + nb,
        normed[1] * na[1],
        normed[2] * na[2],
        normed[3] * na[3],
        normed[4] * ne,
    )
    h = tuple(
        jnp.einsum("...c,cf->...f", normed[g], w1a[g]) for g in range(4)
    )
    h = (h[0] + b1,) + h[1:] + (jnp.einsum("...rc,cf->...rf", normed[4], wea),)
    h = gelu_d8_eager(h)
    y = tuple(jnp.einsum("...c,cf->...f", h[g], w1b[g]) for g in range(4))
    y = (y[0] + b2,) + y[1:] + (jnp.einsum("...rc,cf->...rf", h[4], web),)
    return (
        xs[0] + ls1[0] * y[0],
        xs[1] + ls1[1] * y[1],
        xs[2] + ls1[2] * y[2],
        xs[3] + ls1[3] * y[3],
        xs[4] + lse * y[4],
    )


def _row_tile(m: int, c8: int, h8: int, itemsize: int) -> int:
    # bf16 keeps the hidden in bf16 (see kernel); fp32 keeps it in fp32.
    # Mosaic's scoped-vmem accounting charges ~65 KB/row at ViT-H shapes
    # (gelu temporaries dominate, ~4x the live hidden), so the budget here
    # is calibrated to land under the 16M scoped limit: measured 21.78M at
    # tm=336, 16M-safe at tm<=224.
    budget = int(3.4 * 1024 * 1024)
    per_row = 16 * c8 * itemsize + 8 * h8 * (4 if itemsize == 4 else 2)
    tm = max(8, budget // max(per_row, 1))
    return max(8, min((tm // 8) * 8, m, 512))


def _fwd_pallas(xs_flat, params, eps, interpret):
    x1, x2, x3, x4, ef = xs_flat
    (na, ne, nb, w1a, wea, b1, w1b, web, b2, ls1, lse) = params
    m, c8 = x1.shape
    h8 = w1a.shape[-1]
    tm = _row_tile(m, c8, h8, x1.dtype.itemsize)
    grid = (pl.cdiv(m, tm),)

    def row_spec(width):
        return pl.BlockSpec(
            (1, tm, width), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, (lambda i: (0,) * nd), memory_space=pltpu.VMEM
        )

    in_specs = (
        [row_spec(c8)] * 4
        + [row_spec(4 * c8)]
        + [
            const_spec((4, c8)), const_spec((1, 2 * c8)), const_spec((1, c8)),
            const_spec((4, c8, h8)), const_spec((2 * c8, 2 * h8)),
            const_spec((1, h8)),
            const_spec((4, h8, c8)), const_spec((2 * h8, 2 * c8)),
            const_spec((1, c8)),
            const_spec((4, c8)), const_spec((1, 2 * c8)),
        ]
    )
    args = [
        x1.reshape(1, m, -1), x2.reshape(1, m, -1), x3.reshape(1, m, -1),
        x4.reshape(1, m, -1), ef.reshape(1, m, -1),
        na, ne.reshape(1, -1), nb.reshape(1, -1),
        w1a, wea, b1.reshape(1, -1), w1b, web, b2.reshape(1, -1),
        ls1, lse.reshape(1, -1),
    ]

    out_specs = tuple(
        pl.BlockSpec((1, tm, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        for w in [c8] * 4 + [4 * c8]
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((1, m, w), x1.dtype) for w in [c8] * 4 + [4 * c8]
    )
    outs = pl.pallas_call(
        functools.partial(_mlp_branch_kernel, eps=eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    return tuple(o.reshape(m, -1) for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def mlp_branch_d8(xs, params, eps: float = 1e-5,
                  interpret: Optional[bool] = None):
    """Fused octic MLP residual branch. xs: packed 5-tuple; params: the
    11-tuple documented above. Returns the new 5-tuple."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = xs[0].shape[:-1]
    c8 = xs[0].shape[-1]
    flat_e = xs[4].ndim == xs[0].ndim  # flat-E container in == out
    m = 1
    for d in lead:
        m *= d
    flat = tuple(x.reshape(m, -1) for x in xs[:4]) + (
        xs[4].reshape(m, 4 * c8),
    )
    outs = _fwd_pallas(flat, params, eps, interpret)
    e_out = (
        outs[4].reshape(*lead, 4 * c8) if flat_e
        else outs[4].reshape(*lead, 2, 2 * c8)
    )
    return tuple(o.reshape(*lead, c8) for o in outs[:4]) + (e_out,)


def _fwd_rule(xs, params, eps, interpret):
    return mlp_branch_d8(xs, params, eps, interpret), (xs, params)


def _bwd_rule(eps, interpret, res, g):
    xs, params = res
    _, vjp = jax.vjp(lambda x, p: mlp_branch_eager(x, p, eps), xs, params)
    return vjp(g)


mlp_branch_d8.defvjp(_fwd_rule, _bwd_rule)
