"""Pallas TPU kernel: fused dense linear + exact-erf GELU epilogue.

Used for the standard ViT MLP's fc1: gelu(x @ w + b) computed per token
tile with the activation applied before the single store — the pre-GELU
hidden tensor (4x model width) never round-trips HBM. Backward recomputes
via the eager composite (custom VJP).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from octic_vits_tpu.ops.pallas_gelu import _gelu_exact

Array = jnp.ndarray


def _kernel(x, w, b, o, *, use_bias: bool):
    acc = jax.lax.dot_general(
        x[0], w[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if use_bias:
        acc = acc + b[0].astype(jnp.float32)
    o[0] = _gelu_exact(acc, cheap=o.dtype == jnp.bfloat16).astype(o.dtype)


def _row_tile(m: int, c: int, f: int, itemsize: int) -> int:
    budget = 3 * 1024 * 1024
    per_row = (c + f) * itemsize + f * 4  # in + out + f32 acc
    tm = max(8, budget // max(per_row, 1))
    return max(8, min((tm // 8) * 8, m, 1024))


def _fwd(x, w, b, interpret):
    m, c = x.shape
    f = w.shape[1]
    use_bias = b is not None
    bb = jnp.zeros((1, f), x.dtype) if b is None else b.reshape(1, f)
    tm = _row_tile(m, c, f, x.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_kernel, use_bias=use_bias),
        grid=(pl.cdiv(m, tm),),
        in_specs=[
            pl.BlockSpec((1, tm, c), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tm, f), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, m, f), x.dtype),
        interpret=interpret,
    )(x.reshape(1, m, c), w, bb).reshape(m, f)


def _col_tile(c: int, f: int, itemsize: int) -> int:
    """Feature-axis tile so the resident weight block stays ~3MB."""
    tf = (3 * 1024 * 1024) // max(c * itemsize, 1)
    tf = max(128, (tf // 128) * 128)
    return min(f, tf)


def _fwd_3d(x, w, b, interpret):
    """Shape-native path for x [B, N, C]: grid (B, F/tf), whole-N blocks.

    Avoids the [B,N,C] <-> [B*N,C] wrapper reshapes, which XLA materializes
    as real copies inside a scanned trunk (traced at 0.72 + 0.12 ms/block
    for the standard half of hybrid ViT-H — BENCH.md round 2)."""
    bsz, n, c = x.shape
    f = w.shape[1]
    use_bias = b is not None
    bb = jnp.zeros((1, f), x.dtype) if b is None else b.reshape(1, f)
    tf = _col_tile(c, f, x.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_kernel, use_bias=use_bias),
        grid=(bsz, pl.cdiv(f, tf)),
        in_specs=[
            # constant over j: fetched once per batch row
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, tf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, tf), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, f), x.dtype),
        interpret=interpret,
    )(x, w, bb)


def _eager(x, w, b):
    y = jnp.dot(
        x.astype(jnp.float32), w.astype(jnp.float32)
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return _gelu_exact(y).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dense_gelu(x: Array, w: Array, b: Optional[Array],
               interpret: Optional[bool] = None) -> Array:
    """gelu(x @ w + b) for x [..., C], w [C, F]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if x.ndim == 3:
        return _fwd_3d(x, w, b, interpret)
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    out = _fwd(x.reshape(m, -1), w, b, interpret)
    return out.reshape(*lead, -1)


def _fwd_rule(x, w, b, interpret):
    return dense_gelu(x, w, b, interpret), (x, w, b)


def _bwd_rule(interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda xx, ww, bb: _eager_nd(xx, ww, bb), x, w, b)
    return vjp(g)


def _eager_nd(x, w, b):
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    return _eager(x.reshape(m, -1), w, b).reshape(*lead, -1)


dense_gelu.defvjp(_fwd_rule, _bwd_rule)
