"""Pallas TPU kernel: shared-std D8 LayerNorm statistics on the flat-E
5-tuple (forward + analytic backward).

Math is exactly `layer_norm_d8_stats` (reference formula:
octic_vits/d8_layers.py:161-186 — per-irrep mean removal, ONE shared
std = (sqrt2/4) * sqrt(var_A1+var_A2+var_B1+var_B2 + mean_rows(var_E) + eps),
biased variances, eps inside the sqrt), and the backward is the same closed
form as `_tuple_ln_custom_bwd` (layers/d8_layers.py): with out = xc * g,

    dxc = g*u - g*k^2*(u.out) * d (.) out,   dx = P dxc,

P the per-segment mean-removal projector and d the variance lane weights
(1/c on A lanes, 0.25/c on E lanes).

WHY a kernel at all: the XLA lowering of the tuple LN reduces over the
NARROW last axis (c8 = C/8 lanes, e.g. 160 at ViT-H), and XLA's layout
assignment answers by transposing the whole octic residual stream to an
N-in-lanes layout ({1,2,0}) — while every surrounding Pallas kernel pins
its operands/results to the row-major default. The result (optimized-HLO
trace, ViT-H/14 B=64) is ~12 layout-conversion copies + 4 transposed
reshapes per block, ~0.3 ms/block of pure relayout traffic. Doing the
reduces INSIDE a kernel keeps the whole octic block row-major; the copies
disappear at the layout-assignment level.

E-row handling: the flat E [.., 4c] = [row0|row1] boundary (2c lanes) is
not 128-aligned, so the kernel never slices it — per-row means/variances
use lane-iota masks and full-width selects, like the eager flat-E path.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from octic_vits_tpu.d8.group import SQRT2_OVER_4

Array = jnp.ndarray
Tuple5 = Tuple[Array, Array, Array, Array, Array]

_K2 = SQRT2_OVER_4 * SQRT2_OVER_4


def _row_mean(x, width):
    return jnp.sum(x, axis=-1, keepdims=True) * (1.0 / width)


def _e_masks(ef):
    c4 = ef.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, ef.shape, ef.ndim - 1)
    return lane < (c4 // 2)


def _stats(a1, a2, b1, b2, ef, eps):
    """Centered activations + shared var for one row tile (all f32)."""
    c = a1.shape[-1]
    f32 = lambda r: r[...].astype(jnp.float32)

    xs = (f32(a1), f32(a2), f32(b1), f32(b2))
    sq = jnp.zeros((a1.shape[0], 1), jnp.float32)
    xcs = []
    for x in xs:
        xc = x - _row_mean(x, c)
        xcs.append(xc)
        sq = sq + jnp.sum(xc * xc, axis=-1, keepdims=True)

    e = f32(ef)
    m0 = _e_masks(e)
    half = e.shape[-1] // 2
    s_all = jnp.sum(e, axis=-1, keepdims=True)
    s0 = jnp.sum(jnp.where(m0, e, 0.0), axis=-1, keepdims=True)
    mean0 = s0 * (1.0 / half)
    mean1 = (s_all - s0) * (1.0 / half)
    ec = e - jnp.where(m0, mean0, mean1)
    sq_e = jnp.sum(ec * ec, axis=-1, keepdims=True)

    # var = sum_A var_g + 0.5*(var_e0 + var_e1) + eps, biased variances
    var = sq * (1.0 / c) + sq_e * (0.25 / c) + eps
    inv_std = 1.0 / (SQRT2_OVER_4 * jnp.sqrt(var))
    return xcs, ec, var, inv_std


def _fwd_kernel(eps, a1, a2, b1, b2, ef, oa1, oa2, ob1, ob2, oef, ovar):
    dtype = a1.dtype
    xcs, ec, var, inv_std = _stats(a1, a2, b1, b2, ef, eps)
    oa1[...] = (xcs[0] * inv_std).astype(dtype)
    oa2[...] = (xcs[1] * inv_std).astype(dtype)
    ob1[...] = (xcs[2] * inv_std).astype(dtype)
    ob2[...] = (xcs[3] * inv_std).astype(dtype)
    oef[...] = (ec * inv_std).astype(dtype)
    ovar[...] = var


def _fwd_affine_kernel(eps, a1, a2, b1, b2, ef, al, ae, be,
                       oa1, oa2, ob1, ob2, oef, ovar):
    """LN stats + the AffineD8 epilogue (alpha per irrep lane, beta on A1):
    the affine rides the kernel's existing stores instead of a standalone
    full-width XLA pass per LN (~0.1 ms/block at ViT-H B=64)."""
    dtype = a1.dtype
    xcs, ec, var, inv_std = _stats(a1, a2, b1, b2, ef, eps)
    alv = al[...].astype(jnp.float32)     # [4, c]
    aev = ae[...].astype(jnp.float32)     # [1, 4c] (alpha_e duplicated)
    bev = be[...].astype(jnp.float32)     # [1, c]
    oa1[...] = (xcs[0] * inv_std * alv[0:1] + bev).astype(dtype)
    oa2[...] = (xcs[1] * inv_std * alv[1:2]).astype(dtype)
    ob1[...] = (xcs[2] * inv_std * alv[2:3]).astype(dtype)
    ob2[...] = (xcs[3] * inv_std * alv[3:4]).astype(dtype)
    oef[...] = (ec * inv_std * aev).astype(dtype)
    ovar[...] = var


def _bwd_affine_kernel(eps, m_total, tm,
                       a1, a2, b1, b2, ef, al, ae,
                       u1, u2, u3, u4, ue,
                       d1, d2, d3, d4, de, dal, dae, dbe):
    """Recompute-stats backward of LN+affine in one pass.

    Residuals are the INPUTS (the block's residual stream — alive under
    remat anyway), not the normalized outputs: stats are recomputed on the
    VPU (cheaper than a second 42 MB store+load of `out` per LN). Param
    grads (dalpha/dbeta) accumulate in f32 across the sequential grid into
    revisited output blocks; garbage rows of the partial last tile are
    masked out of the cross-row sums."""
    pid = pl.program_id(0)
    dtype = a1.dtype
    c = a1.shape[-1]
    f32 = lambda r: r[...].astype(jnp.float32)

    xcs, ec, var, inv_std = _stats(a1, a2, b1, b2, ef, eps)
    outs = tuple(xc * inv_std for xc in xcs) + (ec * inv_std,)

    # mask rows beyond m_total (partial last tile) out of the param sums
    row = jax.lax.broadcasted_iota(jnp.int32, (a1.shape[0], 1), 0)
    valid = (pid * tm + row) < m_total

    alv = al[...].astype(jnp.float32)     # [4, c]
    aev = ae[...].astype(jnp.float32)     # [1, 4c]
    us = (f32(u1), f32(u2), f32(u3), f32(u4), f32(ue))

    # param grads: dalpha_g = sum_rows u_g * out_g, dbeta = sum_rows u_a1.
    # Mask the PRODUCT (not just u): out-of-bounds rows load unspecified
    # values (NaN in interpret mode) and 0 * NaN would poison the sums.
    pal = jnp.concatenate(
        [jnp.sum(jnp.where(valid, us[i] * outs[i], 0.0), axis=0,
                 keepdims=True) for i in range(4)],
        axis=0,
    )                                                    # [4, c]
    pae = jnp.sum(jnp.where(valid, us[4] * outs[4], 0.0), axis=0,
                  keepdims=True)                         # [1, 4c]
    pbe = jnp.sum(jnp.where(valid, us[0], 0.0), axis=0,
                  keepdims=True)                         # [1, c]

    @pl.when(pid == 0)
    def _init():
        dal[...] = jnp.zeros(dal.shape, dal.dtype)
        dae[...] = jnp.zeros(dae.shape, dae.dtype)
        dbe[...] = jnp.zeros(dbe.shape, dbe.dtype)

    dal[...] += pal
    dae[...] += pae
    dbe[...] += pbe

    # stats backward with the affine folded: u_stats = alpha (.) u
    ust = tuple(us[i] * alv[i:i + 1] for i in range(4)) + (us[4] * aev,)
    udotout = jnp.zeros((a1.shape[0], 1), jnp.float32)
    for u, o in zip(ust, outs):
        udotout = udotout + jnp.sum(u * o, axis=-1, keepdims=True)
    coef = inv_std * _K2 * udotout

    douts = (d1, d2, d3, d4)
    for i in range(4):
        dxc = inv_std * ust[i] - coef * (1.0 / c) * outs[i]
        douts[i][...] = (dxc - _row_mean(dxc, c)).astype(dtype)

    dec = inv_std * ust[4] - coef * (0.25 / c) * outs[4]
    m0 = _e_masks(dec)
    half = dec.shape[-1] // 2
    s_all = jnp.sum(dec, axis=-1, keepdims=True)
    s0 = jnp.sum(jnp.where(m0, dec, 0.0), axis=-1, keepdims=True)
    me0 = s0 * (1.0 / half)
    me1 = (s_all - s0) * (1.0 / half)
    de[...] = (dec - jnp.where(m0, me0, me1)).astype(dtype)


def _bwd_kernel(o1, o2, o3, o4, oe, var, u1, u2, u3, u4, ue,
                d1, d2, d3, d4, de):
    dtype = o1.dtype
    c = o1.shape[-1]
    f32 = lambda r: r[...].astype(jnp.float32)

    v = var[...]
    g = 1.0 / (SQRT2_OVER_4 * jnp.sqrt(v))

    outs = (f32(o1), f32(o2), f32(o3), f32(o4), f32(oe))
    us = (f32(u1), f32(u2), f32(u3), f32(u4), f32(ue))
    udotout = jnp.zeros((o1.shape[0], 1), jnp.float32)
    for u, o in zip(us, outs):
        udotout = udotout + jnp.sum(u * o, axis=-1, keepdims=True)
    coef = g * _K2 * udotout

    douts = (d1, d2, d3, d4)
    for i in range(4):
        dxc = g * us[i] - coef * (1.0 / c) * outs[i]
        douts[i][...] = (dxc - _row_mean(dxc, c)).astype(dtype)

    dec = g * us[4] - coef * (0.25 / c) * outs[4]
    m0 = _e_masks(dec)
    half = dec.shape[-1] // 2
    s_all = jnp.sum(dec, axis=-1, keepdims=True)
    s0 = jnp.sum(jnp.where(m0, dec, 0.0), axis=-1, keepdims=True)
    me0 = s0 * (1.0 / half)
    me1 = (s_all - s0) * (1.0 / half)
    de[...] = (dec - jnp.where(m0, me0, me1)).astype(dtype)


def _flatten(xs: Tuple5):
    a1 = xs[0]
    lead = a1.shape[:-1]
    m = math.prod(lead)
    c = a1.shape[-1]
    return (
        tuple(x.reshape(m, c) for x in xs[:4]) + (xs[4].reshape(m, 4 * c),),
        lead, m, c,
    )


def _row_tile(m: int, c: int, itemsize: int, streams: int) -> int:
    # Block-I/O budget only proxies the true constraint: Mosaic's scoped
    # VMEM also holds the kernel's f32 temporaries (xc/ec/outs at full
    # width). 4 MB measured 92 KB over the 16 MB scoped limit on the
    # affine-fwd kernel at ViT-H (tm=816); 3 MB leaves ~25% headroom.
    budget = 3 * 1024 * 1024
    per_row = streams * c * itemsize
    tm = max(8, budget // max(per_row, 1))
    tm = min(tm, m, 1024)
    return max(8, (tm // 8) * 8)


def _auto_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _spec(tm, width):
    return pl.BlockSpec((tm, width), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _ln_fwd(xs: Tuple5, eps: float, interpret):
    if interpret is None:
        interpret = _auto_interpret()
    flat, lead, m, c = _flatten(xs)
    dtype = flat[0].dtype
    tm = _row_tile(m, c, dtype.itemsize, streams=16)
    grid = (pl.cdiv(m, tm),)
    widths = [c] * 4 + [4 * c]
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, eps),
        grid=grid,
        in_specs=[_spec(tm, w) for w in widths],
        out_specs=tuple(_spec(tm, w) for w in widths) + (_spec(tm, 1),),
        out_shape=tuple(
            jax.ShapeDtypeStruct((m, w), dtype) for w in widths
        ) + (jax.ShapeDtypeStruct((m, 1), jnp.float32),),
        interpret=interpret,
    )(*flat)
    c4 = 4 * c
    out = tuple(y.reshape(*lead, c) for y in outs[:4]) + (
        outs[4].reshape(*lead, c4),
    )
    return out, outs[5]  # var stays [M, 1] (kernel-internal shape)


def _ln_bwd(out_flat, var, us: Tuple5, interpret):
    if interpret is None:
        interpret = _auto_interpret()
    flat_u, lead, m, c = _flatten(us)
    dtype = flat_u[0].dtype
    tm = _row_tile(m, c, dtype.itemsize, streams=24)
    grid = (pl.cdiv(m, tm),)
    widths = [c] * 4 + [4 * c]
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[_spec(tm, w) for w in widths] + [_spec(tm, 1)]
        + [_spec(tm, w) for w in widths],
        out_specs=tuple(_spec(tm, w) for w in widths),
        out_shape=tuple(
            jax.ShapeDtypeStruct((m, w), dtype) for w in widths
        ),
        interpret=interpret,
    )(*(out_flat + (var,) + flat_u))
    return tuple(y.reshape(*lead, c) for y in outs[:4]) + (
        outs[4].reshape(*lead, 4 * c),
    )


def _ln_affine_fwd(xs, al, ae, be, eps, interpret):
    if interpret is None:
        interpret = _auto_interpret()
    flat, lead, m, c = _flatten(xs)
    dtype = flat[0].dtype
    tm = _row_tile(m, c, dtype.itemsize, streams=16)
    grid = (pl.cdiv(m, tm),)
    widths = [c] * 4 + [4 * c]

    def pspec(r, w):
        return pl.BlockSpec((r, w), lambda i: (0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_fwd_affine_kernel, eps),
        grid=grid,
        in_specs=[_spec(tm, w) for w in widths]
        + [pspec(4, c), pspec(1, 4 * c), pspec(1, c)],
        out_specs=tuple(_spec(tm, w) for w in widths) + (_spec(tm, 1),),
        out_shape=tuple(
            jax.ShapeDtypeStruct((m, w), dtype) for w in widths
        ) + (jax.ShapeDtypeStruct((m, 1), jnp.float32),),
        interpret=interpret,
    )(*flat, al, ae, be)
    return tuple(y.reshape(*lead, c) for y in outs[:4]) + (
        outs[4].reshape(*lead, 4 * c),
    )


def _ln_affine_bwd(xs, al, ae, us, eps, interpret):
    if interpret is None:
        interpret = _auto_interpret()
    flat_x, lead, m, c = _flatten(xs)
    flat_u, _, _, _ = _flatten(us)
    dtype = flat_x[0].dtype
    tm = _row_tile(m, c, dtype.itemsize, streams=24)
    grid = (pl.cdiv(m, tm),)
    widths = [c] * 4 + [4 * c]

    def pspec(r, w):
        return pl.BlockSpec((r, w), lambda i: (0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_bwd_affine_kernel, eps, m, tm),
        grid=grid,
        in_specs=[_spec(tm, w) for w in widths]
        + [pspec(4, c), pspec(1, 4 * c)]
        + [_spec(tm, w) for w in widths],
        out_specs=tuple(_spec(tm, w) for w in widths)
        + (pspec(4, c), pspec(1, 4 * c), pspec(1, c)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((m, w), dtype) for w in widths
        ) + (
            jax.ShapeDtypeStruct((4, c), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=interpret,
    )(*(flat_x + (al, ae) + flat_u))
    dxs = tuple(y.reshape(*lead, c) for y in outs[:4]) + (
        outs[4].reshape(*lead, 4 * c),
    )
    return dxs, outs[5], outs[6], outs[7]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ln_affine_d8_flat_tuple(xs: Tuple5, alpha, alpha_ef, beta,
                            eps: float = 1e-5,
                            interpret: bool | None = None) -> Tuple5:
    """Shared-std D8 LayerNorm + AffineD8 epilogue in ONE Pallas kernel on
    the flat-E 5-tuple.

    `alpha` [4, c] (per-irrep lane scales), `alpha_ef` [1, 4c] (alpha_e
    duplicated over both E rows), `beta` [1, c] (A1 bias; pass zeros for
    elementwise_affine without bias). Backward recomputes the stats from
    the saved INPUT (no normalized-output residual) and accumulates the
    f32 dalpha/dbeta in-kernel across the grid."""
    return _ln_affine_fwd(xs, alpha, alpha_ef, beta, eps, interpret)


def _affine_vjp_fwd(xs, alpha, alpha_ef, beta, eps, interpret):
    out = _ln_affine_fwd(xs, alpha, alpha_ef, beta, eps, interpret)
    return out, (xs, alpha, alpha_ef)


def _affine_vjp_bwd(eps, interpret, res, us):
    xs, alpha, alpha_ef = res
    dxs, dal, dae, dbe = _ln_affine_bwd(xs, alpha, alpha_ef, us, eps,
                                        interpret)
    return (dxs, dal.astype(alpha.dtype), dae.astype(alpha_ef.dtype),
            dbe.astype(alpha.dtype))


ln_affine_d8_flat_tuple.defvjp(_affine_vjp_fwd, _affine_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def ln_d8_flat_tuple(xs: Tuple5, eps: float = 1e-5,
                     interpret: bool | None = None) -> Tuple5:
    """Shared-std D8 LayerNorm statistics on the flat-E 5-tuple, as one
    Pallas kernel (interpret mode on CPU). Same values as
    `layer_norm_d8_stats`; analytic backward (same closed form as
    `_tuple_ln_custom_bwd`)."""
    return _ln_fwd(xs, eps, interpret)[0]


def _vjp_fwd(xs, eps, interpret):
    out, var = _ln_fwd(xs, eps, interpret)
    flat_out, _, _, _ = _flatten(out)
    return out, (flat_out, var)


def _vjp_bwd(eps, interpret, res, us):
    flat_out, var = res
    return (_ln_bwd(flat_out, var, us, interpret),)


ln_d8_flat_tuple.defvjp(_vjp_fwd, _vjp_bwd)
