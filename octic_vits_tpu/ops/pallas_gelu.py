"""Pallas TPU kernel: fused D8-equivariant GELU (forward + backward).

Computes, elementwise over tokens,  y = F( gelu( F^T x ) )  where F^T/F are
the isotypic<->regular butterflies (16 adds + 8 scales each way). One kernel
reads the five packed tuple arrays and writes the five outputs — no
intermediate regular-representation tensors ever hit HBM.

The backward pass uses the self-adjointness of the construction: with
S = isotypic->regular and R = S^{-1} = S^T,

    dx = R( gelu'(S x) * (S g) )

i.e. butterfly both the saved input and the cotangent, multiply by the GELU
derivative, butterfly back — the same structure as the reference Triton
kernel (reference: octic_vits/d8_gelu.py:92-331, incl. its E-slot handling
at :166-168 which our packed [M, 4C] E view reproduces by construction).

Residuals: only the INPUT tuple is saved (like the Triton autograd.Function,
reference: octic_vits/d8_gelu.py:456-467); XLA's default vjp of the eager
composite would also stash gelu's argument.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from octic_vits_tpu.d8.group import isotypic_to_regular, regular_to_isotypic

Array = jnp.ndarray
Tuple5 = Tuple[Array, Array, Array, Array, Array]

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7 — fp32-exact).

    Mosaic has no TPU lowering for lax.erf inside Pallas kernels, so the
    kernel carries its own rational approximation; the eager oracle keeps
    the exact erf and the kernel tests bound the difference."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _erf_cheap(x):
    """erf via Abramowitz-Stegun 7.1.27: NO transcendentals (the exp in
    7.1.26 dominates VPU time — fc1+GELU profiled at ~1 ms/block).
    Max abs error 5e-4 — far below bf16 output quantization (~4e-3), so
    this is the bf16-path approximation. Horner form: 4 fma + 3 mul +
    1 reciprocal + abs/sign fixup."""
    dt = x.dtype
    a1 = jnp.asarray(0.278393, dt)
    a2 = jnp.asarray(0.230389, dt)
    a3 = jnp.asarray(0.000972, dt)
    a4 = jnp.asarray(0.078108, dt)
    one = jnp.asarray(1.0, dt)
    ax = jnp.abs(x)
    d = one + ax * (a1 + ax * (a2 + ax * (a3 + ax * a4)))
    d2 = d * d
    y = one - one / (d2 * d2)
    if dt == jnp.bfloat16:
        # Mosaic has no bf16 vector compare; take the sign in f32
        return jnp.sign(x.astype(jnp.float32)).astype(dt) * y
    return jnp.sign(x) * y


def _gelu_exact(u, cheap: bool = False):
    e = _erf_cheap if cheap else _erf
    return 0.5 * u * (1.0 + e(u * _INV_SQRT2))


def _gelu_grad(u, cheap: bool = False):
    e = _erf_cheap if cheap else _erf
    cdf = 0.5 * (1.0 + e(u * _INV_SQRT2))
    pdf = _INV_SQRT2PI * jnp.exp(-0.5 * u * u)
    return cdf + u * pdf


def _split_e_flat(e_flat):
    """[TM, 4C] E view -> (E11, E12, E21, E22) each [TM, C].

    The packed E tensor is [B, N, 2, 2C] with row 0 = E11|E12, row 1 =
    E21|E22; flattening the last two axes gives exactly this slot order."""
    c = e_flat.shape[-1] // 4
    return e_flat[:, :c], e_flat[:, c:2 * c], e_flat[:, 2 * c:3 * c], e_flat[:, 3 * c:]


def _merge_e_flat(e11, e12, e21, e22):
    return jnp.concatenate((e11, e12, e21, e22), axis=-1)


def _fwd_kernel(a1, a2, b1, b2, ef, oa1, oa2, ob1, ob2, oef):
    dtype = a1.dtype
    cheap = dtype == jnp.bfloat16
    f32 = lambda x: x[...].astype(jnp.float32)
    e11, e12, e21, e22 = _split_e_flat(f32(ef))
    xs = (f32(a1), f32(a2), f32(b1), f32(b2), e11, e21, e12, e22)
    reg = isotypic_to_regular(xs)
    act = tuple(_gelu_exact(u, cheap) for u in reg)
    y = regular_to_isotypic(act)
    oa1[...] = y[0].astype(dtype)
    oa2[...] = y[1].astype(dtype)
    ob1[...] = y[2].astype(dtype)
    ob2[...] = y[3].astype(dtype)
    oef[...] = _merge_e_flat(y[4], y[6], y[5], y[7]).astype(dtype)


def _bwd_kernel(a1, a2, b1, b2, ef, g1, g2, g3, g4, gef,
                da1, da2, db1, db2, def_):
    dtype = a1.dtype
    f32 = lambda x: x[...].astype(jnp.float32)

    e11, e12, e21, e22 = _split_e_flat(f32(ef))
    xs = (f32(a1), f32(a2), f32(b1), f32(b2), e11, e21, e12, e22)
    u = isotypic_to_regular(xs)

    h11, h12, h21, h22 = _split_e_flat(f32(gef))
    gs = (f32(g1), f32(g2), f32(g3), f32(g4), h11, h21, h12, h22)
    v = isotypic_to_regular(gs)

    cheap = dtype == jnp.bfloat16
    prod = tuple(_gelu_grad(ui, cheap) * vi for ui, vi in zip(u, v))
    d = regular_to_isotypic(prod)
    da1[...] = d[0].astype(dtype)
    da2[...] = d[1].astype(dtype)
    db1[...] = d[2].astype(dtype)
    db2[...] = d[3].astype(dtype)
    def_[...] = _merge_e_flat(d[4], d[6], d[5], d[7]).astype(dtype)


def _flatten(xs: Tuple5):
    a1 = xs[0]
    lead = a1.shape[:-1]
    m = math.prod(lead)
    c = a1.shape[-1]
    flat = tuple(x.reshape(m, c) for x in xs[:4]) + (xs[4].reshape(m, 4 * c),)
    return flat, lead, m, c


def _unflatten(flat, lead, c, flat_e=False):
    e = (
        flat[4].reshape(*lead, 4 * c) if flat_e
        else flat[4].reshape(*lead, 2, 2 * c)
    )
    return tuple(x.reshape(*lead, c) for x in flat[:4]) + (e,)


def _row_tile(m: int, c: int, itemsize: int) -> int:
    """Rows per block: 16 arrays of [TM, C..4C] live in VMEM; stay << 16MB."""
    budget = 4 * 1024 * 1024  # bytes across all blocks
    per_row = 16 * c * itemsize  # 8 in + 8 out streams of width C (E counts 4C)
    tm = max(8, budget // max(per_row, 1))
    tm = min(tm, m, 1024)
    # round to sublane multiples
    return max(8, (tm // 8) * 8)


def _call_kernel(kernel, n_in: int, flat_args, m: int, c: int, interpret: bool):
    tm = _row_tile(m, c, flat_args[0].dtype.itemsize)
    grid = (pl.cdiv(m, tm),)

    def spec(width):
        return pl.BlockSpec((tm, width), lambda i: (i, 0), memory_space=pltpu.VMEM)

    widths = ([c] * 4 + [4 * c]) * (n_in // 5)
    in_specs = [spec(w) for w in widths]
    out_specs = tuple(spec(w) for w in [c] * 4 + [4 * c])
    dtype = flat_args[0].dtype
    out_shape = tuple(
        jax.ShapeDtypeStruct((m, w), dtype) for w in [c] * 4 + [4 * c]
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*flat_args)


def _auto_interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gelu_d8_pallas(xs: Tuple5, interpret: bool | None = None) -> Tuple5:
    """Fused octic GELU on the packed 5-tuple (TPU Pallas; interpret on CPU)."""
    return _fwd_impl(xs, interpret)


def _fwd_impl(xs, interpret):
    if interpret is None:
        interpret = _auto_interpret()
    flat, lead, m, c = _flatten(xs)
    out = _call_kernel(_fwd_kernel, 5, flat, m, c, interpret)
    flat_e = xs[4].ndim == xs[0].ndim  # flat-E container in == out
    return _unflatten(out, lead, c, flat_e)


def _bwd_rule(interpret, xs, g):
    if interpret is None:
        interpret = _auto_interpret()
    flat_x, lead, m, c = _flatten(xs)
    flat_g, _, _, _ = _flatten(g)
    out = _call_kernel(_bwd_kernel, 10, flat_x + flat_g, m, c, interpret)
    return (_unflatten(out, lead, c, xs[4].ndim == xs[0].ndim),)


# custom_vjp wiring: fwd gets the original arg order (minus nondiff args,
# which jax passes positionally to fwd too); bwd gets nondiff args first.
def _fwd_rule_vjp(xs, interpret):
    y = _fwd_impl(xs, interpret)
    return y, xs


gelu_d8_pallas.defvjp(_fwd_rule_vjp, _bwd_rule)
