"""D8-equivariant ViT layers (flax.linen).

All layers operate on the packed isotypic 5-tuple
``(A1, A2, B1, B2, E)`` with shapes ``[..., C/8]`` for the four 1-dim irreps
and ``[..., 2, C/4]`` for E (row 0 = E11|E12, row 1 = E21|E22) — the layout
documented at reference octic_vits/d8_layers.py:38-82.

TPU-first design notes:
* ``LinearD8`` evaluates the four 1-dim-irrep blocks as ONE batched
  ``dot_general`` (batch dim = irrep) instead of four separate GEMMs, plus a
  single E GEMM — two MXU launches per equivariant linear instead of five
  cuBLAS calls in the reference (octic_vits/d8_layers.py:104-127).
* ``PatchEmbedD8`` lowers the strided lifting convs to patch-extraction
  reshapes + one batched matmul (stride == kernel, so the conv IS a matmul);
  the symmetrized kernels are folded from quadrant parameters at trace time
  (reference: octic_vits/d8_layers.py:284-497).
* attention concatenates the per-head irrep slices and runs ONE full-width
  softmax attention (scores are invariant sums over irreps), exactly like
  the reference (octic_vits/d8_layers.py:590-660) but in BTNH layout for
  ``jax.nn.dot_product_attention``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from octic_vits_tpu.d8.group import SQRT2_OVER_4
from octic_vits_tpu.ops.gelu_d8 import gelu_d8

Array = jnp.ndarray
Tuple5 = Tuple[Array, Array, Array, Array, Array]

_ONE_DIM_IRREPS = ("A1", "A2", "B1", "B2")


def _trunc_normal(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class LinearD8(nn.Module):
    """Block-diagonal equivariant linear map (Schur's lemma).

    One weight per 1-dim irrep (C/8 -> F/8), a single 2x2-block weight for
    the two E copies (C/4 -> F/4), bias only on A1 (the only irrep containing
    the constants). Reference: octic_vits/d8_layers.py:104-130.
    """

    features: int
    use_bias: bool = True
    use_pallas: bool = False   # fused block-diagonal Pallas kernel
    fuse_gelu: bool = False    # fold the octic GELU into the kernel epilogue
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Callable = _trunc_normal(0.02)

    @nn.compact
    def __call__(self, xs: Tuple5, layerscale=None, residual=None) -> Tuple5:
        """`layerscale` = (alpha_1d [4,F/8], alpha_e [F/4]) and `residual`
        (output-shaped 5-tuple) fuse  y = residual + alpha * linear(x)
        — the block LayerScale + residual add — into the kernel epilogue."""
        a1, a2, b1, b2, e = xs
        c8 = a1.shape[-1]
        f8 = self.features // 8
        if self.features % 8:
            raise ValueError("features must be divisible by 8")
        # flat-E tuple (TPU packed path): E is ONE [..., 4*C/8] array
        # [row0|row1] — the Pallas kernels' native layout, and it keeps the
        # whole path free of [..., 2, C/4] tiled-layout relayouts.
        flat_e = e.ndim == a1.ndim

        w1 = self.param("kernel_1d", self.kernel_init, (4, c8, f8), self.param_dtype)
        we = self.param("kernel_e", self.kernel_init, (2 * c8, 2 * f8), self.param_dtype)
        dtype = self.dtype or a1.dtype

        if self.use_pallas:
            from octic_vits_tpu.ops.pallas_linear import linear_d8_tuple

            bias = (
                self.param("bias_a1", nn.initializers.zeros, (f8,), self.param_dtype)
                if self.use_bias
                else None
            )
            xs_c = tuple(x.astype(dtype) for x in xs)
            ls = None
            if layerscale is not None:
                ls = (
                    layerscale[0].astype(dtype),
                    layerscale[1].astype(dtype),
                )
                residual = tuple(r.astype(dtype) for r in residual)
            return linear_d8_tuple(
                xs_c, w1.astype(dtype), we.astype(dtype),
                None if bias is None else bias.astype(dtype),
                fuse_gelu=self.fuse_gelu,
                layerscale=ls,
                residual=residual,
                flat_e=flat_e,
            )

        w1 = w1.astype(dtype)
        we = we.astype(dtype)

        ones = jnp.stack((a1, a2, b1, b2), axis=0).astype(dtype)  # [4, ..., C/8]
        out1 = jax.lax.dot_general(
            ones, w1,
            dimension_numbers=(((ones.ndim - 1,), (1,)), ((0,), (0,))),
            preferred_element_type=dtype,
        )  # batched over the leading irrep axis -> [4, ..., F/8]
        # slice the leading axis (free) instead of transposing it inward —
        # the moveaxis variant cost ~0.5 ms/block in traces
        oa1, oa2, ob1, ob2 = (out1[i] for i in range(4))
        if self.use_bias:
            bias = self.param("bias_a1", nn.initializers.zeros, (f8,), self.param_dtype)
            oa1 = oa1 + bias.astype(dtype)
        if flat_e:
            ef = e.astype(dtype)
            oe = jnp.concatenate(
                (
                    jnp.dot(ef[..., : 2 * c8], we, preferred_element_type=dtype),
                    jnp.dot(ef[..., 2 * c8:], we, preferred_element_type=dtype),
                ),
                axis=-1,
            )
        else:
            oe = jnp.dot(e.astype(dtype), we, preferred_element_type=dtype)
        outs = (oa1, oa2, ob1, ob2, oe)
        if layerscale is not None:
            ls1, lse = layerscale
            lse = lse.astype(dtype)
            if flat_e:
                lse = jnp.concatenate((lse, lse))
            outs = tuple(
                r + ls1[g].astype(dtype) * o
                for g, (r, o) in enumerate(zip(residual[:4], outs[:4]))
            ) + (residual[4] + lse * outs[4],)
        return outs


def unpack_packed_5f(x):
    """Flat packed [..., C] container -> flat-E 5-tuple of lane-slice views
    (4 x [..., C/8] + E [..., C/2] = [row0|row1])."""
    c8 = x.shape[-1] // 8
    return tuple(
        x[..., g * c8:(g + 1) * c8] for g in range(4)
    ) + (x[..., 4 * c8:],)


class ScaleD8(nn.Module):
    """Per-irrep diagonal scaling (LayerScale); optionally an A1 bias
    (then it is the reference's AffineD8). Reference:
    octic_vits/d8_layers.py:132-158 (AffineD8), 189-212 (LayerScaleD8)."""

    init_value: float = 1.0
    use_bias: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Tuple5) -> Tuple5:
        a1, a2, b1, b2, e = xs
        c8 = a1.shape[-1]
        init = nn.initializers.constant(self.init_value)
        alpha = self.param("alpha_1d", init, (4, c8), self.param_dtype)
        alpha_e = self.param("alpha_e", init, (2 * c8,), self.param_dtype)
        dtype = a1.dtype
        alpha = alpha.astype(dtype)
        oa1 = alpha[0] * a1
        if self.use_bias:
            beta = self.param("beta_a1", nn.initializers.zeros, (c8,), self.param_dtype)
            oa1 = oa1 + beta.astype(dtype)
        ae = alpha_e.astype(dtype)
        if e.ndim == a1.ndim:  # flat-E container: rows share alpha_e
            ae = jnp.concatenate((ae, ae))
        return (
            oa1,
            alpha[1] * a2,
            alpha[2] * b1,
            alpha[3] * b2,
            ae * e,
        )


def layer_norm_d8_stats(xs: Tuple5, eps: float = 1e-5,
                        use_pallas: bool = False) -> Tuple5:
    """Equivariant layer norm statistics: per-irrep mean subtraction and a
    SHARED std across irreps,

        std = (sqrt2/4) * sqrt(var_A1 + var_A2 + var_B1 + var_B2
                               + mean_rows(var_E) + eps)

    exactly the reference formula (octic_vits/d8_layers.py:161-186), eps
    inside the sqrt, biased variances. `e` may be the flat-E container
    ([..., 4*C/8] = [row0|row1]); each row keeps its own mean/variance.

    On the flat-E layout the backward uses the analytic custom VJP when
    ``OCTIC_FLAT_LN_VJP=1`` (see :func:`_tuple_ln_custom`)."""
    a1, a2, b1, b2, e = xs
    flat_e = e.ndim == a1.ndim
    if flat_e and use_pallas and OCTIC_PALLAS_LN:
        from octic_vits_tpu.ops.pallas_ln import ln_d8_flat_tuple

        return ln_d8_flat_tuple(xs, eps)
    if flat_e and OCTIC_FLAT_LN_VJP:
        return _tuple_ln_custom(xs, eps)
    f32 = jnp.float32
    var = sum(jnp.var(x.astype(f32), axis=-1, keepdims=True) for x in (a1, a2, b1, b2))

    def center(x):
        return x - jnp.mean(x, axis=-1, keepdims=True)

    if flat_e:
        half = e.shape[-1] // 2
        e32 = e.astype(f32)
        m0 = jnp.mean(e32[..., :half], axis=-1, keepdims=True)
        m1 = jnp.mean(e32[..., half:], axis=-1, keepdims=True)
        v0 = jnp.var(e32[..., :half], axis=-1, keepdims=True)
        v1 = jnp.var(e32[..., half:], axis=-1, keepdims=True)
        var = var + 0.5 * (v0 + v1) + eps
        std = (SQRT2_OVER_4 * jnp.sqrt(var)).astype(a1.dtype)
        # per-row mean subtraction without a misaligned half-boundary
        # concat: one lane-indexed select between the two row means
        lane = jax.lax.broadcasted_iota(jnp.int32, (e.shape[-1],), 0)
        mean_e = jnp.where(lane < half, m0, m1).astype(a1.dtype)
        return (
            center(a1) / std,
            center(a2) / std,
            center(b1) / std,
            center(b2) / std,
            (e - mean_e) / std,
        )

    var_e = jnp.var(e.astype(f32), axis=-1, keepdims=True)  # [..., 2, 1]
    var = var + jnp.mean(var_e, axis=-2) + eps
    std = (SQRT2_OVER_4 * jnp.sqrt(var)).astype(a1.dtype)

    return (
        center(a1) / std,
        center(a2) / std,
        center(b1) / std,
        center(b2) / std,
        center(e) / std[..., None, :],
    )


def _flat_ln_seg(c8: int):
    """[C, 8] slot-indicator matrix: ``x @ seg`` sums lanes per slot."""
    return jnp.kron(jnp.eye(8, dtype=jnp.float32),
                    jnp.ones((c8, 1), jnp.float32))


def _flat_ln_remove_means(y32, seg, c8):
    """Subtract per-slot means with the E-row coupling (slots 4/5 share the
    E-row-0 mean, 6/7 the E-row-1 mean). This is the symmetric idempotent
    projector ``P = I - (1/c8) seg C seg^T`` used by both the forward pass
    and the analytic VJP (P^T = P)."""
    m8 = (y32 @ seg) / c8                               # [..., 8]
    me0 = 0.5 * (m8[..., 4] + m8[..., 5])   # E row 0 spans slots 4,5
    me1 = 0.5 * (m8[..., 6] + m8[..., 7])
    mean8 = jnp.stack(
        (m8[..., 0], m8[..., 1], m8[..., 2], m8[..., 3], me0, me0, me1, me1),
        axis=-1,
    )
    return y32 - mean8 @ seg.T


def _flat_ln_fwd_impl(x, eps: float):
    c8 = x.shape[-1] // 8
    x32 = x.astype(jnp.float32)
    seg = _flat_ln_seg(c8)
    xc = _flat_ln_remove_means(x32, seg, c8)
    # two-pass variance (center first, then reduce squares through the same
    # segment matmul): no E[x^2]-E[x]^2 cancellation for large-mean
    # activations, matching the tuple path's jnp.var numerics
    v8 = ((xc * xc) @ seg) / c8
    # E row variance = mean of its two slots' centered moments; var_e is the
    # mean over the two rows -> 1/4 of the four E-slot moments
    var = (jnp.sum(v8[..., :4], axis=-1)
           + 0.25 * jnp.sum(v8[..., 4:], axis=-1) + eps)
    inv_std = 1.0 / (SQRT2_OVER_4 * jnp.sqrt(var))      # [...]
    out = (xc * inv_std[..., None]).astype(x.dtype)
    return out, xc, var, inv_std


import functools as _functools
import os as _os

# Analytic VJP for the flat LN (OCTIC_FLAT_LN_VJP=0 to disable). Default ON
# since the round-4 TPU A/B: hybrid ViT-H/14 train step B=32 335.2 ms
# (autodiff bwd) -> 330.2 ms (analytic), grads parity-tested to the
# autodiff path (tests/test_layers_equivariance.py). The closed form needs
# only the centered activations + per-token var, so the backward is ~2
# fused full-width passes instead of autodiff's longer chain through both
# segment matmuls.
OCTIC_FLAT_LN_VJP = _os.environ.get("OCTIC_FLAT_LN_VJP", "1") == "1"

# Pallas LN kernel (ops/pallas_ln.py) on the flat-E tuple when the module
# was built with use_pallas (the TPU kernel configs). The kernel keeps the
# LN reduces OUT of XLA's layout assignment: the narrow (C/8-lane) reduces
# of the eager path make XLA transpose the whole octic residual stream to
# an N-in-lanes layout between every Pallas kernel boundary (~12 relayout
# copies/block in the ViT-H/14 optimized HLO). Measured NEUTRAL end to end
# (inference 499.1 vs 499.4 img/s, train 329.7 vs 330.2 ms at ViT-H/14 —
# the copies overlap with kernel compute on the async DMA engines; see
# BENCH.md "Pallas D8-LN kernel"), so default OFF; OCTIC_PALLAS_LN=1 turns
# it on for A/Bs.
OCTIC_PALLAS_LN = _os.environ.get("OCTIC_PALLAS_LN", "0") == "1"


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _flat_ln_custom(x, eps: float):
    return _flat_ln_fwd_impl(x, eps)[0]


def _flat_ln_custom_fwd(x, eps: float):
    out, xc, var, inv_std = _flat_ln_fwd_impl(x, eps)
    # residuals: xc saved in the stream dtype (bf16 rounding of the centered
    # activations perturbs the grad at ~1e-3 relative, below bf16 grad noise)
    # + two per-token scalars
    return out, (xc.astype(x.dtype), var, inv_std)


def _flat_ln_custom_bwd(eps: float, res, u):
    """dL/dx = P @ [ g * (u - (u.xc / var) * d ⊙ xc) ]  with
    g = inv_std (already includes the sqrt2/4 factor: out = xc * g, and
    d/dvar (1/(k sqrt(var))) = -g/(2 var) for ANY k), P the symmetric
    mean-removal projector, and d the per-lane variance weights
    (1/c8 on A1/A2/B1/B2 lanes, 0.25/c8 on E lanes)."""
    xc_lo, var, inv_std = res
    in_dtype = xc_lo.dtype  # xc is saved in the input stream dtype
    c = xc_lo.shape[-1]
    c8 = c // 8
    f32 = jnp.float32
    xc = xc_lo.astype(f32)
    u32 = u.astype(f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (c,), 0)
    d = jnp.where(lane < 4 * c8, 1.0 / c8, 0.25 / c8)   # [C]
    udotxc = jnp.sum(u32 * xc, axis=-1)                 # [...]
    coef = (udotxc / var)[..., None]
    dxc = inv_std[..., None] * (u32 - coef * (d * xc))
    seg = _flat_ln_seg(c8)
    dx = _flat_ln_remove_means(dxc, seg, c8)
    return (dx.astype(in_dtype),)


_flat_ln_custom.defvjp(_flat_ln_custom_fwd, _flat_ln_custom_bwd)


def _tuple_ln_fwd_impl(xs: Tuple5, eps: float):
    """The flat-E branch of :func:`layer_norm_d8_stats`, op-for-op (bitwise
    value parity with the autodiff path), returning the residuals the
    analytic backward needs."""
    a1, a2, b1, b2, e = xs
    f32 = jnp.float32
    var = sum(
        jnp.var(x.astype(f32), axis=-1, keepdims=True) for x in (a1, a2, b1, b2)
    )
    half = e.shape[-1] // 2
    e32 = e.astype(f32)
    m0 = jnp.mean(e32[..., :half], axis=-1, keepdims=True)
    m1 = jnp.mean(e32[..., half:], axis=-1, keepdims=True)
    v0 = jnp.var(e32[..., :half], axis=-1, keepdims=True)
    v1 = jnp.var(e32[..., half:], axis=-1, keepdims=True)
    var = var + 0.5 * (v0 + v1) + eps
    std = (SQRT2_OVER_4 * jnp.sqrt(var)).astype(a1.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (e.shape[-1],), 0)
    mean_e = jnp.where(lane < half, m0, m1).astype(a1.dtype)

    def center(x):
        return x - jnp.mean(x, axis=-1, keepdims=True)

    out = (
        center(a1) / std,
        center(a2) / std,
        center(b1) / std,
        center(b2) / std,
        (e - mean_e) / std,
    )
    return out, var


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _tuple_ln_custom(xs: Tuple5, eps: float) -> Tuple5:
    return _tuple_ln_fwd_impl(xs, eps)[0]


def _tuple_ln_custom_fwd(xs: Tuple5, eps: float):
    out, var = _tuple_ln_fwd_impl(xs, eps)
    # out IS xc * g — save it (stream dtype) + the per-token var instead of
    # a separate centered copy; bwd recovers d.xc terms via out directly:
    #   dxc = g*u - (u.out) * g * d ⊙ out   (since xc = out/g and the
    #   (u.xc/var)*d*xc term = (u.out)*(g)*(d*out)*... see bwd)
    return out, (out, var)


def _tuple_ln_custom_bwd(eps: float, res, us):
    """Analytic backward of the shared-std D8 LayerNorm on the flat-E tuple.

    With out = xc * g, g = 1/(k sqrt(var)), var = sum_j d_j xc_j^2 + eps
    (d = 1/c8 on A1/A2/B1/B2 lanes, 0.25/c8 on E lanes; biased variances):

        dxc = g * (u - (u.xc / var) * d ⊙ xc)
            = g * u - g * (u.out / var) * d ⊙ out * (1/g) * xc ... expressed
              purely in `out`:  u.xc = (u.out)/g * g = (u.out) * (1/g) * g;
              using xc = out/g:  (u.xc/var) * d ⊙ xc = (u.out/var) * d ⊙ out / g^2
              and 1/g^2 = k^2 var, so dxc = g*u - g*k^2*(u.out) * d ⊙ out.
        dx  = P dxc  (P = per-segment mean removal; symmetric, idempotent).
    """
    out, var = res
    a1c, a2c, b1c, b2c, ec = out
    u1, u2, u3, u4, ue = us
    f32 = jnp.float32
    c8 = a1c.shape[-1]
    k2 = SQRT2_OVER_4 * SQRT2_OVER_4
    g = 1.0 / (SQRT2_OVER_4 * jnp.sqrt(var))            # [..., 1] f32

    udotout = sum(
        jnp.sum(u.astype(f32) * o.astype(f32), axis=-1, keepdims=True)
        for u, o in zip(us, out)
    )
    coef = g * k2 * udotout                             # [..., 1]

    def bwd_part(u, o, w):
        dxc = g * u.astype(f32) - coef * (w / c8) * o.astype(f32)
        return dxc - jnp.mean(dxc, axis=-1, keepdims=True)

    da1 = bwd_part(u1, a1c, 1.0)
    da2 = bwd_part(u2, a2c, 1.0)
    db1 = bwd_part(u3, b1c, 1.0)
    db2 = bwd_part(u4, b2c, 1.0)

    half = ec.shape[-1] // 2
    dec = g * ue.astype(f32) - coef * (0.25 / c8) * ec.astype(f32)
    me0 = jnp.mean(dec[..., :half], axis=-1, keepdims=True)
    me1 = jnp.mean(dec[..., half:], axis=-1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ec.shape[-1],), 0)
    dec = dec - jnp.where(lane < half, me0, me1)

    dt = a1c.dtype
    return (
        (da1.astype(dt), da2.astype(dt), db1.astype(dt), db2.astype(dt),
         dec.astype(ec.dtype)),
    )


_tuple_ln_custom.defvjp(_tuple_ln_custom_fwd, _tuple_ln_custom_bwd)


def layer_norm_d8_stats_flat(x, eps: float = 1e-5):
    """:func:`layer_norm_d8_stats` on the flat packed container
    (d8/group.py:pack_5_to_flat layout). Per-slot reductions run as one
    [C, 8] segment matmul (MXU; no lane-split reshapes — a [.., 8, C/8]
    reshape relayouts the whole stream and measured ~4x slower), and the
    per-slot means broadcast back through the transposed segment matrix.
    Same formula: per-irrep means, shared sqrt2/4-scaled std, eps in sqrt.

    Training uses the analytic custom VJP above (OCTIC_FLAT_LN_VJP=0 for
    the plain autodiff backward)."""
    if OCTIC_FLAT_LN_VJP:
        return _flat_ln_custom(x, eps)
    return _flat_ln_fwd_impl(x, eps)[0]


class LayerNormD8(nn.Module):
    """Equivariant LayerNorm = shared-std normalization + AffineD8.
    Reference: octic_vits/d8_layers.py:161-186."""

    eps: float = 1e-5
    elementwise_affine: bool = True
    use_bias: bool = True
    use_pallas: bool = False  # flat-E tuple: fused Pallas stats kernel
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Tuple5) -> Tuple5:
        flat_e = (
            isinstance(xs, (tuple, list)) and xs[4].ndim == xs[0].ndim
        )
        if (
            self.use_pallas and OCTIC_PALLAS_LN and flat_e
            and self.elementwise_affine
        ):
            # fused LN+affine kernel: the affine rides the kernel's stores
            # instead of a standalone full-width pass. Params stay owned by
            # the ScaleD8 child (materialized via a dummy call, read back),
            # so the tree is byte-identical to the unfused path.
            from octic_vits_tpu.ops.pallas_ln import ln_affine_d8_flat_tuple

            c8 = xs[0].shape[-1]
            dt = xs[0].dtype
            dummy = tuple(jnp.zeros((1, 1, c8), dt) for _ in range(4)) + (
                jnp.zeros((1, 1, 4 * c8), dt),
            )
            ScaleD8(
                init_value=1.0,
                use_bias=self.use_bias,
                param_dtype=self.param_dtype,
                name="affine",
            )(dummy)
            p = self.get_variable("params", "affine")
            al = p["alpha_1d"]
            ae = jnp.concatenate((p["alpha_e"], p["alpha_e"]))[None, :]
            be = (
                p["beta_a1"][None, :] if self.use_bias
                else jnp.zeros((1, c8), al.dtype)
            )
            return ln_affine_d8_flat_tuple(xs, al, ae, be, self.eps)
        xs = layer_norm_d8_stats(xs, self.eps, use_pallas=self.use_pallas)
        if self.elementwise_affine:
            xs = ScaleD8(
                init_value=1.0,
                use_bias=self.use_bias,
                param_dtype=self.param_dtype,
                name="affine",
            )(xs)
        return xs


class DropoutD8(nn.Module):
    """Independent dropout on each tuple element (matches the reference's
    train-time behavior; octic_vits/d8_layers.py:84-96)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, xs: Tuple5, deterministic: bool = True) -> Tuple5:
        if self.rate == 0.0 or deterministic:
            return xs
        drop = nn.Dropout(rate=self.rate, deterministic=False)
        return tuple(drop(x) for x in xs)


def drop_path_d8(xs: Tuple5, rate: float, rng, scale_by_keep: bool = True) -> Tuple5:
    """Stochastic depth with ONE shared per-sample mask across all 5 tuple
    elements (reference: octic_vits/d8_layers.py:249-271)."""
    keep = 1.0 - rate
    shape = (xs[0].shape[0],) + (1,) * (xs[0].ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(xs[0].dtype)
    if keep > 0.0 and scale_by_keep:
        mask = mask / keep
    mask_e = mask if xs[4].ndim == xs[0].ndim else mask[..., None]
    return (
        xs[0] * mask,
        xs[1] * mask,
        xs[2] * mask,
        xs[3] * mask,
        xs[4] * mask_e,
    )


class DropPathD8(nn.Module):
    rate: float = 0.0
    scale_by_keep: bool = True

    @nn.compact
    def __call__(self, xs: Tuple5, deterministic: bool = True) -> Tuple5:
        if self.rate == 0.0 or deterministic:
            return xs
        return drop_path_d8(xs, self.rate, self.make_rng("dropout"), self.scale_by_keep)


class GeluD8(nn.Module):
    """Octic GELU module; set ``use_pallas`` to run the fused TPU kernel."""

    use_pallas: bool = False

    def __call__(self, xs: Tuple5) -> Tuple5:
        return gelu_d8(xs, use_pallas=self.use_pallas)


class _LinearD8Params(nn.Module):
    """Parameter-only twin of :class:`LinearD8` (identical names, shapes and
    initializers) for fused multi-layer kernels that consume raw weights —
    the parameter tree stays byte-identical to the unfused path."""

    features: int
    in_features: int
    use_bias: bool = True
    param_dtype: Any = jnp.float32
    kernel_init: Callable = _trunc_normal(0.02)

    @nn.compact
    def __call__(self):
        c8 = self.in_features // 8
        f8 = self.features // 8
        w1 = self.param("kernel_1d", self.kernel_init, (4, c8, f8),
                        self.param_dtype)
        we = self.param("kernel_e", self.kernel_init, (2 * c8, 2 * f8),
                        self.param_dtype)
        bias = (
            self.param("bias_a1", nn.initializers.zeros, (f8,),
                       self.param_dtype)
            if self.use_bias
            else None
        )
        return w1, we, bias


class MlpD8(nn.Module):
    """fc1 -> octic gelu -> dropout -> (norm) -> fc2 -> dropout.
    Reference: octic_vits/d8_layers.py:215-247."""

    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    use_bias: bool = True
    drop: float = 0.0
    use_pallas_gelu: bool = False
    use_pallas_linear: bool = False  # fused matmul(+GELU epilogue) kernels
    # single-kernel fc1+GELU+fc2 (hidden never leaves VMEM); falls back to
    # the two-kernel path when dropout or a fused epilogue is requested
    fuse_mlp: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Tuple5, deterministic: bool = True,
                 layerscale=None, residual=None) -> Tuple5:
        # flat packed [..., C] input (packed trunk carry): fused kernel
        # consumes and produces the packed container directly; any other
        # configuration falls back to the flat-E tuple view.
        packed = not isinstance(xs, (tuple, list))
        fusable = (
            self.fuse_mlp
            and self.use_pallas_linear
            and layerscale is None
            and (self.drop == 0.0 or deterministic)
        )
        if packed and not fusable:
            xs = unpack_packed_5f(xs)
            packed = False
        in_features = xs.shape[-1] if packed else xs[0].shape[-1] * 8
        hidden = self.hidden_features or in_features
        out = self.out_features or in_features
        if fusable:
            from octic_vits_tpu.ops.pallas_linear import (
                mlp_d8_packed,
                mlp_d8_tuple,
            )

            w1a, wea, b1 = _LinearD8Params(
                hidden, in_features, use_bias=self.use_bias,
                param_dtype=self.param_dtype, name="fc1",
            )()
            w1b, web, b2 = _LinearD8Params(
                out, hidden, use_bias=self.use_bias,
                param_dtype=self.param_dtype, name="fc2",
            )()
            dtype = self.dtype or (xs.dtype if packed else xs[0].dtype)
            cast = lambda t: None if t is None else t.astype(dtype)
            if packed:
                return mlp_d8_packed(
                    xs.astype(dtype),
                    cast(w1a), cast(wea), cast(b1), cast(w1b), cast(web),
                    cast(b2),
                )
            flat_e = xs[4].ndim == xs[0].ndim
            return mlp_d8_tuple(
                tuple(x.astype(dtype) for x in xs),
                cast(w1a), cast(wea), cast(b1), cast(w1b), cast(web),
                cast(b2), flat_e=flat_e,
            )
        common = dict(
            dtype=self.dtype, param_dtype=self.param_dtype,
            use_pallas=self.use_pallas_linear,
        )
        xs = LinearD8(
            hidden, use_bias=self.use_bias, name="fc1",
            fuse_gelu=self.use_pallas_linear, **common,
        )(xs)
        if not self.use_pallas_linear:
            xs = GeluD8(use_pallas=self.use_pallas_gelu)(xs)
        xs = DropoutD8(self.drop)(xs, deterministic)
        xs = LinearD8(out, use_bias=self.use_bias, name="fc2", **common)(
            xs, layerscale=layerscale, residual=residual
        )
        xs = DropoutD8(self.drop)(xs, deterministic)
        return xs


# ---------------------------------------------------------------------------
# Lifting patch embed
# ---------------------------------------------------------------------------


def _expand_lift_kernel(w: Array, irrep: str) -> Array:
    """Fold a quadrant kernel ``[kh/2, kw/2, I, O]`` out to the full
    symmetrized ``[kh, kw, I, O]`` kernel for one irrep.

    The reference stores the quadrant and (anti-)symmetrizes with rot90/flip
    at every forward (octic_vits/d8_layers.py:329-373); under jit this folds
    into the weight constant. Spatial axes here are leading (HWIO-style).
    """
    if irrep == "E":
        half = 0.5 * w
        col = jnp.concatenate([half, jnp.flip(half, axis=0)], axis=0)
        return jnp.concatenate([col, -jnp.flip(col, axis=1)], axis=1)
    q = SQRT2_OVER_4 * w
    rot = lambda k: jnp.rot90(q, k=k, axes=(0, 1))
    sign = -1.0 if irrep in ("B1", "B2") else 1.0
    left = jnp.concatenate([q, sign * rot(1)], axis=0)
    right = jnp.concatenate([sign * rot(3), rot(2)], axis=0)
    full = jnp.concatenate([left, right], axis=1)
    flipped = jnp.flip(full, axis=1)
    return full + flipped if irrep in ("A1", "B1") else full - flipped


def _patchify(x: Array, patch: int) -> Array:
    """NHWC image -> [B, gh, gw, p*p*C] patches (row-major (pi, pj, c))."""
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh, gw, patch * patch * c)


class PatchEmbedD8(nn.Module):
    """Lifting patch embed: 6 symmetrized stride-p convs (A1 with bias, A2,
    B1, B2, E-left, E-right; the E kernels are applied twice — once rotated)
    producing the isotypic 8-tuple, packed to the 5-tuple.

    Lowered to ONE matmul: all symmetrized kernels are concatenated along the
    output-channel axis and applied to extracted patches (stride == kernel).
    Reference: octic_vits/d8_layers.py:284-497.
    """

    patch_size: int = 16
    embed_dim: int = 768
    use_bias: bool = True
    use_norm: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple5:
        if self.embed_dim % 8:
            raise ValueError("embed_dim must be divisible by 8")
        p = self.patch_size
        if p % 2:
            raise NotImplementedError("odd patch sizes not supported (matches reference)")
        b, h, w, c_in = x.shape
        assert h % (2 * p) == 0 and w % (2 * p) == 0, (
            f"image ({h}x{w}) must be an even multiple of patch size {p}"
        )
        outs = self.embed_dim // 8

        def quadrant_init(key, shape, dtype):
            # kaiming_uniform(a=sqrt(5)) on the quadrant == U(-1/sqrt(fan), 1/sqrt(fan))
            fan_in = shape[0] * shape[1] * shape[2]
            bound = 1.0 / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        quad = (p // 2, p // 2, c_in, outs)
        kernels = []
        for irrep in ("A1", "A2", "B1", "B2"):
            wq = self.param(f"w_{irrep.lower()}", quadrant_init, quad, self.param_dtype)
            kernels.append(_expand_lift_kernel(wq, irrep))
        for side in ("e_left", "e_right"):
            wq = self.param(f"w_{side}", quadrant_init, quad, self.param_dtype)
            ke = _expand_lift_kernel(wq, "E")
            kernels.append(ke)
            kernels.append(jnp.rot90(ke, k=1, axes=(0, 1)))
        # isotypic slot order: A1 A2 B1 B2 E11 E21 E12 E22
        kernel = jnp.concatenate(kernels, axis=-1)  # [p, p, C_in, 8*outs]
        mat = kernel.reshape(p * p * c_in, 8 * outs)

        dtype = self.dtype or x.dtype
        patches = _patchify(x, p).astype(dtype)
        feats = jnp.dot(patches, mat.astype(dtype), preferred_element_type=dtype)
        feats = feats.reshape(b, (h // p) * (w // p), 8, outs)

        if self.use_bias:
            bias = self.param(
                "bias_a1",
                lambda key, shape, dt: jax.random.uniform(
                    key, shape, dt,
                    -1.0 / math.sqrt(quad[0] * quad[1] * c_in),
                    1.0 / math.sqrt(quad[0] * quad[1] * c_in),
                ),
                (outs,),
                self.param_dtype,
            )
            feats = feats.at[..., 0, :].add(bias.astype(dtype))

        xs = tuple(feats[..., i, :] for i in range(4)) + (
            jnp.concatenate(
                (feats[..., 4:6, :].reshape(b, -1, 2, outs),
                 feats[..., 6:8, :].reshape(b, -1, 2, outs)),
                axis=-1,
            ),
        )
        if self.use_norm:
            xs = LayerNormD8(param_dtype=self.param_dtype, name="norm")(xs)
        return xs


class IsotypicToPatchD8(nn.Module):
    """Inverse lift: 5-tuple tokens -> image patches, for MAE-style decoders
    (reference: octic_vits/d8_layers.py:499-588)."""

    patch_side: int
    out_channels: int = 3
    use_bias: bool = True
    reshape_to_image: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Tuple5) -> Array:
        if self.patch_side % 2:
            raise NotImplementedError("odd patch side not implemented (matches reference)")
        from octic_vits_tpu.d8.group import SQRT2, unpack_5_to_8

        b, l, _ = xs[0].shape
        ps = self.patch_side
        dim = xs[0].shape[-1] * 8
        lin = LinearD8(
            2 * ps * ps * self.out_channels,
            use_bias=self.use_bias,
            param_dtype=self.param_dtype,
            name="lin8",
        )
        parts = unpack_5_to_8(lin(xs))
        parts = tuple(
            0.25 * t.reshape(b, l, ps // 2, ps // 2, self.out_channels)
            for t in parts
        )
        rot = lambda x, k: jnp.rot90(x, k=k, axes=(2, 3))
        flip3 = lambda x: jnp.flip(x, axis=3)

        def four_fold(x, rot_sign):
            top = jnp.concatenate((x, rot_sign * rot(x, 1)), axis=2)
            bot = jnp.concatenate((rot_sign * rot(x, 3), rot(x, 2)), axis=2)
            return jnp.concatenate((top, bot), axis=3)

        fa1 = four_fold(parts[0], 1.0)
        out = fa1 + flip3(fa1)
        fa2 = four_fold(parts[1], 1.0)
        out = out + (fa2 - flip3(fa2))
        fb1 = four_fold(parts[2], -1.0)
        out = out + (fb1 + flip3(fb1))
        fb2 = four_fold(parts[3], -1.0)
        out = out + (fb2 - flip3(fb2))

        # E folds as cat([x, flip2(x)], 2) then cat([., -flip3(.)], 3)
        def e_fold_ref(x):
            col = jnp.concatenate((x, jnp.flip(x, axis=2)), axis=2)
            return jnp.concatenate((col, -flip3(col)), axis=3)

        e1 = SQRT2 * parts[4]
        out = out + e_fold_ref(e1)
        e2 = SQRT2 * parts[5]
        out = out + rot(e_fold_ref(e2), 1)

        if self.reshape_to_image:
            hg = wg = int(math.isqrt(l))
            out = out.reshape(b, hg, wg, ps, ps, self.out_channels)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, hg * ps, wg * ps, self.out_channels
            )
        else:
            out = out.reshape(b, l, ps * ps * self.out_channels)
        return out


class AttentionD8(nn.Module):
    """Equivariant multi-head attention: equivariant qkv/proj projections,
    ONE full-width softmax attention over per-head irrep-concatenated
    channels (scores are invariant). Reference: octic_vits/d8_layers.py:590-660."""

    num_heads: int = 8
    qkv_bias: bool = True
    proj_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas_attention: bool = False  # fused per-(b,h) VMEM attention
    # wide-1d qkv: evaluate the four 1-dim irrep qkv blocks as ONE
    # column-permuted block-diagonal matmul whose output interleaves
    # (head, irrep) — the attention kernel then loads the 1d part of each
    # head as a single 4*d1-wide slice instead of four d1-wide ones
    # (the measured ~0.6 ms/block assembly tax). Parameter tree unchanged.
    use_wide_qkv: bool = False
    # run the qkv LinearD8 INSIDE the attention kernel (weights are VMEM-
    # resident; the [B,N,3C] qkv never touches HBM). Requires the flat-E
    # container and use_pallas_attention; parameter tree unchanged.
    fuse_qkv: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Tuple5, deterministic: bool = True,
                 layerscale=None, residual=None) -> Tuple5:
        # flat packed [B, N, C] input (packed trunk carry): consumed
        # directly by the packed fused qkv+attention kernel; any other
        # configuration falls back to the flat-E tuple view.
        packed = not isinstance(xs, (tuple, list))
        if packed:
            fq_ok = (
                self.fuse_qkv
                and self.use_pallas_attention
                and not self.use_wide_qkv
                and not (self.attn_drop > 0.0 and not deterministic)
            )
            if not fq_ok:
                xs = unpack_packed_5f(xs)
                packed = False
        if packed:
            b, n, c = xs.shape
            c8 = c // 8
        else:
            b, n, c8 = xs[0].shape
            c = 8 * c8
        h = self.num_heads
        if (c // h) % 8:
            raise ValueError("head dim must be divisible by 8")
        d1 = c // (8 * h)   # per-head slice of each 1-dim irrep
        de = c // (4 * h)   # per-head slice of each E row

        # XLA's batched dot_general already runs the qkv/proj LinearD8 at
        # ~MXU peak here (profiled); the fused Pallas kernel only pays in
        # the MLP where the GELU epilogue folds in.
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # flat-E tuple or flat packed array (TPU packed paths)
        flat_e = packed or xs[4].ndim == xs[0].ndim
        qkv_mod = LinearD8(3 * c, use_bias=self.qkv_bias, name="qkv", **common)

        wide = (
            self.use_wide_qkv
            and self.use_pallas_attention
            and not (self.attn_drop > 0.0 and not deterministic)
        )
        if wide:
            import numpy as onp

            from octic_vits_tpu.ops.pallas_attention import (
                octic_attention_wide1d,
            )

            dt = self.dtype or xs[0].dtype
            d1 = c8 // h
            # materialize the qkv params with a dummy call (dead compute,
            # DCE'd) so the tree matches the non-wide path exactly
            dummy = tuple(
                jnp.zeros((1, 1, c8), xs[0].dtype) for _ in range(4)
            ) + (jnp.zeros((1, 1, 2, 2 * c8), xs[0].dtype),)
            qkv_mod(dummy)
            p = self.get_variable("params", "qkv")
            w1 = p["kernel_1d"].astype(dt)   # [4, c8, 3c8], cols (s, h, d)
            we = p["kernel_e"].astype(dt)    # [2c8, 6c8]
            # block-diagonal 1d weight with a STATIC column permutation to
            # the wide (s, head, irrep, d1) order — pure index relabeling,
            # math identical to the four per-irrep matmuls
            bd = jax.scipy.linalg.block_diag(w1[0], w1[1], w1[2], w1[3])
            src = onp.empty((12 * c8,), onp.int32)
            for s in range(3):
                for hh in range(h):
                    for g in range(4):
                        base = ((s * h + hh) * 4 + g) * d1
                        for d in range(d1):
                            src[base + d] = g * 3 * c8 + s * c8 + hh * d1 + d
            w_wide = jnp.take(bd, jnp.asarray(src), axis=1)
            xcat = jnp.concatenate([x.astype(dt) for x in xs[:4]], axis=-1)
            y = jnp.dot(xcat, w_wide, preferred_element_type=dt)
            if self.qkv_bias:
                bias = p["bias_a1"].astype(dt)       # [3c8], (s, h, d)
                g0 = onp.array(
                    [((s * h + hh) * 4) * d1 + d
                     for s in range(3) for hh in range(h) for d in range(d1)],
                    onp.int32,
                )
                bvec = jnp.zeros((12 * c8,), dt).at[jnp.asarray(g0)].set(bias)
                y = y + bvec
            q1d = y[..., : 4 * c8]
            k1d = y[..., 4 * c8: 8 * c8]
            v1d = y[..., 8 * c8:]
            # E exactly as the non-wide path: one batched dot, slice the
            # OUTPUT rows (two separate input-row dots measured slower)
            if flat_e:
                ef = xs[4].astype(dt)
                qe0 = jnp.dot(ef[..., : 2 * c8], we, preferred_element_type=dt)
                qe1 = jnp.dot(ef[..., 2 * c8:], we, preferred_element_type=dt)
            else:
                oe_full = jnp.dot(
                    xs[4].astype(dt), we, preferred_element_type=dt
                )
                qe0 = oe_full[:, :, 0]
                qe1 = oe_full[:, :, 1]
            o1, o2, o3, o4, oe0, oe1 = octic_attention_wide1d(
                q1d, k1d, v1d, qe0, qe1, h
            )
            o1, o2, o3, o4, oe0, oe1 = (
                _checkpoint_name(t, "attn_out")
                for t in (o1, o2, o3, o4, oe0, oe1)
            )
            if flat_e:
                oe = jnp.concatenate((oe0, oe1), axis=-1)
            else:
                oe = jnp.stack((oe0, oe1), axis=2)
            ys = LinearD8(
                c, use_bias=self.proj_bias,
                use_pallas=layerscale is not None, name="proj", **common,
            )(
                (o1, o2, o3, o4, oe),
                layerscale=layerscale, residual=residual,
            )
            return DropoutD8(self.proj_drop)(ys, deterministic)

        if (
            self.fuse_qkv
            and self.use_pallas_attention
            and flat_e
            and not (self.attn_drop > 0.0 and not deterministic)
        ):
            from octic_vits_tpu.ops.pallas_attention import (
                octic_attention_fused_qkv,
                octic_attention_fused_qkv_packed,
            )

            dt = self.dtype or (xs.dtype if packed else xs[0].dtype)
            # materialize the qkv params with a dummy call (dead compute,
            # DCE'd) so the tree matches the non-fused path exactly
            dummy = tuple(
                jnp.zeros((1, 1, c8), jnp.float32) for _ in range(4)
            ) + (jnp.zeros((1, 1, 2, 2 * c8), jnp.float32),)
            qkv_mod(dummy)
            p = self.get_variable("params", "qkv")
            if packed:
                # tag the packed input as a remat-saved residual: it is the
                # custom_vjp residual set (21 MB/block), so saving it makes
                # both the norm1 recompute AND the fwd kernel call dead in
                # the bwd replay
                o1, o2, o3, o4, oe0, oe1 = octic_attention_fused_qkv_packed(
                    _checkpoint_name(xs.astype(dt), "attn_in"),
                    p["kernel_1d"].astype(dt), p["kernel_e"].astype(dt),
                    p["bias_a1"].astype(dt) if self.qkv_bias else None,
                    h,
                )
            else:
                o1, o2, o3, o4, oe0, oe1 = octic_attention_fused_qkv(
                    xs[0].astype(dt), xs[1].astype(dt), xs[2].astype(dt),
                    xs[3].astype(dt), xs[4].astype(dt),
                    p["kernel_1d"].astype(dt), p["kernel_e"].astype(dt),
                    p["bias_a1"].astype(dt) if self.qkv_bias else None,
                    h,
                )
            o1, o2, o3, o4, oe0, oe1 = (
                _checkpoint_name(t, "attn_out")
                for t in (o1, o2, o3, o4, oe0, oe1)
            )
            oe = jnp.concatenate((oe0, oe1), axis=-1)
            ys = LinearD8(
                c, use_bias=self.proj_bias,
                use_pallas=layerscale is not None, name="proj", **common,
            )(
                (o1, o2, o3, o4, oe),
                layerscale=layerscale, residual=residual,
            )
            return DropoutD8(self.proj_drop)(ys, deterministic)

        qkvs = qkv_mod(xs)

        if self.use_pallas_attention and not (
            self.attn_drop > 0.0 and not deterministic
        ):
            from octic_vits_tpu.ops.pallas_attention import octic_attention

            # the kernel takes the E rows as separate arrays: flattening
            # [B,N,2,*] costs a tiled-layout relayout (~0.67 ms/block).
            # flat-E qkv is already [row0|row1] — two plain lane slices.
            if flat_e:
                half = qkvs[4].shape[-1] // 2
                e0 = qkvs[4][..., :half]
                e1 = qkvs[4][..., half:]
            else:
                e0 = qkvs[4][:, :, 0]
                e1 = qkvs[4][:, :, 1]
            # tag the kernel INPUTS as remat-saved too: they are the
            # custom_vjp residuals, so saving them makes the fwd kernel
            # call dead in the bwd replay (otherwise remat re-runs the
            # octic attention kernel, ~0.65 ms/block, just for residuals)
            ins = tuple(
                _checkpoint_name(t, "attn_in")
                for t in (qkvs[0], qkvs[1], qkvs[2], qkvs[3], e0, e1)
            )
            o1, o2, o3, o4, oe0, oe1 = octic_attention(*ins, h)
            # saved under the selective remat policy (scan_blocks.py)
            o1, o2, o3, o4, oe0, oe1 = (
                _checkpoint_name(t, "attn_out")
                for t in (o1, o2, o3, o4, oe0, oe1)
            )
            if flat_e:
                oe = jnp.concatenate((oe0, oe1), axis=-1)
            else:
                oe = jnp.stack((oe0, oe1), axis=2)
            ys = LinearD8(
                c, use_bias=self.proj_bias,
                use_pallas=layerscale is not None, name="proj", **common,
            )(
                (o1, o2, o3, o4, oe),
                layerscale=layerscale, residual=residual,
            )
            return DropoutD8(self.proj_drop)(ys, deterministic)

        # TPU-native attention: NEVER build the per-head interleaved
        # [B,N,H,dh] layout (a 20-float-granularity shuffle). Scores are the
        # sum of per-irrep-group contributions, so contract (irrep, chan)
        # directly with the head as a batch axis; outputs land in native
        # tuple layout. Head channel assignment — and hence the math — is
        # IDENTICAL to the reference interleave
        # (reference: octic_vits/d8_layers.py:623-656).
        ones_qkv = jnp.stack(
            [t.reshape(b, n, 3, h, d1) for t in qkvs[:4]], axis=3
        )  # [B,N,3,4,H,d1]
        qkv_e = (
            qkvs[4].reshape(b, n, 2, 3 * c // 4) if flat_e else qkvs[4]
        )
        e_qkv = qkv_e.reshape(b, n, 2, 3, h, de)  # [B,N,2(row),3,H,de]

        q1, k1, v1 = (ones_qkv[:, :, i] for i in range(3))  # [B,N,4,H,d1]
        qe, ke, ve = (e_qkv[:, :, :, i] for i in range(3))  # [B,N,2,H,de]

        scale = (c // h) ** -0.5
        f32 = jnp.float32
        logits = jax.lax.dot_general(
            q1, k1,
            dimension_numbers=(((2, 4), (2, 4)), ((0, 3), (0, 3))),
            preferred_element_type=f32,
        )  # batch (b,h), contract (irrep, d1) -> [B,H,Nq,Nk]
        logits = logits + jax.lax.dot_general(
            qe, ke,
            dimension_numbers=(((2, 4), (2, 4)), ((0, 3), (0, 3))),
            preferred_element_type=f32,
        )
        logits = logits * scale
        probs = jax.nn.softmax(logits, axis=-1)
        if self.attn_drop > 0.0 and not deterministic:
            probs = nn.Dropout(rate=self.attn_drop, deterministic=False)(probs)
        probs = probs.astype(v1.dtype)

        # out1[b,q,g,h,d] = sum_k probs[b,h,q,k] v1[b,k,g,h,d]
        out1 = jnp.einsum("bhqk,bkghd->bqghd", probs, v1)
        oute = jnp.einsum("bhqk,bkrhd->bqrhd", probs, ve)
        outs1 = tuple(
            out1[:, :, g].reshape(b, n, c8) for g in range(4)
        )
        xe = (
            oute.reshape(b, n, c // 2) if flat_e
            else oute.reshape(b, n, 2, c // 4)
        )

        ys = LinearD8(c, use_bias=self.proj_bias, name="proj", **common)(
            outs1 + (xe,), layerscale=layerscale, residual=residual
        )
        ys = DropoutD8(self.proj_drop)(ys, deterministic)
        return ys


class BlockD8(nn.Module):
    """Pre-norm equivariant transformer block.

    With ``layerscale_init`` set it is the DINOv2-style BlockD8
    (reference: octic_vits/d8_layers.py:713-776); the DeiT III
    `Layer_scale_init_BlockD8` (reference: octic_vits/d8_layers.py:665-707)
    is the same computation with init 1e-4 (its gamma AffineD8(bias=False)
    is functionally LayerScale)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    layerscale_init: Optional[float] = None
    use_pallas_gelu: bool = False
    use_pallas_linear: bool = False
    use_pallas_attention: bool = False
    use_wide_qkv: bool = False  # see AttentionD8.use_wide_qkv
    fuse_qkv: bool = False      # see AttentionD8.fuse_qkv
    # Fold ls*y + residual into the proj/fc2 kernel epilogues. Measured a
    # net LOSS on v5e (the epilogue routes proj through the pallas linear,
    # which is slower than XLA's batched dot for C->C shapes, and re-DMAs
    # the residual): model-level 188ms vs 163ms. Kept behind a flag until
    # the linear kernel itself wins those shapes.
    fuse_block_epilogues: bool = False
    # fuse the whole MLP residual branch into one kernel. Faster in the
    # single-block microbenchmark (4.24 vs ~5 ms) but SLOWER at model level
    # under the scanned trunk (173 vs 163 ms) — per-module kernels pipeline
    # better across scan iterations. Kept as a tested option.
    fuse_mlp_branch: bool = False
    # single-kernel fc1+GELU+fc2 (no norm/ls glue): the hidden stays in
    # VMEM instead of round-tripping HBM between the two linear kernels
    fuse_mlp: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, deterministic: bool = True):
        """`xs` is either the 5-tuple (reference layout, oracle path) or the
        flat packed [..., C] container (d8/group.py:pack_5_to_flat) — the
        TPU layout the scanned trunk carries so norms/LayerScale/droppath/
        residuals run as single full-width VPU passes. Both paths create an
        identical parameter tree."""
        packed = not isinstance(xs, (tuple, list))
        if packed:
            c8 = xs.shape[-1] // 8
            dim = 8 * c8
        else:
            dim = xs[0].shape[-1] * 8
            c8 = dim // 8
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # Fused epilogue: when LayerScale is present and no stochastic op
        # sits between the linear and the residual add, the proj/fc2 kernels
        # write  x + ls * y  directly (saves two HBM round trips per block).
        fuse_epilogue = (
            self.fuse_block_epilogues
            and not packed
            and self.use_pallas_linear
            and self.layerscale_init is not None
            and self.drop == 0.0
            and (self.drop_path == 0.0 or deterministic)
        )

        def scale_mod(name):
            return ScaleD8(
                init_value=self.layerscale_init,
                param_dtype=self.param_dtype,
                name=name,
            )

        def alphas_of(name):
            # Extract the LayerScale vectors by applying the module to ones
            # (constant-folded): keeps the parameter tree identical to the
            # unfused path.
            ones = (jnp.ones((c8,), jnp.float32),) * 4 + (
                jnp.ones((2, 2 * c8), jnp.float32),
            )
            a = scale_mod(name)(ones)
            return jnp.stack(a[:4]), a[4][0]

        attn = AttentionD8(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            proj_bias=self.proj_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            use_pallas_attention=self.use_pallas_attention,
            use_wide_qkv=self.use_wide_qkv,
            fuse_qkv=self.fuse_qkv,
            name="attn",
            **common,
        )
        # Fused MLP residual branch: norm2+fc1+gelu+fc2+ls2+residual in ONE
        # Pallas kernel — the hidden activations never touch HBM. Parameters
        # stay owned by the norm2/mlp/ls2 modules (materialized via dummy
        # calls, read back with get_variable), so the tree is unchanged.
        fuse_mlp_branch = (
            self.fuse_mlp_branch
            and not packed
            and self.use_pallas_linear
            and self.layerscale_init is not None
            and self.drop == 0.0
            and (self.drop_path == 0.0 or deterministic)
            and not fuse_epilogue
        )

        mlp = MlpD8(
            hidden_features=int(dim * self.mlp_ratio),
            use_bias=self.ffn_bias,
            drop=self.drop,
            use_pallas_gelu=self.use_pallas_gelu,
            # in fused-branch mode the module only materializes params via a
            # dummy call — keep its own compute path eager
            use_pallas_linear=self.use_pallas_linear and not fuse_mlp_branch,
            fuse_mlp=self.fuse_mlp and not fuse_epilogue,
            name="mlp",
            **common,
        )
        ln_pallas = self.use_pallas_linear or self.use_pallas_attention
        norm1 = LayerNormD8(param_dtype=self.param_dtype,
                            use_pallas=ln_pallas, name="norm1")
        norm2 = LayerNormD8(param_dtype=self.param_dtype,
                            use_pallas=ln_pallas, name="norm2")

        if packed:
            # flat-E views: 5 plain lane slices / one concat — E never
            # becomes [..., 2, C/4] (that reshape is a tiled-layout
            # relayout of the whole stream, ~0.26 ms/block in traces).
            # When the fused qkv+attention / fused MLP kernels are on,
            # attn/mlp consume the packed array DIRECTLY (in-kernel slices)
            # and the MLP also returns it packed — no XLA-side slice/concat
            # materialization around those kernels at all.
            def pack_fe(ys):
                return jnp.concatenate(ys, axis=-1)

            X = xs
            dt = X.dtype
            # materialize norm/layerscale params with dummy calls (dead
            # compute, DCE'd) so the tree matches the tuple path, then read
            # them back as full-width vectors.
            dummy = tuple(jnp.zeros((1, 1, c8), dt) for _ in range(4)) + (
                jnp.zeros((1, 1, 2, 2 * c8), dt),
            )
            norm1(dummy)
            norm2(dummy)
            if self.layerscale_init is not None:
                scale_mod("ls1")(dummy)
                scale_mod("ls2")(dummy)

            def vec_of(p):
                a1d = p["alpha_1d"].astype(dt)
                ae = p["alpha_e"].astype(dt)
                return jnp.concatenate((a1d.reshape(-1), ae, ae))

            def norm_vecs(name):
                p = self.get_variable("params", name)["affine"]
                alpha = vec_of(p)
                beta = p.get("beta_a1")
                if beta is None:
                    return alpha, None
                bvec = jnp.zeros((dim,), dt).at[:c8].set(beta.astype(dt))
                return alpha, bvec

            def apply_norm(x, name):
                alpha, beta = norm_vecs(name)
                y = layer_norm_d8_stats_flat(x, eps=1e-5) * alpha
                return y + beta if beta is not None else y

            def apply_ls(y, name):
                if self.layerscale_init is None:
                    return y
                return y * vec_of(self.get_variable("params", name))

            def droppath(y):
                if self.drop_path == 0.0 or deterministic:
                    return y
                keep = 1.0 - self.drop_path
                shape = (y.shape[0],) + (1,) * (y.ndim - 1)
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, shape
                )
                return y * (mask.astype(y.dtype) / keep)

            ys = attn(apply_norm(X, "norm1"), deterministic)
            X = X + droppath(apply_ls(pack_fe(ys), "ls1"))
            ys = mlp(apply_norm(X, "norm2"), deterministic)
            if isinstance(ys, (tuple, list)):
                ys = pack_fe(ys)
            return X + droppath(apply_ls(ys, "ls2"))

        if fuse_epilogue:
            xs = attn(
                norm1(xs), deterministic,
                layerscale=alphas_of("ls1"), residual=xs,
            )
            return mlp(
                norm2(xs), deterministic,
                layerscale=alphas_of("ls2"), residual=xs,
            )

        if fuse_mlp_branch:
            from octic_vits_tpu.ops.pallas_mlp_branch import mlp_branch_d8

            # attention half (ls1 + residual via XLA fusion)
            ys = attn(norm1(xs), deterministic)
            if self.layerscale_init is not None:
                ys = scale_mod("ls1")(ys)
            xs = tuple(x + y for x, y in zip(xs, ys))

            # materialize norm2/mlp/ls2 params without running them on the
            # real batch (dummy shapes; dead compute is DCE'd)
            dt = xs[0].dtype
            dummy = tuple(jnp.zeros((1, 1, c8), dt) for _ in range(4)) + (
                jnp.zeros((1, 1, 2, 2 * c8), dt),
            )
            norm2(dummy)
            mlp(dummy, True)
            scale_mod("ls2")(dummy)
            pn = self.get_variable("params", "norm2")["affine"]
            pm = self.get_variable("params", "mlp")
            pls = self.get_variable("params", "ls2")
            h8 = pm["fc1"]["kernel_1d"].shape[-1]
            zeros = lambda s: jnp.zeros(s, dt)
            params11 = (
                pn["alpha_1d"].astype(dt),
                pn["alpha_e"].astype(dt),
                pn.get("beta_a1", zeros((c8,))).astype(dt),
                pm["fc1"]["kernel_1d"].astype(dt),
                pm["fc1"]["kernel_e"].astype(dt),
                pm["fc1"].get("bias_a1", zeros((h8,))).astype(dt),
                pm["fc2"]["kernel_1d"].astype(dt),
                pm["fc2"]["kernel_e"].astype(dt),
                pm["fc2"].get("bias_a1", zeros((c8,))).astype(dt),
                pls["alpha_1d"].astype(dt),
                pls["alpha_e"].astype(dt),
            )
            return mlp_branch_d8(xs, params11)

        def maybe_scale(ys, name):
            if self.layerscale_init is None:
                return ys
            return scale_mod(name)(ys)

        ys = attn(norm1(xs), deterministic)
        ys = maybe_scale(ys, "ls1")
        ys = DropPathD8(self.drop_path, name="drop_path1")(ys, deterministic)
        xs = tuple(x + y for x, y in zip(xs, ys))

        ys = mlp(norm2(xs), deterministic)
        ys = maybe_scale(ys, "ls2")
        ys = DropPathD8(self.drop_path, name="drop_path2")(ys, deterministic)
        return tuple(x + y for x, y in zip(xs, ys))
