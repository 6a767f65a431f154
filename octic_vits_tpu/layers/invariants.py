"""D8 invariantization maps: equivariant 5-tuple -> invariant features.

Six variants mirroring the reference research surface
(reference: octic_vits/d8_invariantization.py). `PowerSpectrumInvariant` is
the one used by production "inv-early" models; the others exist for API
completeness and ablations.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from octic_vits_tpu.d8.group import unpack_5_to_8

Array = jnp.ndarray
Tuple5 = Tuple[Array, Array, Array, Array, Array]


def _split_e(e: Array):
    """E [..., 2, C/4] -> (x4, x5, x6, x7) each [..., C/8] (isotypic slots)."""
    half = e.shape[-1] // 2
    return e[..., 0, :half], e[..., 1, :half], e[..., 0, half:], e[..., 1, half:]


class PowerSpectrumInvariant(nn.Module):
    """cat(A1, |A2|, |B1|, |B2|, ||E||_2 over the 2 rows) -> 6C/8 dims.
    Reference: octic_vits/d8_invariantization.py:49-64."""

    dim: int  # input embed dim C

    @property
    def output_dim(self) -> int:
        return 6 * self.dim // 8

    def __call__(self, xs: Tuple5) -> Array:
        a1, a2, b1, b2, e = xs
        e_norm = jnp.linalg.norm(e, axis=-2)
        return jnp.concatenate(
            (a1, jnp.abs(a2), jnp.abs(b1), jnp.abs(b2), e_norm), axis=-1
        )


class NonInvariant(nn.Module):
    """|x| on all 8 slots, concatenated (an abs baseline, not truly invariant).
    Reference: octic_vits/d8_invariantization.py:29-42."""

    dim: int

    @property
    def output_dim(self) -> int:
        return self.dim

    def __call__(self, xs: Tuple5) -> Array:
        parts = unpack_5_to_8(xs)
        return jnp.concatenate([jnp.abs(p) for p in parts], axis=-1)


class LinearInvariant(nn.Module):
    """|A1| only. Reference: octic_vits/d8_invariantization.py:43-48."""

    dim: int

    @property
    def output_dim(self) -> int:
        return self.dim // 8

    def __call__(self, xs: Tuple5) -> Array:
        return jnp.abs(xs[0])


class PolynomialInvariant(nn.Module):
    """Explicit degree<=4 polynomial invariant basis, 32C/8 dims.
    Reference: octic_vits/d8_invariantization.py:66-112."""

    dim: int

    @property
    def output_dim(self) -> int:
        return 32 * self.dim // 8

    def __call__(self, xs: Tuple5) -> Array:
        x0, x1, x2, x3, e = xs
        x4, x5, x6, x7 = _split_e(e)
        return jnp.concatenate(
            (
                x0,
                x6**2 + x7**2,
                x4 * x6 + x5 * x7,
                x4**2 + x5**2,
                x3**2,
                x2**2,
                x1**2,
                x3 * x6 * x7,
                x3 * x5 * x6 + x3 * x4 * x7,
                x3 * x4 * x5,
                x2 * x6**2 - x2 * x7**2,
                x2 * x4 * x6 - x2 * x5 * x7,
                x2 * x4**2 - x2 * x5**2,
                x1 * x5 * x6 - x1 * x4 * x7,
                x1 * x2 * x3,
                x6**4 + x7**4,
                x4 * x6**3 + x5 * x7**3,
                x4**2 * x6**2 + x5**2 * x7**2,
                x4**3 * x6 + x5**3 * x7,
                x4**4 + x5**4,
                x2 * x3 * x5 * x6 - x2 * x3 * x4 * x7,
                x1 * x3 * x6**2 - x1 * x3 * x7**2,
                x1 * x3 * x4 * x6 - x1 * x3 * x5 * x7,
                x1 * x3 * x4**2 - x1 * x3 * x5**2,
                x1 * x2 * x6 * x7,
                x1 * x2 * x5 * x6 + x1 * x2 * x4 * x7,
                x1 * x2 * x4 * x5,
                x1 * x6**3 * x7 - x1 * x6 * x7**3,
                x1 * x5 * x6**3 - x1 * x4 * x7**3,
                x1 * x4 * x5 * x6**2 - x1 * x4 * x5 * x7**2,
                x1 * x4**2 * x5 * x6 - x1 * x4 * x5**2 * x7,
                x1 * x4**3 * x5 - x1 * x4 * x5**3,
            ),
            axis=-1,
        )


class ThirdOrderInvariant(nn.Module):
    """Degree<=3 invariant basis, 15C/8 dims.
    Reference: octic_vits/d8_invariantization.py:114-141."""

    dim: int

    @property
    def output_dim(self) -> int:
        return 15 * self.dim // 8

    def __call__(self, xs: Tuple5) -> Array:
        x0, x1, x2, x3, e = xs
        x4, x5, x6, x7 = _split_e(e)
        return jnp.concatenate(
            (
                x0**3,
                x0 * (x6**2 + x7**2),
                x0 * (x4 * x6 + x5 * x7),
                x0 * (x4**2 + x5**2),
                x0 * x3**2,
                x0 * x2**2,
                x0 * x1**2,
                x3 * x6 * x7,
                x3 * x5 * x6 + x3 * x4 * x7,
                x3 * x4 * x5,
                x2 * x6**2 - x2 * x7**2,
                x2 * x4 * x6 - x2 * x5 * x7,
                x2 * x4**2 - x2 * x5**2,
                x1 * x5 * x6 - x1 * x4 * x7,
                x1 * x2 * x3,
            ),
            axis=-1,
        )


# The 8x8 isotypic action matrices used by the max-filtering / canonization
# invariants (columns ordered A1 A2 B1 B2 E11 E21 E12 E22; reference:
# octic_vits/d8_invariantization.py:160-178).
_ROT = jnp.array(
    [
        [1.0, 0, 0, 0, 0, 0, 0, 0],
        [0.0, 1, 0, 0, 0, 0, 0, 0],
        [0.0, 0, -1, 0, 0, 0, 0, 0],
        [0.0, 0, 0, -1, 0, 0, 0, 0],
        [0.0, 0, 0, 0, 0, -1, 0, 0],
        [0.0, 0, 0, 0, 1, 0, 0, 0],
        [0.0, 0, 0, 0, 0, 0, 0, -1],
        [0.0, 0, 0, 0, 0, 0, 1, 0],
    ]
)
_REFL = jnp.diag(jnp.array([1.0, -1, 1, -1, -1, 1, -1, 1]))


def _orbit_matrices():
    r, m = _ROT, _REFL
    return jnp.stack(
        (
            jnp.eye(8),
            r,
            r @ r,
            r @ r @ r,
            m,
            m @ r,
            m @ r @ r,
            m @ r @ r @ r,
        ),
        axis=0,
    )


class MaxFilteringInvariant(nn.Module):
    """Max over the 8-orbit of inner products with learned reference
    directions. Reference: octic_vits/d8_invariantization.py:142-210."""

    dim: int  # input embed dim C
    num_references: Optional[int] = None
    global_avg: bool = False
    param_dtype: Any = jnp.float32

    @property
    def output_dim(self) -> int:
        return self.num_references or 2 * self.dim

    @nn.compact
    def __call__(self, xs: Tuple5) -> Array:
        n_ref = self.output_dim
        c8 = self.dim // 8

        def ref_init(key, shape, dtype):
            refs = jax.random.normal(key, shape, dtype)
            norm = jnp.sqrt(jnp.sum(refs**2, axis=(1, 2), keepdims=True))
            return refs / norm

        refs = self.param("references", ref_init, (n_ref, c8, 8), self.param_dtype)
        x0, x1, x2, x3, e = xs
        x4, x5, x6, x7 = _split_e(e)
        x = jnp.concatenate((x0, x1, x2, x3, x4, x5, x6, x7), axis=-1)

        # expand references over the orbit: [8, n_ref, 8(slots), c8] -> flat C
        acted = jnp.einsum("gij,dcj->gdic", _orbit_matrices(), refs)
        expanded = acted.reshape(8, n_ref, 8 * c8)
        # NOTE flatten order (slot, channel) must match the x concat order:
        # x is (slot-major, channel-minor) after the concat above.
        if self.global_avg:
            products = jnp.einsum("kdc,bc->bkd", expanded, x)
        else:
            products = jnp.einsum("kdc,bnc->bnkd", expanded, x)
        return jnp.max(products, axis=-2)


class CanonizationInvariant(nn.Module):
    """Orbit canonicalization: pick the group element maximizing the inner
    product with a learned reference, then output the acted features.
    Reference: octic_vits/d8_invariantization.py:212-280."""

    dim: int
    global_avg: bool = False
    param_dtype: Any = jnp.float32

    @property
    def output_dim(self) -> int:
        return self.dim

    @nn.compact
    def __call__(self, xs: Tuple5) -> Array:
        def ref_init(key, shape, dtype):
            r = jax.random.normal(key, shape, dtype)
            return r / jnp.linalg.norm(r)

        ref = self.param("reference", ref_init, (self.dim,), self.param_dtype)
        x0, x1, x2, x3, e = xs
        x4, x5, x6, x7 = _split_e(e)
        # [B, N, c8, 8slots]
        x = jnp.stack((x0, x1, x2, x3, x4, x5, x6, x7), axis=-1)
        if self.global_avg:
            x = x[:, None]

        # orbit: [B, N, 8g, c8, 8slots] -> flatten (c8, slot) -> [B,N,8,C]
        acted = jnp.einsum("gij,bncj->bngic", _orbit_matrices(), x)
        b, n = acted.shape[:2]
        expanded = acted.reshape(b, n, 8, -1)
        products = jnp.einsum("c,bnkc->bnk", ref, expanded)
        idx = jnp.argmax(products, axis=-1)
        out = jnp.take_along_axis(expanded, idx[..., None, None], axis=2)[..., 0, :]
        if self.global_avg:
            out = out[:, 0]
        return out


class InvariantHead(nn.Module):
    """Projection head for FULLY octic networks: (LN?) -> Linear -> GELU ->
    Linear to logits (reference: d8_invariantization.py:20-28,
    invariant_head_factory)."""

    hidden_dim: int
    num_classes: int
    use_norm: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-6, param_dtype=self.param_dtype)(x)
        x = nn.Dense(self.hidden_dim, param_dtype=self.param_dtype)(x)
        x = jax.nn.gelu(x, approximate=False)
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, param_dtype=self.param_dtype)(x)
        return x


INVARIANTS = {
    "power_spectrum": PowerSpectrumInvariant,
    "non_invariant": NonInvariant,
    "linear": LinearInvariant,
    "polynomial": PolynomialInvariant,
    "third_order": ThirdOrderInvariant,
    "max_filtering": MaxFilteringInvariant,
    "canonization": CanonizationInvariant,
}
