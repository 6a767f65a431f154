"""Fused D8-equivariant GELU.

The octic GELU applies pointwise GELU in *regular-representation*
coordinates: isotypic -> regular (butterfly), exact erf-GELU, regular ->
isotypic. The reference implements this as a hand-written Triton kernel
(reference: octic_vits/d8_gelu.py:92-331). On TPU the eager composite below
already fuses into a single elementwise XLA kernel; a Pallas kernel with a
custom VJP (see `octic_vits_tpu.ops.pallas_gelu`) additionally fuses the
backward butterfly and halves HBM traffic by recomputing the FFT in-register.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from octic_vits_tpu.d8.group import (
    isotypic_to_regular,
    pack_8_to_5,
    pack_8_to_5f,
    regular_to_isotypic,
    unpack_5_to_8,
    unpack_5f_to_8,
)

Tuple5 = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


def gelu_d8_eager(xs: Tuple5) -> Tuple5:
    """Reference-semantics octic GELU on the packed 5-tuple.

    Matches the eager oracle `GeluD8` (reference: octic_vits/d8_layers.py:98-102)
    including the E-slot unpacking used by its kernel tests
    (reference: octic_vits/d8_gelu.py:519-536).
    """
    flat_e = xs[4].ndim == xs[0].ndim  # flat-E tuple (TPU packed path)
    reg = isotypic_to_regular(
        unpack_5f_to_8(xs) if flat_e else unpack_5_to_8(xs)
    )
    act = tuple(jax.nn.gelu(x, approximate=False) for x in reg)
    iso = regular_to_isotypic(act)
    return pack_8_to_5f(iso) if flat_e else pack_8_to_5(iso)


def gelu_d8(xs: Tuple5, use_pallas: bool = False) -> Tuple5:
    """Octic GELU; `use_pallas=True` routes to the fused Pallas kernel."""
    if use_pallas:
        from octic_vits_tpu.ops.pallas_gelu import gelu_d8_pallas

        return gelu_d8_pallas(xs)
    return gelu_d8_eager(xs)
