"""Pallas fused D8-GELU vs the eager oracle (interpret mode on CPU).

Mirrors the reference kernel self-tests (reference:
octic_vits/d8_gelu.py:484-719): forward allclose and backward-gradient
allclose against the eager composite, plus equivariance of the kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np

from octic_vits_tpu.d8 import (
    GROUP_ELEMENTS,
    isotypic_group_action,
    pack_8_to_5,
    unpack_5_to_8,
)
from octic_vits_tpu.ops.gelu_d8 import gelu_d8_eager
from octic_vits_tpu.ops.pallas_gelu import gelu_d8_pallas


def rand_tuple(key, b=2, n=6, c=16):
    keys = jax.random.split(key, 8)
    return pack_8_to_5(tuple(jax.random.normal(k, (b, n, c)) for k in keys))


def test_fwd_matches_eager():
    xs = rand_tuple(jax.random.PRNGKey(0))
    ref = gelu_d8_eager(xs)
    out = gelu_d8_pallas(xs, True)
    for i, (r, o) in enumerate(zip(ref, out)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6,
                                   err_msg=f"slot {i}")


def test_fwd_odd_rows():
    # token count not divisible by the row tile — edge blocks masked
    xs = rand_tuple(jax.random.PRNGKey(1), b=3, n=7, c=8)
    ref = gelu_d8_eager(xs)
    out = gelu_d8_pallas(xs, True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6)


def test_bwd_matches_eager():
    xs = rand_tuple(jax.random.PRNGKey(2))
    cot = rand_tuple(jax.random.PRNGKey(3))

    def loss_pallas(t):
        out = gelu_d8_pallas(t, True)
        return sum(jnp.vdot(o, c) for o, c in zip(out, cot))

    def loss_eager(t):
        out = gelu_d8_eager(t)
        return sum(jnp.vdot(o, c) for o, c in zip(out, cot))

    gp = jax.grad(loss_pallas)(xs)
    ge = jax.grad(loss_eager)(xs)
    for i, (a, b) in enumerate(zip(gp, ge)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=f"slot {i}")


def test_kernel_equivariance():
    xs8 = tuple(
        jax.random.normal(jax.random.PRNGKey(10 + i), (2, 4, 8)) for i in range(8)
    )
    base = unpack_5_to_8(gelu_d8_pallas(pack_8_to_5(xs8), True))
    for g in GROUP_ELEMENTS:
        lhs = isotypic_group_action(g, base)
        rhs = unpack_5_to_8(
            gelu_d8_pallas(pack_8_to_5(isotypic_group_action(g, xs8)), True)
        )
        for a, b in zip(lhs, rhs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_path():
    xs = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      rand_tuple(jax.random.PRNGKey(4)))
    ref = gelu_d8_eager(xs)
    out = gelu_d8_pallas(xs, True)
    for r, o in zip(ref, out):
        assert o.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32), atol=3e-2
        )
