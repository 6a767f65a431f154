"""Property tests for the D8 group core.

Mirrors the group-theory sanity portion of the reference test suite
(reference: experiments/test_equivariance.py:51-120): action composition must
match the multiplication table for every representation, the two Fourier
transforms must be mutual inverses, and the FFT must intertwine the regular
and isotypic actions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octic_vits_tpu.d8 import (
    GROUP_ELEMENTS,
    MULT_TABLE,
    image_space_group_action,
    isotypic_group_action,
    isotypic_to_regular,
    isotypic_to_regular_dense,
    pack_8_to_5,
    regular_group_action,
    regular_to_isotypic,
    regular_to_isotypic_dense,
    spatial_and_isotypic_group_action,
    unpack_5_to_8,
)


def rand_8tuple(key, shape=(2, 3, 4)):
    keys = jax.random.split(key, 8)
    return tuple(jax.random.normal(k, shape) for k in keys)


def assert_tuples_close(xs, ys, atol=1e-6):
    for i, (x, y) in enumerate(zip(xs, ys)):
        np.testing.assert_allclose(x, y, atol=atol, err_msg=f"slot {i}")


def test_mult_table_is_complete_group():
    assert len(MULT_TABLE) == 49
    products = {(g1, g2): g for g1, g2, g in MULT_TABLE}
    # Latin-square property on non-identity elements plus closure.
    for g1, g2, g in MULT_TABLE:
        assert g in GROUP_ELEMENTS
    # Every element has an inverse (g*ginv = e).
    for g in GROUP_ELEMENTS[1:]:
        assert any(products[(g, h)] == "e" for h in GROUP_ELEMENTS[1:])


@pytest.mark.parametrize("action", [regular_group_action, isotypic_group_action])
def test_tuple_action_composition(action):
    xs = rand_8tuple(jax.random.PRNGKey(0))
    for g1, g2, g12 in MULT_TABLE:
        lhs = action(g1, action(g2, xs))
        rhs = action(g12, xs)
        assert_tuples_close(lhs, rhs)


def test_image_action_composition():
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 8))
    for g1, g2, g12 in MULT_TABLE:
        lhs = image_space_group_action(g1, image_space_group_action(g2, img))
        rhs = image_space_group_action(g12, img)
        np.testing.assert_allclose(lhs, rhs, atol=0)


def test_spatial_and_isotypic_action_composition():
    xs = rand_8tuple(jax.random.PRNGKey(2), shape=(2, 16, 4))
    for g1, g2, g12 in MULT_TABLE:
        lhs = spatial_and_isotypic_group_action(
            g1, spatial_and_isotypic_group_action(g2, xs)
        )
        rhs = spatial_and_isotypic_group_action(g12, xs)
        assert_tuples_close(lhs, rhs)


def test_fft_inverses():
    xs = rand_8tuple(jax.random.PRNGKey(3))
    assert_tuples_close(regular_to_isotypic(isotypic_to_regular(xs)), xs)
    assert_tuples_close(isotypic_to_regular(regular_to_isotypic(xs)), xs)


def test_fft_matches_dense():
    xs = rand_8tuple(jax.random.PRNGKey(4))
    assert_tuples_close(isotypic_to_regular(xs), isotypic_to_regular_dense(xs))
    assert_tuples_close(regular_to_isotypic(xs), regular_to_isotypic_dense(xs))


def test_fft_intertwines_actions():
    """iFFT(isotypic action) == regular action(iFFT): the change of basis
    maps the isotypic rep onto the regular rep."""
    xs = rand_8tuple(jax.random.PRNGKey(5))
    for g in GROUP_ELEMENTS:
        lhs = isotypic_to_regular(isotypic_group_action(g, xs))
        rhs = regular_group_action(g, isotypic_to_regular(xs))
        assert_tuples_close(lhs, rhs)


def test_fft_is_orthogonal():
    xs = rand_8tuple(jax.random.PRNGKey(6))
    ys = isotypic_to_regular(xs)
    norm_x = sum(jnp.sum(x**2) for x in xs)
    norm_y = sum(jnp.sum(y**2) for y in ys)
    np.testing.assert_allclose(norm_x, norm_y, rtol=1e-5)


def test_pack_unpack_roundtrip():
    xs = rand_8tuple(jax.random.PRNGKey(7), shape=(2, 5, 6))
    packed = pack_8_to_5(xs)
    assert packed[4].shape == (2, 5, 2, 12)
    assert_tuples_close(unpack_5_to_8(packed), xs)
    # E packing layout: row 0 = concat(E11, E12), row 1 = concat(E21, E22)
    np.testing.assert_allclose(packed[4][..., 0, :6], xs[4])
    np.testing.assert_allclose(packed[4][..., 1, :6], xs[5])
    np.testing.assert_allclose(packed[4][..., 0, 6:], xs[6])
    np.testing.assert_allclose(packed[4][..., 1, 6:], xs[7])


def test_nondegenerate():
    xs = rand_8tuple(jax.random.PRNGKey(8))
    ys = isotypic_to_regular(xs)
    assert all(jnp.abs(y).max() > 1e-3 for y in ys)
