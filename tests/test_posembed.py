"""Tests for equivariant pos-embed unfolding and bicubic resize parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octic_vits_tpu.d8 import (
    GROUP_ELEMENTS,
    isotypic_group_action,
    image_space_group_action,
)
from octic_vits_tpu.d8.posembed import resize_grid, unfold_quadrant


def test_unfold_shapes():
    xs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (7, 7, 4)) for i in range(6)
    )
    out = unfold_quadrant(xs, dim=0)
    assert len(out) == 8
    for o in out:
        assert o.shape == (14, 14, 4)


def test_unfolded_posembed_is_equivariant():
    """The unfolded pos-embed must satisfy g . pe == pe for the combined
    spatial+isotypic action — that is what makes pos-embed addition
    equivariance-preserving (reference: octic_vits/d8_utils.py:388-451)."""
    xs = tuple(
        jax.random.normal(jax.random.PRNGKey(10 + i), (5, 5, 3)) for i in range(6)
    )
    pe = unfold_quadrant(xs, dim=0)  # 8 x [10, 10, 3]
    for g in GROUP_ELEMENTS:
        # spatial action on [H, W, C]: act on axes (0, 1)
        spatial = tuple(
            jnp.moveaxis(
                image_space_group_action(g, jnp.moveaxis(p, -1, 0)), 0, -1
            )
            for p in pe
        )
        acted = isotypic_group_action(g, spatial)
        for slot, (a, p) in enumerate(zip(acted, pe)):
            np.testing.assert_allclose(a, p, atol=1e-6, err_msg=f"g={g} slot={slot}")
    # non-degeneracy
    assert max(float(jnp.abs(p).max()) for p in pe) > 1e-3


def test_unfold_batched_dim():
    xs = tuple(
        jax.random.normal(jax.random.PRNGKey(20 + i), (2, 4, 4, 3)) for i in range(6)
    )
    out = unfold_quadrant(xs, dim=1)
    for o in out:
        assert o.shape == (2, 8, 8, 3)


def test_resize_identity():
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 6, 3))
    assert resize_grid(x, (6, 6)) is x


@pytest.mark.parametrize("out_hw", [(8, 8), (5, 7), (14, 14)])
def test_resize_matches_torch_bicubic(out_hw):
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 3, 9, 9).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bicubic", antialias=False
    ).numpy()
    # ours is channels-last over the final 3 axes
    ours = resize_grid(jnp.asarray(np.moveaxis(x, 1, -1)), out_hw)
    ours = np.moveaxis(np.asarray(ours), -1, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_resize_constant_preserved():
    x = jnp.ones((4, 4, 2)) * 3.5
    out = resize_grid(x, (9, 9))
    np.testing.assert_allclose(out, 3.5, rtol=1e-5)
