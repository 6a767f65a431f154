"""Per-layer D8-equivariance tests.

Mirrors the reference property harnesses
(reference: experiments/test_equivariance.py:145-260): every equivariant
layer must commute with the isotypic group action for all 8 group elements,
with a non-degeneracy control (output != 0). Sizes are shrunk for CPU speed;
the math is size-independent.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octic_vits_tpu.d8 import (
    GROUP_ELEMENTS,
    image_space_group_action,
    isotypic_group_action,
    pack_8_to_5,
    spatial_and_isotypic_group_action,
    unpack_5_to_8,
)
from octic_vits_tpu.layers.d8_layers import (
    AttentionD8,
    BlockD8,
    GeluD8,
    IsotypicToPatchD8,
    LayerNormD8,
    LinearD8,
    MlpD8,
    PatchEmbedD8,
    ScaleD8,
)
from octic_vits_tpu.layers.invariants import (
    CanonizationInvariant,
    LinearInvariant,
    MaxFilteringInvariant,
    NonInvariant,
    PolynomialInvariant,
    PowerSpectrumInvariant,
    ThirdOrderInvariant,
)

ATOL = 1e-5


def rand_8tuple(key, shape):
    keys = jax.random.split(key, 16)
    # mean shift (like the reference) so layernorm centering is exercised
    return tuple(
        jax.random.normal(keys[i], shape)
        + jax.random.normal(keys[8 + i], shape[:-1] + (1,))
        for i in range(8)
    )


def check_iso_to_iso(apply_fn, shape=(2, 3, 16), seed=0):
    """layer(g.x) == g.layer(x) on 5-tuples, plus non-degeneracy."""
    xs8 = rand_8tuple(jax.random.PRNGKey(seed), shape)
    base = unpack_5_to_8(apply_fn(pack_8_to_5(xs8)))
    for g in GROUP_ELEMENTS:
        lhs = isotypic_group_action(g, base)
        rhs = unpack_5_to_8(apply_fn(pack_8_to_5(isotypic_group_action(g, xs8))))
        for slot, (x, y) in enumerate(zip(lhs, rhs)):
            assert float(jnp.abs(x).max()) > 1e-6, f"degenerate slot {slot} g={g}"
            np.testing.assert_allclose(x, y, atol=ATOL, err_msg=f"g={g} slot={slot}")


def init_and_bind(module, xs, key=0):
    params = module.init(jax.random.PRNGKey(key), xs)
    return functools.partial(module.apply, params)


def test_gelu_d8_equivariance():
    check_iso_to_iso(lambda xs: GeluD8()(xs))


def test_linear_d8_equivariance():
    xs = pack_8_to_5(rand_8tuple(jax.random.PRNGKey(1), (2, 3, 16)))
    mod = LinearD8(features=48)
    check_iso_to_iso(init_and_bind(mod, xs))


def test_linear_d8_matches_blockwise():
    """The batched dot_general must equal 5 independent linear maps."""
    xs = pack_8_to_5(rand_8tuple(jax.random.PRNGKey(2), (2, 3, 8)))
    mod = LinearD8(features=24)
    params = mod.init(jax.random.PRNGKey(0), xs)
    out = mod.apply(params, xs)
    w1 = params["params"]["kernel_1d"]
    we = params["params"]["kernel_e"]
    b = params["params"]["bias_a1"]
    expected = [xs[i] @ w1[i] for i in range(4)]
    expected[0] = expected[0] + b
    np.testing.assert_allclose(out[0], expected[0], atol=1e-6)
    for i in range(1, 4):
        np.testing.assert_allclose(out[i], expected[i], atol=1e-6)
    np.testing.assert_allclose(out[4], xs[4] @ we, atol=1e-6)


def test_layernorm_d8_equivariance():
    xs = pack_8_to_5(rand_8tuple(jax.random.PRNGKey(3), (2, 3, 16)))
    mod = LayerNormD8()
    check_iso_to_iso(init_and_bind(mod, xs))


def test_layernorm_d8_matches_torch_formula():
    """Cross-check the shared-std formula against a direct numpy port of the
    reference math (octic_vits/d8_layers.py:166-186)."""
    from octic_vits_tpu.d8.group import SQRT2_OVER_4
    from octic_vits_tpu.layers.d8_layers import layer_norm_d8_stats

    rng = np.random.RandomState(0)
    xs8 = tuple(rng.randn(2, 3, 8).astype(np.float32) for _ in range(8))
    xs = pack_8_to_5(tuple(jnp.asarray(x) for x in xs8))
    out = layer_norm_d8_stats(xs, eps=1e-5)

    def var(x):
        return np.var(np.asarray(x), axis=-1, keepdims=True)

    e = np.asarray(xs[4])
    std = SQRT2_OVER_4 * np.sqrt(
        var(xs[0]) + var(xs[1]) + var(xs[2]) + var(xs[3])
        + np.mean(var(e), axis=-2) + 1e-5
    )
    for i in range(4):
        x = np.asarray(xs[i])
        ref = (x - x.mean(-1, keepdims=True)) / std
        np.testing.assert_allclose(out[i], ref, atol=1e-5)
    ref_e = (e - e.mean(-1, keepdims=True)) / std[..., None]
    np.testing.assert_allclose(out[4], ref_e, atol=1e-5)


def test_flat_layernorm_custom_vjp_grad_parity():
    """The analytic custom VJP of the flat packed LayerNorm matches the
    XLA-autodiff gradient of the same forward (values bitwise, grads to
    f32 tolerance), including non-zero means and a bf16 stream."""
    from octic_vits_tpu.layers.d8_layers import (
        _flat_ln_custom,
        _flat_ln_fwd_impl,
    )

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 32), jnp.float32)
    x = 3.0 * x + 1.5  # non-zero means exercise the centering projector
    u = jax.random.normal(jax.random.PRNGKey(8), (2, 5, 32), jnp.float32)

    np.testing.assert_array_equal(
        np.asarray(_flat_ln_custom(x, 1e-5)),
        np.asarray(_flat_ln_fwd_impl(x, 1e-5)[0]),
    )

    g_auto = jax.grad(lambda t: jnp.sum(_flat_ln_fwd_impl(t, 1e-5)[0] * u))(x)
    g_custom = jax.jit(
        jax.grad(lambda t: jnp.sum(_flat_ln_custom(t, 1e-5) * u))
    )(x)
    np.testing.assert_allclose(g_custom, g_auto, rtol=1e-4, atol=1e-5)

    # bf16 stream: residuals round to bf16; grads stay near the f32 answer
    gb = jax.grad(
        lambda t: jnp.sum(_flat_ln_custom(t, 1e-5).astype(jnp.float32) * u)
    )(x.astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(gb, dtype=np.float32), np.asarray(g_auto),
        rtol=0.15, atol=0.05,
    )


def test_flat_e_tuple_layernorm_custom_vjp_grad_parity():
    """Same check for the flat-E TUPLE LayerNorm (the scanned trunk's
    default carry): values bitwise vs the autodiff path, analytic grads to
    f32 tolerance on all five parts."""
    from octic_vits_tpu.layers.d8_layers import (
        _tuple_ln_custom,
        _tuple_ln_fwd_impl,
    )

    c8 = 8
    keys = jax.random.split(jax.random.PRNGKey(11), 10)
    xs = tuple(
        2.0 * jax.random.normal(keys[i], (2, 5, c8), jnp.float32) + 0.7
        for i in range(4)
    ) + (2.0 * jax.random.normal(keys[4], (2, 5, 4 * c8), jnp.float32) - 0.3,)
    us = tuple(
        jax.random.normal(keys[5 + i], x.shape, jnp.float32)
        for i, x in enumerate(xs)
    )

    out_c = _tuple_ln_custom(xs, 1e-5)
    out_a = _tuple_ln_fwd_impl(xs, 1e-5)[0]
    for oc, oa in zip(out_c, out_a):
        np.testing.assert_array_equal(np.asarray(oc), np.asarray(oa))

    def loss(fn):
        return lambda ts: sum(
            jnp.sum(o * u) for o, u in zip(fn(ts, 1e-5), us)
        )

    g_auto = jax.grad(loss(lambda ts, e: _tuple_ln_fwd_impl(ts, e)[0]))(xs)
    g_custom = jax.jit(jax.grad(loss(_tuple_ln_custom)))(xs)
    for gc, ga in zip(g_custom, g_auto):
        np.testing.assert_allclose(gc, ga, rtol=1e-4, atol=1e-5)

    # bf16 stream stays near the f32 answer
    xb = tuple(x.astype(jnp.bfloat16) for x in xs)
    gb = jax.grad(
        lambda ts: sum(
            jnp.sum(o.astype(jnp.float32) * u)
            for o, u in zip(_tuple_ln_custom(ts, 1e-5), us)
        )
    )(xb)
    for gc, ga in zip(gb, g_auto):
        np.testing.assert_allclose(
            np.asarray(gc, dtype=np.float32), np.asarray(ga),
            rtol=0.15, atol=0.05,
        )


def test_scale_d8_equivariance():
    xs = pack_8_to_5(rand_8tuple(jax.random.PRNGKey(4), (2, 3, 16)))
    mod = ScaleD8(init_value=0.7, use_bias=True)
    check_iso_to_iso(init_and_bind(mod, xs))


def test_mlp_d8_equivariance():
    xs = pack_8_to_5(rand_8tuple(jax.random.PRNGKey(5), (2, 3, 16)))
    mod = MlpD8(hidden_features=256)
    check_iso_to_iso(init_and_bind(mod, xs))


def test_attention_d8_equivariance():
    xs = pack_8_to_5(rand_8tuple(jax.random.PRNGKey(6), (2, 5, 16)))
    mod = AttentionD8(num_heads=2)
    check_iso_to_iso(init_and_bind(mod, xs), shape=(2, 5, 16))


def test_block_d8_equivariance():
    xs = pack_8_to_5(rand_8tuple(jax.random.PRNGKey(7), (2, 5, 16)))
    mod = BlockD8(num_heads=2, layerscale_init=1e-1)
    check_iso_to_iso(init_and_bind(mod, xs), shape=(2, 5, 16))


def test_patch_embed_d8_equivariance():
    """PatchEmbed: layer(g.img) == (spatial+isotypic g).layer(img)
    (reference: experiments/test_equivariance.py:197-216)."""
    img = jax.random.normal(jax.random.PRNGKey(8), (2, 32, 32, 3))
    mod = PatchEmbedD8(patch_size=8, embed_dim=32)
    params = mod.init(jax.random.PRNGKey(0), img)
    apply_fn = functools.partial(mod.apply, params)
    base = unpack_5_to_8(apply_fn(img))
    for g in GROUP_ELEMENTS:
        # image action on NHWC acts on axes (1, 2): move C first
        g_img = jnp.moveaxis(
            image_space_group_action(g, jnp.moveaxis(img, -1, 1)), 1, -1
        )
        lhs = spatial_and_isotypic_group_action(g, base)
        rhs = unpack_5_to_8(apply_fn(g_img))
        for slot, (x, y) in enumerate(zip(lhs, rhs)):
            assert float(jnp.abs(x).max()) > 1e-5
            np.testing.assert_allclose(x, y, atol=ATOL, err_msg=f"g={g} slot={slot}")


def test_isotypic_to_patch_d8_equivariance():
    """Inverse lift: img(g.xs) == g.img(xs) in image space
    (reference: experiments/test_equivariance.py:324-336)."""
    xs8 = tuple(
        jax.random.normal(jax.random.PRNGKey(30 + i), (2, 16, 4)) for i in range(8)
    )
    mod = IsotypicToPatchD8(patch_side=4, out_channels=3, reshape_to_image=True)
    xs = pack_8_to_5(xs8)
    params = mod.init(jax.random.PRNGKey(0), xs)
    apply_fn = functools.partial(mod.apply, params)
    base = apply_fn(xs)  # [B, H, W, C] image
    for g in GROUP_ELEMENTS:
        lhs = jnp.moveaxis(
            image_space_group_action(g, jnp.moveaxis(base, -1, 1)), 1, -1
        )
        rhs = apply_fn(pack_8_to_5(spatial_and_isotypic_group_action(g, xs8)))
        assert float(jnp.abs(lhs).max()) > 1e-5
        np.testing.assert_allclose(lhs, rhs, atol=ATOL, err_msg=f"g={g}")


@pytest.mark.parametrize(
    "cls,needs_params",
    [
        (PowerSpectrumInvariant, False),
        (LinearInvariant, False),
        (PolynomialInvariant, False),
        (ThirdOrderInvariant, False),
        (MaxFilteringInvariant, True),
        (CanonizationInvariant, True),
    ],
)
def test_invariants_are_invariant(cls, needs_params):
    xs8 = rand_8tuple(jax.random.PRNGKey(9), (2, 3, 4))
    mod = cls(dim=32)
    xs = pack_8_to_5(xs8)
    if needs_params:
        params = mod.init(jax.random.PRNGKey(0), xs)
        apply_fn = functools.partial(mod.apply, params)
    else:
        apply_fn = lambda t: mod(t)
    base = apply_fn(xs)
    assert base.shape[-1] == mod.output_dim
    assert float(jnp.abs(base).max()) > 1e-6
    for g in GROUP_ELEMENTS:
        out = apply_fn(pack_8_to_5(isotypic_group_action(g, xs8)))
        np.testing.assert_allclose(base, out, atol=ATOL, err_msg=f"g={g}")


def test_non_invariant_is_not_invariant():
    """Negative control mirroring the reference's non-invariance check."""
    xs8 = rand_8tuple(jax.random.PRNGKey(10), (2, 3, 4))
    mod = NonInvariant(dim=32)
    base = mod(pack_8_to_5(xs8))
    diffs = [
        float(jnp.abs(base - mod(pack_8_to_5(isotypic_group_action(g, xs8)))).max())
        for g in GROUP_ELEMENTS[1:]
    ]
    assert max(diffs) > 1e-3


def test_gelu_d8_nonlinearity():
    """The octic GELU must not be linear (sanity against sign bugs)."""
    xs8 = rand_8tuple(jax.random.PRNGKey(11), (2, 3, 4))
    xs = pack_8_to_5(xs8)
    g = GeluD8()
    one = g(xs)
    two = g(tuple(2.0 * x for x in xs))
    assert float(jnp.abs(tuple(2.0 * o for o in one)[0] - two[0]).max()) > 1e-3
