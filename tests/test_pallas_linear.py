"""Fused block-diagonal LinearD8 Pallas kernel vs eager oracle
(interpret mode on CPU): forward, fused-GELU forward, gradients, and
equivalence with the LinearD8 flax layer."""

import jax
import jax.numpy as jnp
import numpy as np

from octic_vits_tpu.d8 import pack_8_to_5
from octic_vits_tpu.ops.pallas_linear import (
    _eager_ref,
    linear_d8_fused,
    linear_d8_tuple,
)


def make_inputs(m=24, c=16, f=24, seed=0, bias=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x1 = jax.random.normal(ks[0], (4, m, c))
    xef = jax.random.normal(ks[1], (m, 4 * c))
    w1 = jax.random.normal(ks[2], (4, c, f)) * 0.1
    we = jax.random.normal(ks[3], (2 * c, 2 * f)) * 0.1
    b = jax.random.normal(ks[4], (f,)) if bias else None
    return x1, xef, w1, we, b


def test_forward_matches_eager():
    x1, xef, w1, we, b = make_inputs()
    for fuse in (False, True):
        y1, yef = linear_d8_fused(x1, xef, w1, we, b, None, None, None, None, fuse, True)
        r1, ref = _eager_ref(x1, xef, w1, we, b, fuse)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(r1), atol=2e-5)
        np.testing.assert_allclose(np.asarray(yef), np.asarray(ref), atol=2e-5)


def test_forward_no_bias():
    x1, xef, w1, we, _ = make_inputs(bias=False)
    y1, yef = linear_d8_fused(x1, xef, w1, we, None, None, None, None, None, False, True)
    r1, ref = _eager_ref(x1, xef, w1, we, None, False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(r1), atol=2e-5)


def test_gradients_match_eager():
    x1, xef, w1, we, b = make_inputs(m=16, c=8, f=8)
    for fuse in (False, True):
        def loss_k(args):
            y1, yef = linear_d8_fused(*args, None, None, None, None, fuse, True)
            return jnp.sum(y1**2) + jnp.sum(jnp.sin(yef))

        def loss_e(args):
            y1, yef = _eager_ref(*args, fuse)
            return jnp.sum(y1**2) + jnp.sum(jnp.sin(yef))

        gk = jax.grad(loss_k)((x1, xef, w1, we, b))
        ge = jax.grad(loss_e)((x1, xef, w1, we, b))
        for i, (a, e) in enumerate(zip(gk, ge)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(e), atol=1e-4,
                err_msg=f"fuse={fuse} arg={i}",
            )


def test_tuple_wrapper_matches_flax_layer():
    from octic_vits_tpu.layers.d8_layers import LinearD8

    b, n, c8 = 2, 6, 8
    feats = 48
    xs8 = tuple(
        jax.random.normal(jax.random.PRNGKey(10 + i), (b, n, c8)) for i in range(8)
    )
    xs = pack_8_to_5(xs8)
    layer = LinearD8(features=feats)
    params = layer.init(jax.random.PRNGKey(0), xs)["params"]
    ref = layer.apply({"params": params}, xs)
    out = linear_d8_tuple(
        xs, params["kernel_1d"], params["kernel_e"], params["bias_a1"],
        fuse_gelu=False, interpret=True,
    )
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref[i]), atol=2e-5, err_msg=f"slot {i}"
        )


def test_tuple_wrapper_fused_gelu_matches_layer_chain():
    from octic_vits_tpu.layers.d8_layers import LinearD8
    from octic_vits_tpu.ops.gelu_d8 import gelu_d8_eager

    b, n, c8 = 2, 5, 8
    xs = pack_8_to_5(tuple(
        jax.random.normal(jax.random.PRNGKey(20 + i), (b, n, c8)) for i in range(8)
    ))
    layer = LinearD8(features=32)
    params = layer.init(jax.random.PRNGKey(1), xs)["params"]
    ref = gelu_d8_eager(layer.apply({"params": params}, xs))
    out = linear_d8_tuple(
        xs, params["kernel_1d"], params["kernel_e"], params["bias_a1"],
        fuse_gelu=True, interpret=True,
    )
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref[i]), atol=1e-5, err_msg=f"slot {i}"
        )


# ---------------------------------------------------------------------------
# wide-qkv mode
# ---------------------------------------------------------------------------


def _interleave_ref(y1, yef, num_heads):
    """Oracle interleave: (s, head, [a1|a2|b1|b2|e0|e1]) column order."""
    f = y1.shape[-1]
    d1 = f // (3 * num_heads)
    de = 2 * d1
    e0, e1 = yef[:, : 2 * f], yef[:, 2 * f :]
    pieces = []
    for sh in range(3 * num_heads):
        for g in range(4):
            pieces.append(y1[g][:, sh * d1 : (sh + 1) * d1])
        pieces.append(e0[:, sh * de : (sh + 1) * de])
        pieces.append(e1[:, sh * de : (sh + 1) * de])
    return jnp.concatenate(pieces, axis=1)


def test_qkv_wide_matches_interleaved_tuple():
    from octic_vits_tpu.ops.pallas_linear import linear_d8_qkv_wide

    x1, xef, w1, we, b = make_inputs(m=24, c=16, f=24)
    h = 2
    y1, yef = linear_d8_fused(x1, xef, w1, we, b, None, None, None, None,
                              False, True)
    want = _interleave_ref(np.asarray(y1), np.asarray(yef), h)
    got = linear_d8_qkv_wide(x1, xef, w1, we, b, h, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_qkv_wide_uninterleave_roundtrip():
    from octic_vits_tpu.ops.pallas_linear import (
        linear_d8_qkv_wide, uninterleave_wide,
    )

    x1, xef, w1, we, b = make_inputs(m=16, c=16, f=24)
    h = 2
    y1, yef = linear_d8_fused(x1, xef, w1, we, b, None, None, None, None,
                              False, True)
    wide = linear_d8_qkv_wide(x1, xef, w1, we, b, h, True)
    r1, ref = uninterleave_wide(wide, h)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(y1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(yef), atol=2e-5)


def test_qkv_wide_gradients_match_tuple_path():
    from octic_vits_tpu.ops.pallas_linear import linear_d8_qkv_wide

    x1, xef, w1, we, b = make_inputs(m=16, c=16, f=24)
    h = 2

    def loss_wide(args):
        y = linear_d8_qkv_wide(*args, h, True)
        return jnp.sum(jnp.sin(y))

    def loss_tuple(args):
        y1, yef = linear_d8_fused(*args, None, None, None, None, False, True)
        y = _interleave_ref(y1, yef, h)
        return jnp.sum(jnp.sin(y))

    gw = jax.grad(loss_wide)((x1, xef, w1, we, b))
    gt = jax.grad(loss_tuple)((x1, xef, w1, we, b))
    for i, (a, e) in enumerate(zip(gw, gt)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), atol=1e-4, err_msg=f"arg={i}"
        )


def make_mlp_inputs(m=24, c=16, h=32, seed=3, bias=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    x1 = jax.random.normal(ks[0], (4, m, c))
    xef = jax.random.normal(ks[1], (m, 4 * c))
    w1a = jax.random.normal(ks[2], (4, c, h)) * 0.1
    wea = jax.random.normal(ks[3], (2 * c, 2 * h)) * 0.1
    b1 = jax.random.normal(ks[4], (h,)) * 0.1 if bias else None
    w1b = jax.random.normal(ks[5], (4, h, c)) * 0.1
    web = jax.random.normal(ks[6], (2 * h, 2 * c)) * 0.1
    b2 = jax.random.normal(ks[7], (c,)) * 0.1 if bias else None
    return x1, xef, w1a, wea, b1, w1b, web, b2


def _mlp_two_kernel(x1, xef, w1a, wea, b1, w1b, web, b2):
    h1, hef = linear_d8_fused(
        x1, xef, w1a, wea, b1, None, None, None, None, True, True
    )
    return linear_d8_fused(
        h1, hef, w1b, web, b2, None, None, None, None, False, True
    )


def test_fused_mlp_matches_two_kernel_path():
    from octic_vits_tpu.ops.pallas_linear import mlp_d8_fused

    for bias in (True, False):
        args = make_mlp_inputs(bias=bias)
        ya, yefa = _mlp_two_kernel(*args)
        yb, yefb = mlp_d8_fused(*args, True)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(yefa), np.asarray(yefb), atol=1e-6
        )


def test_fused_mlp_gradients_match_two_kernel_path():
    from octic_vits_tpu.ops.pallas_linear import mlp_d8_fused

    args = make_mlp_inputs(m=16, c=8, h=16)

    def loss_two(a):
        y1, yef = _mlp_two_kernel(*a)
        return jnp.sum(jnp.sin(y1)) + jnp.sum(jnp.cos(yef))

    def loss_fused(a):
        y1, yef = mlp_d8_fused(*a, True)
        return jnp.sum(jnp.sin(y1)) + jnp.sum(jnp.cos(yef))

    ga = jax.grad(loss_two)(args)
    gb = jax.grad(loss_fused)(args)
    for i, (a, b) in enumerate(zip(ga, gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=f"arg={i}"
        )


def test_fused_mlp_module_path_matches_unfused():
    """MlpD8(fuse_mlp=True) == MlpD8(fuse_mlp=False) with identical params
    (both pallas paths, flat-E container)."""
    from octic_vits_tpu.layers.d8_layers import MlpD8

    b, n, c8 = 2, 6, 8
    dim = 8 * c8
    xs = tuple(
        jax.random.normal(jax.random.PRNGKey(30 + i), (b, n, c8))
        for i in range(4)
    ) + (jax.random.normal(jax.random.PRNGKey(40), (b, n, 4 * c8)),)
    base = MlpD8(hidden_features=2 * dim, use_pallas_linear=True)
    fused = MlpD8(hidden_features=2 * dim, use_pallas_linear=True,
                  fuse_mlp=True)
    params = base.init(jax.random.PRNGKey(1), xs)
    y0 = base.apply(params, xs)
    y1 = fused.apply(params, xs)
    for a, e in zip(y1, y0):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), atol=1e-5
        )
    # identical parameter trees (the fused path uses a param-only twin)
    p2 = fused.init(jax.random.PRNGKey(1), xs)
    t0 = jax.tree_util.tree_structure(params)
    t1 = jax.tree_util.tree_structure(p2)
    assert t0 == t1


def test_fused_mlp_packed_matches_tuple():
    """mlp_d8_fused_packed on the flat container == mlp_d8_fused on the
    split layout (fwd + all grads)."""
    from octic_vits_tpu.ops.pallas_linear import (
        mlp_d8_fused,
        mlp_d8_fused_packed,
    )

    c8, h8, m = 8, 16, 12
    ks = jax.random.split(jax.random.PRNGKey(55), 9)
    x1 = jax.random.normal(ks[0], (4, m, c8))
    xef = jax.random.normal(ks[1], (m, 4 * c8))
    w1a = jax.random.normal(ks[2], (4, c8, h8)) * 0.2
    wea = jax.random.normal(ks[3], (2 * c8, 2 * h8)) * 0.2
    b1 = jax.random.normal(ks[4], (h8,)) * 0.2
    w1b = jax.random.normal(ks[5], (4, h8, c8)) * 0.2
    web = jax.random.normal(ks[6], (2 * h8, 2 * c8)) * 0.2
    b2 = jax.random.normal(ks[7], (c8,)) * 0.2
    x = jnp.concatenate((x1[0], x1[1], x1[2], x1[3], xef), axis=-1)

    y1, yef = mlp_d8_fused(x1, xef, w1a, wea, b1, w1b, web, b2)
    y = mlp_d8_fused_packed(x, w1a, wea, b1, w1b, web, b2)
    y_ref = jnp.concatenate((y1[0], y1[1], y1[2], y1[3], yef), axis=-1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)

    def loss_ref(x1_, xef_, *ws):
        a, e = mlp_d8_fused(x1_, xef_, *ws)
        return jnp.sum(a ** 2) + jnp.sum(e ** 2)

    def loss_packed(x_, *ws):
        return jnp.sum(mlp_d8_fused_packed(x_, *ws) ** 2)

    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(
        x1, xef, w1a, wea, b1, w1b, web, b2)
    gp = jax.grad(loss_packed, argnums=tuple(range(7)))(
        x, w1a, wea, b1, w1b, web, b2)
    gx_ref = jnp.concatenate(
        (gr[0][0], gr[0][1], gr[0][2], gr[0][3], gr[1]), axis=-1)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx_ref),
                               atol=1e-4)
    for got, exp in zip(gp[1:], gr[2:]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=1e-4)
