"""Fused-epilogue block path (kernels + ls/residual epilogues) must match
the unfused block exactly, with an identical parameter tree."""

import jax
import jax.numpy as jnp
import numpy as np

from octic_vits_tpu.d8 import pack_8_to_5
from octic_vits_tpu.layers.d8_layers import BlockD8


def _inputs(b=2, n=7, c8=16):
    return pack_8_to_5(tuple(
        jax.random.normal(jax.random.PRNGKey(i), (b, n, c8)) for i in range(8)
    ))


def test_fused_block_matches_unfused():
    xs = _inputs()
    base = BlockD8(num_heads=4, qkv_bias=True, layerscale_init=0.3)
    fused = BlockD8(
        num_heads=4, qkv_bias=True, layerscale_init=0.3,
        use_pallas_linear=True, use_pallas_attention=True,
        fuse_block_epilogues=True,
    )
    variables = base.init(jax.random.PRNGKey(0), xs)
    v2 = fused.init(jax.random.PRNGKey(0), xs)
    # identical param trees
    s1 = jax.tree.map(lambda x: x.shape, variables["params"])
    s2 = jax.tree.map(lambda x: x.shape, v2["params"])
    assert s1 == s2, f"param trees differ:\n{s1}\n{s2}"

    ref = base.apply(variables, xs)
    out = fused.apply(variables, xs)
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref[i]), atol=5e-5,
            err_msg=f"slot {i}",
        )


def test_mlp_branch_block_matches_unfused():
    """use_pallas_linear WITHOUT fuse_block_epilogues takes the fused
    MLP-branch kernel path — must equal the baseline block."""
    xs = _inputs()
    base = BlockD8(num_heads=4, qkv_bias=True, layerscale_init=0.3)
    fused = BlockD8(
        num_heads=4, qkv_bias=True, layerscale_init=0.3,
        use_pallas_linear=True, use_pallas_attention=True,
    )
    variables = base.init(jax.random.PRNGKey(0), xs)
    v2 = fused.init(jax.random.PRNGKey(0), xs)
    s1 = jax.tree.map(lambda x: x.shape, variables["params"])
    s2 = jax.tree.map(lambda x: x.shape, v2["params"])
    assert s1 == s2, f"param trees differ:\n{s1}\n{s2}"
    ref = base.apply(variables, xs)
    out = fused.apply(variables, xs)
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref[i]), atol=5e-5,
            err_msg=f"slot {i}",
        )

    def loss(mod, v):
        o = mod.apply(v, xs)
        return sum(jnp.sum(jnp.sin(t)) for t in o)

    g_ref = jax.grad(lambda v: loss(base, v))(variables)
    g_out = jax.grad(lambda v: loss(fused, v))(variables)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_out),
    ):
        name = "/".join(str(getattr(k, "key", k)) for k in pa)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name
        )


def test_fused_block_gradients():
    xs = _inputs(b=1, n=5, c8=8)
    base = BlockD8(num_heads=2, qkv_bias=True, layerscale_init=0.3)
    fused = BlockD8(
        num_heads=2, qkv_bias=True, layerscale_init=0.3,
        use_pallas_linear=True, use_pallas_attention=True,
        fuse_block_epilogues=True,
    )
    variables = base.init(jax.random.PRNGKey(0), xs)

    def loss(mod, v):
        out = mod.apply(v, xs)
        return sum(jnp.sum(jnp.sin(o)) for o in out)

    g_ref = jax.grad(lambda v: loss(base, v))(variables)
    g_out = jax.grad(lambda v: loss(fused, v))(variables)
    for (pa, a), (pb, bb) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_out),
    ):
        name = "/".join(str(getattr(k, "key", k)) for k in pa)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=5e-4, err_msg=name
        )


def test_fused_block_equivariance():
    import functools

    from tests.test_layers_equivariance import check_iso_to_iso, init_and_bind

    xs = _inputs()
    mod = BlockD8(
        num_heads=4, qkv_bias=True, layerscale_init=0.3,
        use_pallas_linear=True, use_pallas_attention=True,
        fuse_block_epilogues=True,
    )
    check_iso_to_iso(init_and_bind(mod, xs), shape=(2, 7, 16))


def test_block_packed_flat_carry_matches_tuple():
    """BlockD8 on the flat packed container (pack_5_to_flat layout) must
    equal the tuple path bit-for-bit-ish on the same params — plain and
    with all Pallas kernels (interpret on CPU) — and create the identical
    parameter tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from octic_vits_tpu.d8.group import pack_5_to_flat

    b, n, c8 = 2, 9, 16
    xs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (b, n, c8)) for i in range(4)
    ) + (jax.random.normal(jax.random.PRNGKey(9), (b, n, 2, 2 * c8)),)
    X = pack_5_to_flat(xs)
    for kernels in (False, True):
        blk = BlockD8(
            num_heads=2, qkv_bias=True, layerscale_init=1e-1,
            use_pallas_attention=kernels, use_pallas_linear=kernels,
            use_pallas_gelu=kernels,
        )
        v = blk.init(jax.random.PRNGKey(0), xs)
        v2 = blk.init(jax.random.PRNGKey(1), X)
        assert (
            jax.tree.map(lambda a: a.shape, v["params"])
            == jax.tree.map(lambda a: a.shape, v2["params"])
        )
        want = pack_5_to_flat(blk.apply(v, xs))
        got = blk.apply(v, X)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6,
            err_msg=f"kernels={kernels}",
        )
        # droppath branch runs and stays finite
        out_d = blk.apply(
            v, X, False, rngs={"dropout": jax.random.PRNGKey(5)}
        )
        assert bool(jnp.all(jnp.isfinite(out_d)))
