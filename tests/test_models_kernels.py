"""Whole-model checks with every fused kernel enabled (interpret mode):
invariance must hold and outputs must match the kernel-free model."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from octic_vits_tpu.d8 import GROUP_ELEMENTS, image_space_group_action
from octic_vits_tpu.models import OcticVisionTransformer

IMG = (2, 32, 32, 3)

KW = dict(
    img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=2,
    mlp_ratio=2.0, qkv_bias=True, invariant=True, num_classes=10,
    init_scale=1.0,
)


def nhwc_group_action(g, img):
    return jnp.moveaxis(
        image_space_group_action(g, jnp.moveaxis(img, -1, 1)), 1, -1
    )


def test_kernel_model_matches_plain_and_is_invariant():
    img = jax.random.normal(jax.random.PRNGKey(0), IMG)
    plain = OcticVisionTransformer(**KW)
    # the full bench.py inference configuration, incl. the flat-E carry and
    # the fused qkv+attention / fc1+GELU+fc2 kernels
    kernels = OcticVisionTransformer(
        **KW,
        use_pallas_attention=True, use_pallas_linear=True,
        use_pallas_std_mlp=True, flat_e_carry=True, fuse_mlp=True,
        fuse_qkv=True,
    )
    variables = plain.init(jax.random.PRNGKey(1), img)
    ref = plain.apply(variables, img)
    out = kernels.apply(variables, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    apply_fn = functools.partial(kernels.apply, variables)
    base = apply_fn(img)
    for g in GROUP_ELEMENTS[1:]:
        rot = apply_fn(nhwc_group_action(g, img))
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(rot), atol=2e-4, err_msg=f"g={g}"
        )
    # negative control
    flipped = apply_fn(img[..., ::-1])
    assert float(jnp.abs(base - flipped).max()) > 1e-3


def test_packed_carry_matches_plain():
    """packed_carry=True (ONE flat [B,N,C] trunk carry, packed-I/O kernels)
    reproduces the kernel-free model with the same parameter tree."""
    img = jax.random.normal(jax.random.PRNGKey(0), IMG)
    plain = OcticVisionTransformer(**KW)
    packed = OcticVisionTransformer(
        **KW,
        use_pallas_attention=True, use_pallas_linear=True,
        use_pallas_std_mlp=True, packed_carry=True, fuse_mlp=True,
        fuse_qkv=True,
    )
    variables = plain.init(jax.random.PRNGKey(1), img)
    ref = plain.apply(variables, img)
    out = packed.apply(variables, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_packed_carry_grads_match_plain():
    """Grad parity for the packed trunk carry under scan+remat — the
    training-path configuration of scripts/check_train_step_tpu.py --packed
    (fwd parity alone does not exercise the packed kernels' custom VJPs
    through the scan's backward replay). Both models use the scan trunk so
    they share one stacked parameter tree."""
    img = jax.random.normal(jax.random.PRNGKey(0), IMG)
    plain = OcticVisionTransformer(**KW, scan_blocks=True)
    packed = OcticVisionTransformer(
        **KW,
        scan_blocks=True, remat=True,
        use_pallas_attention=True, use_pallas_linear=True,
        use_pallas_std_mlp=True, packed_carry=True, fuse_mlp=True,
        fuse_qkv=True,
    )
    variables = plain.init(jax.random.PRNGKey(1), img)

    def loss(model, v, x):
        return jnp.sum(model.apply(v, x) ** 2)

    ref_val, ref_grad = jax.value_and_grad(
        lambda v: loss(plain, v, img))(variables)
    out_val, out_grad = jax.value_and_grad(
        lambda v: loss(packed, v, img))(variables)
    np.testing.assert_allclose(float(out_val), float(ref_val), rtol=1e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grad)
    flat_out = jax.tree_util.tree_leaves(out_grad)
    assert len(flat_ref) == len(flat_out)
    for (path, r), o in zip(flat_ref, flat_out):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=5e-3, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )
