"""Model-level tests.

The key fidelity gate mirrors the reference whole-model invariance test
(reference: experiments/test_equivariance.py:302-322): an invariant octic
ViT must produce identical logits for all 8 group-transformed inputs, and
DIFFERENT logits for a non-D8 transformation (negative control).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octic_vits_tpu.d8 import GROUP_ELEMENTS, image_space_group_action
from octic_vits_tpu.models import (
    OcticDinoVisionTransformer,
    OcticVisionTransformer,
    VisionTransformer,
    create_model,
    list_models,
)

IMG = (2, 32, 32, 3)


def nhwc_group_action(g, img):
    return jnp.moveaxis(
        image_space_group_action(g, jnp.moveaxis(img, -1, 1)), 1, -1
    )


@pytest.fixture(scope="module")
def invariant_model():
    # init_scale=1.0 so blocks genuinely mix the tokens: with the paper's
    # 1e-4 LayerScale a random shallow model is near-identity on the cls
    # token and both the invariance check and its negative control would be
    # vacuous at float32 noise level.
    model = OcticVisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=2,
        mlp_ratio=2.0, qkv_bias=True, invariant=True, num_classes=10,
        init_scale=1.0,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), IMG)
    params = model.init(jax.random.PRNGKey(1), img)
    return model, params, img


def test_invariant_model_is_invariant(invariant_model):
    model, params, img = invariant_model
    apply_fn = jax.jit(functools.partial(model.apply, params))
    base = apply_fn(img)
    assert base.shape == (2, 10)
    assert float(jnp.abs(base).max()) > 1e-4
    for g in GROUP_ELEMENTS[1:]:
        out = apply_fn(nhwc_group_action(g, img))
        np.testing.assert_allclose(base, out, atol=1e-4, err_msg=f"g={g}")


def test_invariant_model_negative_control(invariant_model):
    """Channel flip is NOT in D8 — logits must change
    (reference: experiments/test_equivariance.py:318-321)."""
    model, params, img = invariant_model
    apply_fn = functools.partial(model.apply, params)
    base = apply_fn(img)
    flipped = apply_fn(img[..., ::-1])
    assert float(jnp.abs(base - flipped).max()) > 1e-3


def test_hybrid_model_forward():
    model = OcticVisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=2,
        mlp_ratio=2.0, qkv_bias=True, num_classes=10,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), IMG)
    params = model.init(jax.random.PRNGKey(1), img)
    out = model.apply(params, img)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_hybrid_model_break_concat_order():
    """The hybrid break must concat in isotypic slot order
    A1|A2|B1|B2|E11|E21|E12|E22 (reference: octic_vits/model.py:200) —
    checked structurally via _break_to_flat."""
    from octic_vits_tpu.d8 import pack_8_to_5

    model = OcticVisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
        num_classes=0,
    )
    xs8 = tuple(jnp.full((1, 2, 8), float(i)) for i in range(8))
    flat = model._break_to_flat(pack_8_to_5(xs8))
    expected = jnp.concatenate([jnp.full((1, 2, 8), float(i)) for i in range(8)], -1)
    np.testing.assert_allclose(flat, expected)


def test_global_pool_model():
    model = OcticVisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
        global_pool=True, num_classes=5,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), IMG)
    params = model.init(jax.random.PRNGKey(1), img)
    out = model.apply(params, img)
    assert out.shape == (2, 5)


def test_register_tokens():
    model = OcticVisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
        num_register_tokens=3, num_classes=7,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), IMG)
    params = model.init(jax.random.PRNGKey(1), img)
    out = model.apply(params, img)
    assert out.shape == (2, 7)


def test_standard_vit_forward():
    model = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
        num_classes=10,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), IMG)
    params = model.init(jax.random.PRNGKey(1), img)
    out = model.apply(params, img)
    assert out.shape == (2, 10)


def test_dino_octic_interface():
    model = OcticDinoVisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=2,
        mlp_ratio=2.0,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), IMG)
    grid = (32 // 8) ** 2
    masks = jax.random.bernoulli(jax.random.PRNGKey(2), 0.3, (2, grid))
    params = model.init(jax.random.PRNGKey(1), img)
    ret = model.apply(params, img, masks, is_training=True)
    assert ret["x_norm_clstoken"].shape == (2, 64)
    assert ret["x_norm_patchtokens"].shape == (2, grid, 64)

    # multi-crop list path at two resolutions
    local = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
    outs = model.apply(
        params, [img, local], [masks, None],
        method=model.forward_features_list,
    )
    assert outs[0]["x_norm_patchtokens"].shape == (2, grid, 64)
    assert outs[1]["x_norm_patchtokens"].shape == (2, 4, 64)

    # intermediate layers for eval probes
    feats = model.apply(
        params, img, 2, method=model.get_intermediate_layers
    )
    assert len(feats) == 2 and feats[0].shape == (2, grid, 64)


def test_dino_mask_token_changes_output():
    model = OcticDinoVisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), IMG)
    params = model.init(jax.random.PRNGKey(1), img)
    grid = (32 // 8) ** 2
    no_mask = model.apply(params, img, None, is_training=True)
    masks = jnp.ones((2, grid), bool)
    masked = model.apply(params, img, masks, is_training=True)
    diff = jnp.abs(
        no_mask["x_norm_patchtokens"] - masked["x_norm_patchtokens"]
    ).max()
    assert float(diff) > 1e-4


def test_registry_names():
    names = list_models()
    for required in [
        "hybrid_deit_large_patch16",
        "hybrid_deit_huge_patch14",
        "d8_inv_early_deit_large_patch16",
        "d8_inv_early_deit_huge_patch14",
        "hybrid_dinov2_vit_large_patch16",
        "hybrid_dinov2_vit_huge_patch16",
        "d8_inv_early_dinov2_vit_large_patch16",
        "d8_inv_early_dinov2_vit_huge_patch16",
        "deit_large_patch16_LS",
        "deit_huge_patch14_LS",
        "dinov2_vit_large_patch16",
        "dinov2_vit_huge_patch16",
    ]:
        assert required in names, f"missing registry entry {required}"
    m = create_model("hybrid_vit_small_test")
    assert m.embed_dim == 64


def test_param_count_hybrid_huge():
    """Hybrid ViT-H/14 must have ~356M params (reference README.md:112-118).
    Uses shape-only init (no FLOPs)."""
    model = create_model("hybrid_deit_huge_patch14")
    img = jnp.zeros((1, 224, 224, 3))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img)
    )
    n = sum(np.prod(x.shape) for x in jax.tree.leaves(shapes))
    assert 340e6 < n < 372e6, f"param count {n/1e6:.1f}M out of range"


def test_dino_octic_packed_carry_matches():
    """OcticDinoVisionTransformer with packed_carry + packed-I/O kernels
    reproduces the plain path, including masked tokens."""
    kw = dict(img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=2,
              mlp_ratio=2.0)
    plain = OcticDinoVisionTransformer(**kw)
    packed = OcticDinoVisionTransformer(
        **kw, use_pallas_attention=True, use_pallas_linear=True,
        use_pallas_std_mlp=True, packed_carry=True, fuse_mlp=True,
        fuse_qkv=True, scan_blocks=False,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), IMG)
    grid = (32 // 8) ** 2
    masks = jax.random.bernoulli(jax.random.PRNGKey(2), 0.3, (2, grid))
    params = plain.init(jax.random.PRNGKey(1), img)
    ref = plain.apply(params, img, masks, is_training=True)
    got = packed.apply(params, img, masks, is_training=True)
    for key in ("x_norm_clstoken", "x_norm_patchtokens"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), atol=1e-4,
            err_msg=key,
        )
