"""Standard DinoVisionTransformer baseline + SwiGLU FFN coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from octic_vits_tpu.layers.vit_layers import SwiGLUFFN
from octic_vits_tpu.models import DinoVisionTransformer


def test_swiglu_ffn():
    ffn = SwiGLUFFN(hidden_features=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    params = ffn.init(jax.random.PRNGKey(1), x)
    out = ffn.apply(params, x)
    assert out.shape == x.shape
    assert float(jnp.abs(out).max()) > 1e-4


def test_dino_standard_interface():
    model = DinoVisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        num_register_tokens=2, layerscale_init=1e-5,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    grid = 16
    masks = jax.random.bernoulli(jax.random.PRNGKey(1), 0.3, (2, grid))
    params = model.init(jax.random.PRNGKey(2), img)
    ret = model.apply(params, img, masks, is_training=True)
    assert ret["x_norm_clstoken"].shape == (2, 32)
    assert ret["x_norm_regtokens"].shape == (2, 2, 32)
    assert ret["x_norm_patchtokens"].shape == (2, grid, 32)

    feats = model.apply(params, img, 2, method=model.get_intermediate_layers)
    assert len(feats) == 2 and feats[0].shape == (2, grid, 32)

    # different-resolution input exercises pos-embed interpolation
    img2 = jax.random.normal(jax.random.PRNGKey(3), (2, 48, 48, 3))
    out2 = model.apply(params, img2)
    assert out2.shape == (2, 32)


def test_dino_standard_swiglu_variant():
    model = DinoVisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=1, num_heads=2,
        ffn_layer="swiglu",
    )
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), img)
    out = model.apply(params, img)
    assert out.shape == (1, 32)
    assert bool(jnp.isfinite(out).all())
