"""hMLP stem, parallel-x2 block, finetune utils, invariant head factory."""

import jax
import jax.numpy as jnp
import numpy as np

from octic_vits_tpu.layers.vit_layers import HMLPStem, ParallelBlockx2


def test_hmlp_stem_shapes():
    stem = HMLPStem(embed_dim=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = stem.init(jax.random.PRNGKey(1), x)
    out = stem.apply(params, x)
    assert out.shape == (2, 4, 64)  # 32 / 16 = 2 per side


def test_parallel_block():
    blk = ParallelBlockx2(num_heads=2, layerscale_init=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    params = blk.init(jax.random.PRNGKey(1), x)
    out = blk.apply(params, x)
    assert out.shape == x.shape
    assert float(jnp.abs(out - x).max()) > 1e-3


def test_interpolate_vit_pos_embed():
    from octic_vits_tpu.utils.finetune import interpolate_vit_pos_embed

    pe = np.random.RandomState(0).randn(1, 16, 8).astype(np.float32)
    out = interpolate_vit_pos_embed(pe, new_grid=6)
    assert out.shape == (1, 36, 8)
    same = interpolate_vit_pos_embed(pe, new_grid=4)
    np.testing.assert_allclose(same, pe, atol=1e-5)


def test_attn_only_mask():
    from octic_vits_tpu.models import VisionTransformer
    from octic_vits_tpu.utils.finetune import attn_only_trainable_mask

    m = VisionTransformer(img_size=32, patch_size=8, embed_dim=32, depth=1,
                          num_heads=2, num_classes=4)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    mask = attn_only_trainable_mask(params)
    flat = dict(
        jax.tree_util.tree_flatten_with_path(mask)[0].__iter__()
    ) if False else jax.tree_util.tree_leaves_with_path(mask)
    names = {
        "/".join(str(getattr(k, "key", k)) for k in path): v for path, v in flat
    }
    assert any(v for n, v in names.items() if "attn" in n)
    assert not any(v for n, v in names.items() if "mlp" in n and "attn" not in n)
    assert names.get("cls_token", False)


def test_invariant_head_factory():
    from octic_vits_tpu.layers.invariants import InvariantHead

    head = InvariantHead(hidden_dim=32, num_classes=7, use_norm=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24))
    params = head.init(jax.random.PRNGKey(1), x)
    out = head.apply(params, x)
    assert out.shape == (2, 7)
