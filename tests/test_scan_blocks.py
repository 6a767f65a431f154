"""scan_blocks (lax.scan trunk) must be numerically identical to the
unrolled block list given restructured parameters."""

import jax
import jax.numpy as jnp
import numpy as np

from octic_vits_tpu.models import OcticVisionTransformer, VisionTransformer


def stack_octic_params(unrolled, depth, break_layer):
    """blocks_i params -> scan layout: octic_blocks/block (stacked over the
    octic half) + standard_blocks/block (stacked over the rest)."""
    out = {k: v for k, v in unrolled.items() if not k.startswith("blocks_")}

    def stack(idxs):
        trees = [unrolled[f"blocks_{i}"] for i in idxs]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    out["octic_blocks"] = {"block": stack(range(break_layer))}
    out["standard_blocks"] = {"block": stack(range(break_layer, depth))}
    return out


def test_scan_matches_unrolled_octic():
    kw = dict(
        img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=2,
        mlp_ratio=2.0, qkv_bias=True, num_classes=10, init_scale=1.0,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    unrolled_model = OcticVisionTransformer(**kw)
    params = unrolled_model.init(jax.random.PRNGKey(1), img)["params"]
    ref = unrolled_model.apply({"params": params}, img)

    scan_model = OcticVisionTransformer(**kw, scan_blocks=True)
    scan_params = stack_octic_params(params, 4, 2)
    out = scan_model.apply({"params": scan_params}, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_scan_matches_unrolled_standard():
    kw = dict(
        img_size=32, patch_size=8, embed_dim=32, depth=3, num_heads=2,
        num_classes=5, qkv_bias=True,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    unrolled = VisionTransformer(**kw)
    params = unrolled.init(jax.random.PRNGKey(1), img)["params"]
    ref = unrolled.apply({"params": params}, img)

    scan_model = VisionTransformer(**kw, scan_blocks=True)
    blocks = [params[f"blocks_{i}"] for i in range(3)]
    scan_params = {
        k: v for k, v in params.items() if not k.startswith("blocks_")
    }
    scan_params["blocks"] = {"block": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)}
    out = scan_model.apply({"params": scan_params}, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
