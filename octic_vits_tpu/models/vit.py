"""Standard ViT baselines.

`VisionTransformer` is the DeiT III LayerScale ViT used as the supervised
baseline (reference: deit/vit.py:256-393); `DinoVisionTransformer` (see
`octic_vits_tpu.models.dinov2_vit`) is the SSL baseline. Both exist so the
octic models have in-framework baselines for the paper's comparison tables.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from octic_vits_tpu.layers.vit_layers import Block, PatchEmbed, _trunc_normal

Array = jnp.ndarray


class VisionTransformer(nn.Module):
    """DeiT III-style ViT with LayerScale (reference: deit/vit.py:256-393).

    NHWC input; pos-embed is per-patch (no cls slot), cls token prepended
    after the pos add, classification from the cls token."""

    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_scale: Optional[float] = 1e-4
    # torch nn.LayerNorm default — deit/vit.py:275 uses it unchanged (the
    # octic + DINOv2 models use 1e-6; see octic_vit.py / dinov2_vit.py)
    norm_eps: float = 1e-5
    global_pool: bool = False
    scan_blocks: bool = False
    remat: bool = False
    scan_unroll: int = 1
    scan_split_transpose: bool = False
    use_pallas_attention: bool = False
    use_pallas_mlp: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def setup(self):
        grid = self.img_size // self.patch_size
        self.patch_embed = PatchEmbed(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.pos_embed = self.param(
            "pos_embed", _trunc_normal(0.02), (1, grid * grid, self.embed_dim),
            self.param_dtype,
        )
        self.cls_token = self.param(
            "cls_token", _trunc_normal(0.02), (1, 1, self.embed_dim), self.param_dtype
        )
        block_cfg = dict(
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop_rate,
            drop_path=self.drop_path_rate,
            layerscale_init=self.init_scale,
            norm_eps=self.norm_eps,
            use_pallas_attention=self.use_pallas_attention,
            use_pallas_mlp=self.use_pallas_mlp,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if self.scan_blocks:
            from octic_vits_tpu.models.scan_blocks import make_scanned_stack

            self.block_stack = make_scanned_stack(
                "standard", block_cfg, self.depth, "blocks", remat=self.remat,
                unroll=self.scan_unroll,
                split_transpose=self.scan_split_transpose,
            )
            self.blocks = []
        else:
            self.blocks = [
                Block(**block_cfg, name=f"blocks_{i}") for i in range(self.depth)
            ]
        self.norm = nn.LayerNorm(
            epsilon=self.norm_eps, param_dtype=self.param_dtype
        )
        if self.num_classes > 0:
            self.head = nn.Dense(
                self.num_classes,
                kernel_init=_trunc_normal(0.02),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )

    def forward_features(self, x: Array, deterministic: bool = True) -> Array:
        b = x.shape[0]
        x = self.patch_embed(x)
        x = x + self.pos_embed.astype(x.dtype)
        cls = jnp.broadcast_to(
            self.cls_token.astype(x.dtype), (b, 1, self.embed_dim)
        )
        x = jnp.concatenate((cls, x), axis=1)
        if self.scan_blocks:
            x, _ = self.block_stack(x, deterministic)
        else:
            for blk in self.blocks:
                x = blk(x, deterministic)
        x = self.norm(x)
        return jnp.mean(x[:, 1:], axis=1) if self.global_pool else x[:, 0]

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        z = self.forward_features(x, deterministic)
        if self.drop_rate and not deterministic:
            z = nn.Dropout(self.drop_rate, deterministic=False)(z)
        if self.num_classes > 0:
            z = self.head(z)
        return z

    @staticmethod
    def no_weight_decay() -> set:
        return {"pos_embed", "cls_token"}
