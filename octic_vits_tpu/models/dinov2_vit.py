"""DINOv2-interface backbones: the standard `DinoVisionTransformer` baseline
and the `OcticDinoVisionTransformer`.

Both expose the SSL training interface: `prepare_tokens_with_masks` (iBOT
mask-token substitution), `forward_features` returning the token dict,
multi-crop `forward_features_list`, and `get_intermediate_layers` for eval
probes (reference: dinov2/models/vision_transformer.py:215-325,
octic_vits/dinov2_models.py:41-267).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from octic_vits_tpu.d8.group import pack_8_to_5, unpack_5_to_8
from octic_vits_tpu.d8.posembed import resize_grid
from octic_vits_tpu.layers.vit_layers import Block, PatchEmbed, _trunc_normal
from octic_vits_tpu.models.octic_vit import OcticVisionTransformer

Array = jnp.ndarray


class DinoVisionTransformer(nn.Module):
    """Standard DINOv2 ViT baseline (reference:
    dinov2/models/vision_transformer.py:57-384). NHWC input."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    drop_path_rate: float = 0.0
    layerscale_init: Optional[float] = 1.0
    num_register_tokens: int = 0
    ffn_layer: str = "mlp"
    scan_blocks: bool = False  # lax.scan trunk (memory/compile at H-scale)
    remat: bool = False        # selective per-block rematerialization
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
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim),
            self.param_dtype,
        )
        # pos embed includes the cls slot (reference layout: [1, N+1, C])
        self.pos_embed = self.param(
            "pos_embed", _trunc_normal(0.02), (1, grid * grid + 1, self.embed_dim),
            self.param_dtype,
        )
        if self.num_register_tokens > 0:
            self.register_tokens = self.param(
                "register_tokens", nn.initializers.normal(1e-6),
                (1, self.num_register_tokens, self.embed_dim), self.param_dtype,
            )
        self.mask_token = self.param(
            "mask_token", nn.initializers.zeros, (1, self.embed_dim), self.param_dtype
        )
        block_cfg = dict(
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            proj_bias=self.proj_bias,
            ffn_bias=self.ffn_bias,
            drop_path=self.drop_path_rate,
            layerscale_init=self.layerscale_init,
            norm_eps=1e-6,
            ffn_layer=self.ffn_layer,
            use_pallas_attention=self.use_pallas_attention,
            use_pallas_mlp=self.use_pallas_mlp,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if self.scan_blocks:
            from octic_vits_tpu.models.scan_blocks import make_scanned_stack

            self.block_stack = make_scanned_stack(
                "standard", block_cfg, self.depth, "blocks",
                remat=self.remat,
            )
            self.blocks = []
        else:
            self.blocks = [
                Block(**block_cfg, name=f"blocks_{i}")
                for i in range(self.depth)
            ]
        self.norm = nn.LayerNorm(epsilon=1e-6, param_dtype=self.param_dtype)

    def _interpolated_pos(self, grid_hw):
        grid = self.img_size // self.patch_size
        cls_pos = self.pos_embed[:, :1]
        patch_pos = self.pos_embed[:, 1:].reshape(grid, grid, self.embed_dim)
        patch_pos = resize_grid(patch_pos, grid_hw)
        return cls_pos, patch_pos.reshape(1, -1, self.embed_dim)

    def prepare_tokens_with_masks(self, x: Array, masks: Optional[Array] = None) -> Array:
        b, h, w, _ = x.shape
        grid_hw = (h // self.patch_size, w // self.patch_size)
        x = self.patch_embed(x)
        if masks is not None:
            x = jnp.where(
                masks[..., None], self.mask_token[None].astype(x.dtype), x
            )
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype), (b, 1, self.embed_dim))
        x = jnp.concatenate((cls, x), axis=1)
        cls_pos, patch_pos = self._interpolated_pos(grid_hw)
        pos = jnp.concatenate((cls_pos, patch_pos), axis=1).astype(x.dtype)
        x = x + pos
        if self.num_register_tokens > 0:
            regs = jnp.broadcast_to(
                self.register_tokens.astype(x.dtype),
                (b, self.num_register_tokens, self.embed_dim),
            )
            x = jnp.concatenate((x[:, :1], regs, x[:, 1:]), axis=1)
        return x

    def _run_blocks(self, x: Array, deterministic: bool) -> Array:
        if self.scan_blocks:
            x, _ = self.block_stack(x, deterministic)
            return x
        for blk in self.blocks:
            x = blk(x, deterministic)
        return x

    def _output_dict(self, x: Array, masks):
        x_norm = self.norm(x)
        r = self.num_register_tokens
        return {
            "x_norm_clstoken": x_norm[:, 0],
            "x_norm_regtokens": x_norm[:, 1 : r + 1],
            "x_norm_patchtokens": x_norm[:, r + 1 :],
            "x_prenorm": x,
            "masks": masks,
        }

    def forward_features(self, x, masks=None, deterministic: bool = True):
        if isinstance(x, (list, tuple)):
            return self.forward_features_list(x, masks, deterministic)
        x = self.prepare_tokens_with_masks(x, masks)
        x = self._run_blocks(x, deterministic)
        return self._output_dict(x, masks)

    def forward_features_list(self, x_list, masks_list, deterministic: bool = True):
        xs = [
            self.prepare_tokens_with_masks(x, m) for x, m in zip(x_list, masks_list)
        ]
        xs = [self._run_blocks(x, deterministic) for x in xs]
        return [self._output_dict(x, m) for x, m in zip(xs, masks_list)]

    def get_intermediate_layers(
        self,
        x: Array,
        n: Union[int, Sequence[int]] = 1,
        reshape: bool = False,
        return_class_token: bool = False,
        norm: bool = True,
    ):
        z = self.prepare_tokens_with_masks(x)
        take = (
            list(range(self.depth - n, self.depth)) if isinstance(n, int) else list(n)
        )
        outputs = []
        for i, blk in enumerate(self.blocks):
            z = blk(z, True)
            if i in take:
                outputs.append(z)
        if norm:
            outputs = [self.norm(o) for o in outputs]
        cls_tokens = [o[:, 0] for o in outputs]
        outputs = [o[:, 1 + self.num_register_tokens :] for o in outputs]
        if reshape:
            b, h, w, _ = x.shape
            gh, gw = h // self.patch_size, w // self.patch_size
            outputs = [o.reshape(b, gh, gw, -1) for o in outputs]
        if return_class_token:
            return tuple(zip(outputs, cls_tokens))
        return tuple(outputs)

    def __call__(self, x, masks=None, deterministic: bool = True, is_training: bool = False):
        ret = self.forward_features(x, masks, deterministic)
        if is_training:
            return ret
        return ret["x_norm_clstoken"]


class OcticDinoVisionTransformer(OcticVisionTransformer):
    """Octic backbone with the DINOv2 SSL interface
    (reference: octic_vits/dinov2_models.py:41-267).

    Deviations encoded from the reference subclass: qkv/proj/ffn biases on,
    cls/pos added AFTER pos-embed in 8-tuple form, per-irrep mask token
    (only A1 trainable, others frozen zeros -> stored as the single A1
    parameter), head = identity."""

    qkv_bias: bool = True
    num_classes: int = 0
    cls_init: str = "dinov2"

    def setup(self):
        super().setup()
        c8 = self.embed_dim // 8
        self.mask_token_a1 = self.param(
            "mask_token_a1", nn.initializers.zeros, (1, c8), self.param_dtype
        )

    def prepare_tokens_with_masks(self, x: Array, masks: Optional[Array] = None):
        b, h, w, _ = x.shape
        grid_hw = (h // self.patch_size, w // self.patch_size)
        xs8 = unpack_5_to_8(self.patch_embed(x))
        if masks is not None:
            m = masks[..., None]
            mask_tokens = (self.mask_token_a1[None].astype(xs8[0].dtype),) + (
                jnp.zeros((1, 1, self.embed_dim // 8), xs8[0].dtype),
            ) * 7
            xs8 = tuple(
                jnp.where(m, t, x_i) for t, x_i in zip(mask_tokens, xs8)
            )
        pos8 = self._pos_embed_8tuple(grid_hw)
        dt = xs8[0].dtype
        xs8 = tuple(
            x_i + p.reshape(-1, p.shape[-1]).astype(dt) for x_i, p in zip(xs8, pos8)
        )
        xs = pack_8_to_5(xs8)
        return self._cat_cls_and_registers(xs, b)

    def _run_to_break(self, xs, deterministic):
        if self.packed_carry:
            # ONE flat [B, N, C] trunk carry (see OcticVisionTransformer)
            from octic_vits_tpu.d8.group import pack_5_to_flat

            xs = pack_5_to_flat(xs)
        elif self.flat_e_carry:
            # lane-aligned flat-E trunk carry (see OcticVisionTransformer)
            e = xs[4]
            xs = xs[:4] + (e.reshape(e.shape[0], e.shape[1], -1),)
        if self.scan_blocks:
            xs, _ = self.octic_stack(xs, deterministic)
            return self._break_to_flat(xs)
        for blk in self.blocks[: self.break_layer]:
            xs = blk(xs, deterministic)
        return self._break_to_flat(xs)

    def _run_after_break(self, z, deterministic):
        if self.scan_blocks:
            z, _ = self.standard_stack(z, deterministic)
            return z
        for blk in self.blocks[self.break_layer :]:
            z = blk(z, deterministic)
        return z

    def _output_dict(self, z, masks):
        z_norm = self.norm(z)
        r = self.num_register_tokens
        return {
            "x_norm_clstoken": z_norm[:, 0],
            "x_norm_regtokens": z_norm[:, 1 : r + 1],
            "x_norm_patchtokens": z_norm[:, r + 1 :],
            "x_prenorm": z,
            "masks": masks,
        }

    def forward_features(self, x, masks=None, deterministic: bool = True):
        if isinstance(x, (list, tuple)) and not isinstance(x, jnp.ndarray):
            return self.forward_features_list(x, masks, deterministic)
        xs = self.prepare_tokens_with_masks(x, masks)
        z = self._run_to_break(xs, deterministic)
        z = self._run_after_break(z, deterministic)
        return self._output_dict(z, masks)

    def forward_features_list(self, x_list, masks_list, deterministic: bool = True):
        xs_list = [
            self.prepare_tokens_with_masks(x, m) for x, m in zip(x_list, masks_list)
        ]
        zs = [self._run_to_break(xs, deterministic) for xs in xs_list]
        zs = [self._run_after_break(z, deterministic) for z in zs]
        return [self._output_dict(z, m) for z, m in zip(zs, masks_list)]

    def get_intermediate_layers(
        self,
        x: Array,
        n: Union[int, Sequence[int]] = 1,
        reshape: bool = False,
        return_class_token: bool = False,
        norm: bool = True,
    ):
        assert not self.scan_blocks, (
            "get_intermediate_layers requires unrolled blocks (scan_blocks=False)"
        )
        take = (
            list(range(self.depth - n, self.depth)) if isinstance(n, int) else list(n)
        )
        assert all(i >= self.break_layer for i in take), (
            "intermediate layers must be past the equivariance break"
            f" (got {take}, break at {self.break_layer})"
        )
        xs = self.prepare_tokens_with_masks(x)
        z = self._run_to_break(xs, True)
        outputs = []
        for i, blk in enumerate(self.blocks[self.break_layer :], self.break_layer):
            z = blk(z, True)
            if i in take:
                outputs.append(z)
        if norm:
            outputs = [self.norm(o) for o in outputs]
        cls_tokens = [o[:, 0] for o in outputs]
        outputs = [o[:, 1 + self.num_register_tokens :] for o in outputs]
        if reshape:
            b, h, w, _ = x.shape
            gh, gw = h // self.patch_size, w // self.patch_size
            outputs = [o.reshape(b, gh, gw, -1) for o in outputs]
        if return_class_token:
            return tuple(zip(outputs, cls_tokens))
        return tuple(outputs)

    def __call__(self, x, masks=None, deterministic: bool = True, is_training: bool = False):
        ret = self.forward_features(x, masks, deterministic)
        if is_training:
            return ret
        return ret["x_norm_clstoken"]
