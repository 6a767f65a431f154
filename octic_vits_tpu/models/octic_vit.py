"""Octic Vision Transformer (flagship model).

A hybrid D8-equivariant ViT: the first `break_layer` blocks operate on the
isotypic 5-tuple; at the break the tuple is either concatenated back to a
plain `[B, N, C]` tensor (hybrid) or invariantized + projected (inv-early),
and standard ViT blocks finish the network
(reference: octic_vits/model.py:25-235).

TPU-first: NHWC inputs, patchify-matmul lifting embed, one jittable
forward; the DeiT III `Layer_scale_init_Block(D8)` and DINOv2 `Block(D8)`
variants are the same computation and differ only in `layerscale_init`.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from octic_vits_tpu.d8.group import SQRT2_OVER_2, pack_8_to_5, unpack_5_to_8
from octic_vits_tpu.d8.posembed import resize_posembed, unfold_quadrant
from octic_vits_tpu.layers.d8_layers import BlockD8, PatchEmbedD8
from octic_vits_tpu.layers.invariants import INVARIANTS
from octic_vits_tpu.layers.vit_layers import Block, _trunc_normal

Array = jnp.ndarray


class OcticVisionTransformer(nn.Module):
    """See module docstring. Config mirrors the reference constructor
    (reference: octic_vits/model.py:49-70) with the block classes replaced
    by `layerscale_init` (DeiT III: 1e-4, DINOv2: 1e-5 — the DeiT gamma
    Affine(bias=False) and DINOv2 LayerScale are the same map)."""

    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    proj_bias: bool = True
    ffn_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_scale: float = 1e-4  # layerscale init for BOTH block families
    num_register_tokens: int = 0
    global_pool: bool = False
    invariant: bool = False
    invariant_kind: str = "power_spectrum"
    octic_equi_break_layer: Optional[int] = None  # None = depth // 2
    cls_init: str = "deit"  # "deit": trunc_normal(0.16); "dinov2": normal(1e-6)
    scan_blocks: bool = False  # lax.scan trunk: ~depth-times faster compiles
    remat: bool = False        # per-block rematerialization (training memory)
    # carry E through the octic trunk as ONE flat [B, N, C/2] array
    # ([row0|row1]) instead of [B, N, 2, C/4]: every E elementwise op,
    # slice, and scan-carry then runs on plain lane-aligned 2-D tiles —
    # no [.., 2, C/4] tiled-layout relayouts anywhere in the trunk. All
    # layers detect the container (math identical); params unchanged.
    flat_e_carry: bool = False
    # carry the WHOLE octic residual stream as ONE flat packed [B, N, C]
    # array (d8/group.py:pack_5_to_flat): norm/LayerScale/droppath/residual
    # run as full-width lane-aligned passes and the scan carries a single
    # array. Requires fuse_qkv + fuse_mlp (the packed-I/O kernels slice the
    # per-irrep views in VMEM); math identical, params unchanged.
    packed_carry: bool = False
    scan_unroll: int = 1            # lax.scan unroll for both trunks
    scan_split_transpose: bool = False  # scan bwd as a separate scan
    use_pallas_gelu: bool = False
    use_pallas_linear: bool = False
    use_pallas_attention: bool = False
    use_pallas_std_mlp: bool = False
    use_wide_qkv: bool = False  # wide-1d octic attention qkv (AttentionD8)
    # run the octic qkv INSIDE the attention kernel (weights VMEM-resident,
    # [B,N,3C] qkv never hits HBM). Requires flat_e_carry. See AttentionD8.
    fuse_qkv: bool = False
    fuse_mlp_branch: bool = False
    # single-kernel fc1+GELU+fc2 for the octic MLP (hidden stays in VMEM)
    fuse_mlp: bool = False
    fuse_block_epilogues: bool = False  # ls+residual into proj/fc2 kernels
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @property
    def break_layer(self) -> int:
        if self.octic_equi_break_layer is None:
            assert self.depth % 2 == 0, "depth must be even"
            return self.depth // 2
        assert 0 <= self.octic_equi_break_layer < self.depth
        return self.octic_equi_break_layer

    def setup(self):
        assert self.embed_dim % 8 == 0, "embed_dim must be divisible by 8"
        c8 = self.embed_dim // 8
        grid = self.img_size // self.patch_size
        assert grid % 2 == 0, "patch grid must be even for the quadrant pos-embed"
        std = 8 * 0.02  # reference init std (octic_vits/model.py:147)

        self.patch_embed = PatchEmbedD8(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        # 6 quadrant tensors stacked: [6, grid/2, grid/2, C/8]
        self.pos_embed = self.param(
            "pos_embed",
            _trunc_normal(SQRT2_OVER_2 * std),
            (6, grid // 2, grid // 2, c8),
            self.param_dtype,
        )
        if not self.global_pool:
            # Only the A1 slot is trainable in the reference ParameterList;
            # the other slots are zeros(requires_grad=False) == constants,
            # so we store only A1 (reference: octic_vits/model.py:99-106).
            cls_init = (
                _trunc_normal(std)
                if self.cls_init == "deit"
                else nn.initializers.normal(1e-6)
            )
            self.cls_token_a1 = self.param(
                "cls_token_a1", cls_init, (1, 1, c8), self.param_dtype
            )
        if self.num_register_tokens > 0:
            self.register_tokens_a1 = self.param(
                "register_tokens_a1",
                nn.initializers.normal(1e-6),
                (1, self.num_register_tokens, c8),
                self.param_dtype,
            )
        if self.invariant:
            self.invariantization = INVARIANTS[self.invariant_kind](dim=self.embed_dim)
            self.invariant_proj = nn.Dense(
                self.embed_dim,
                kernel_init=_trunc_normal(0.02),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )

        octic_cfg = dict(
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            proj_bias=self.proj_bias,
            ffn_bias=self.ffn_bias,
            drop=self.drop_rate,
            attn_drop=self.attn_drop_rate,
            drop_path=self.drop_path_rate,
            layerscale_init=self.init_scale,
            use_pallas_gelu=self.use_pallas_gelu,
            use_pallas_linear=self.use_pallas_linear,
            use_pallas_attention=self.use_pallas_attention,
            use_wide_qkv=self.use_wide_qkv,
            fuse_qkv=self.fuse_qkv,
            fuse_mlp_branch=self.fuse_mlp_branch,
            fuse_mlp=self.fuse_mlp,
            fuse_block_epilogues=self.fuse_block_epilogues,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        std_cfg = dict(
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            proj_bias=self.proj_bias,
            ffn_bias=self.ffn_bias,
            drop=self.drop_rate,
            attn_drop=self.attn_drop_rate,
            drop_path=self.drop_path_rate,
            layerscale_init=self.init_scale,
            norm_eps=1e-6,
            use_pallas_attention=self.use_pallas_attention,
            use_pallas_mlp=self.use_pallas_std_mlp,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if self.scan_blocks:
            from octic_vits_tpu.models.scan_blocks import make_scanned_stack

            self.octic_stack = make_scanned_stack(
                "octic", octic_cfg, self.break_layer, "octic_blocks",
                remat=self.remat, unroll=self.scan_unroll,
                split_transpose=self.scan_split_transpose,
            )
            self.standard_stack = make_scanned_stack(
                "standard", std_cfg, self.depth - self.break_layer,
                "standard_blocks", remat=self.remat,
                unroll=self.scan_unroll,
                split_transpose=self.scan_split_transpose,
            )
            self.blocks = []
        else:
            self.blocks = [
                BlockD8(**octic_cfg, name=f"blocks_{i}")
                if i < self.break_layer
                else Block(**std_cfg, name=f"blocks_{i}")
                for i in range(self.depth)
            ]
        self.norm = nn.LayerNorm(epsilon=1e-6, param_dtype=self.param_dtype)
        if self.num_classes > 0:
            self.head = nn.Dense(
                self.num_classes,
                kernel_init=_trunc_normal(0.02),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )

    # ---- token preparation -------------------------------------------------

    def _pos_embed_8tuple(self, grid_hw: Tuple[int, int]):
        pos8 = unfold_quadrant(tuple(self.pos_embed[i] for i in range(6)), dim=0)
        return resize_posembed(pos8, grid_hw)

    def _add_pos(self, xs, grid_hw):
        pos8 = self._pos_embed_8tuple(grid_hw)
        pos5 = pack_8_to_5(pos8)
        dt = xs[0].dtype
        return tuple(
            x + p.reshape((-1,) + p.shape[2:]).astype(dt) for x, p in zip(xs, pos5)
        )

    def _cat_cls_and_registers(self, xs, batch):
        c8 = self.embed_dim // 8
        dt = xs[0].dtype
        if not self.global_pool:
            cls_a1 = jnp.broadcast_to(self.cls_token_a1.astype(dt), (batch, 1, c8))
            zeros1 = jnp.zeros_like(cls_a1)
            zeros_e = jnp.zeros((batch, 1, 2, 2 * c8), dt)
            cls5 = (cls_a1, zeros1, zeros1, zeros1, zeros_e)
            xs = tuple(jnp.concatenate((c, x), axis=1) for c, x in zip(cls5, xs))
        if self.num_register_tokens > 0:
            r = self.num_register_tokens
            reg_a1 = jnp.broadcast_to(
                self.register_tokens_a1.astype(dt), (batch, r, c8)
            )
            zeros1 = jnp.zeros_like(reg_a1)
            zeros_e = jnp.zeros((batch, r, 2, 2 * c8), dt)
            reg5 = (reg_a1, zeros1, zeros1, zeros1, zeros_e)
            xs = tuple(
                jnp.concatenate((x[:, :1], g, x[:, 1:]), axis=1)
                for g, x in zip(reg5, xs)
            )
        return xs

    def _break_to_flat(self, xs) -> Array:
        """Equivariance break: invariantize+project or concat to [B,N,C]
        in isotypic slot order (reference: octic_vits/model.py:196-200)."""
        if not isinstance(xs, (tuple, list)):  # flat packed carry
            from octic_vits_tpu.d8.group import flat_to_break, unpack_flat_to_5

            if self.invariant:
                return self.invariant_proj(
                    self.invariantization(unpack_flat_to_5(xs))
                )
            return flat_to_break(xs)
        if xs[4].ndim == xs[0].ndim:  # flat-E carry
            from octic_vits_tpu.d8.group import unpack_5f_to_8

            parts = unpack_5f_to_8(xs)
            if self.invariant:
                xs = pack_8_to_5(parts)
                return self.invariant_proj(self.invariantization(xs))
            return jnp.concatenate(parts, axis=-1)
        if self.invariant:
            return self.invariant_proj(self.invariantization(xs))
        return jnp.concatenate(unpack_5_to_8(xs), axis=-1)

    # ---- forward -----------------------------------------------------------

    def forward_features(self, x: Array, deterministic: bool = True) -> Array:
        b, h, w, _ = x.shape
        grid_hw = (h // self.patch_size, w // self.patch_size)
        xs = self.patch_embed(x)
        xs = self._add_pos(xs, grid_hw)
        xs = self._cat_cls_and_registers(xs, b)
        if self.packed_carry:
            # ONE [B, N, C] packed array through the whole octic trunk
            from octic_vits_tpu.d8.group import pack_5_to_flat

            xs = pack_5_to_flat(xs)
        elif self.flat_e_carry:
            # [B, N, 2, C/4] -> [B, N, C/2] = [row0|row1]: one relayout at
            # trunk entry buys lane-aligned E ops in every block
            e = xs[4]
            xs = xs[:4] + (e.reshape(e.shape[0], e.shape[1], -1),)

        if self.scan_blocks:
            # NOTE: a flat packed single-array carry (BlockD8 packed path)
            # was measured 448.7 vs 457.9 img/s here — the pack/unpack
            # traffic around the matmul kernels eats the elementwise
            # savings; XLA already fuses the tuple-carry elementwise ops.
            # The packed path stays available for kernel-level fusion work.
            xs, _ = self.octic_stack(xs, deterministic)
            z = self._break_to_flat(xs)
            z, _ = self.standard_stack(z, deterministic)
        else:
            for blk in self.blocks[: self.break_layer]:
                xs = blk(xs, deterministic)
            z = self._break_to_flat(xs)
            for blk in self.blocks[self.break_layer :]:
                z = blk(z, deterministic)
        z = self.norm(z)
        return jnp.mean(z, axis=1) if self.global_pool else z[:, 0]

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        z = self.forward_features(x, deterministic)
        if self.drop_rate and not deterministic:
            z = nn.Dropout(self.drop_rate, deterministic=False)(z)
        if self.num_classes > 0:
            z = self.head(z)
        return z

    @staticmethod
    def no_weight_decay() -> set:
        """Param names excluded from weight decay
        (reference: octic_vits/model.py:229-234)."""
        return {"pos_embed", "cls_token_a1"}
