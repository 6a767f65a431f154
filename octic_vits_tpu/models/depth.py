"""Monocular depth heads + encoder-decoder: the hub depth stack.

TPU-native redesign of the reference's vendored depth estimation stack
(reference: dinov2/hub/depth/decode_heads.py, encoder_decoder.py, ops.py
and dinov2/hub/depthers.py). Differences from the torch original, all
deliberate TPU choices:

* NHWC layout throughout (flax/XLA-native; torch is NCHW).
* Every bilinear resize is two small dense matmuls (separable row/col
  interpolation matrices built at trace time from static shapes) — rides
  the MXU instead of lowering to gathers. Supports both align_corners
  semantics of ``F.interpolate``.
* The stride-equals-kernel ``ConvTranspose2d`` upsamplers in the DPT
  reassemble stage are expressed as ONE dense matmul + block reshape
  (`BlockExpand`): out[h*s+dh, w*s+dw] = x[h,w] @ W[:, :, dh, dw]. For
  kernel==stride transposed conv has no overlap, so this is exact, and
  XLA sees a single [BHW, C] x [C, C*s*s] GEMM instead of a scatter.
* Sliding-window inference unrolls a static crop grid at trace time
  (shapes are compile-time constants under jit).

Only inference is provided, matching the reference hub's scope: its heads
are built with ``loss_decode=()`` and exist to serve the released NYU /
KITTI weights (reference: dinov2/hub/depthers.py:36-67,167-177).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Array = Any


# ---------------------------------------------------------------------------
# bilinear resize as separable matmuls
# ---------------------------------------------------------------------------


def _linear_resize_matrix(
    in_size: int, out_size: int, align_corners: bool
) -> np.ndarray:
    """[out, in] bilinear interpolation matrix matching F.interpolate.

    align_corners=False uses half-pixel source centers with edge clamping;
    align_corners=True maps endpoints to endpoints
    (reference: dinov2/hub/depth/ops.py:resize -> F.interpolate)."""
    m = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for o in range(out_size):
        if align_corners:
            src = o * (in_size - 1) / max(out_size - 1, 1)
        else:
            src = (o + 0.5) * in_size / out_size - 0.5
        src = min(max(src, 0.0), in_size - 1)
        lo = int(math.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[o, lo] += 1.0 - w
        m[o, hi] += w
    return m


def resize_bilinear(
    x: Array, out_hw: Tuple[int, int], align_corners: bool = False
) -> Array:
    """Bilinear-resize [B, H, W, C] -> [B, out_h, out_w, C] via two GEMMs."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    dt = x.dtype
    mh = jnp.asarray(_linear_resize_matrix(h, oh, align_corners), dt)
    mw = jnp.asarray(_linear_resize_matrix(w, ow, align_corners), dt)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, x)


class BlockExpand(nn.Module):
    """Exact stride==kernel ConvTranspose2d as one GEMM + pixel unshuffle.

    Replaces the reference's ``nn.ConvTranspose2d(C, C, kernel_size=s,
    stride=s)`` reassemble upsamplers (reference: dinov2/hub/depth/
    decode_heads.py:558-571). Param layout [s, s, in, out] so torch's
    [in, out, s, s] weight converts by a transpose."""

    features: int
    scale: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        s = self.scale
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (s, s, c, self.features),
            self.dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.dtype
        )
        y = jnp.einsum("bhwc,uvcf->bhuwvf", x, kernel.astype(x.dtype))
        y = y.reshape(b, h * s, w * s, self.features)
        return y + bias.astype(y.dtype)


# ---------------------------------------------------------------------------
# decode heads
# ---------------------------------------------------------------------------


def _depth_bins(
    strategy: str, min_depth: float, max_depth: float, n_bins: int
) -> jnp.ndarray:
    if strategy == "UD":
        return jnp.linspace(min_depth, max_depth, n_bins)
    if strategy == "SID":  # torch.logspace semantics: 10**linspace
        return 10.0 ** jnp.linspace(min_depth, max_depth, n_bins)
    raise ValueError(f"unknown bins_strategy {strategy}")


def _binned_depth(
    logit: Array,
    bins: Array,
    norm_strategy: str,
) -> Array:
    """Adabins-style classification-regression depth from [B,H,W,n_bins]
    (reference: dinov2/hub/depth/decode_heads.py:149-172)."""
    if norm_strategy == "linear":
        logit = nn.relu(logit) + 0.1
        logit = logit / jnp.sum(logit, axis=-1, keepdims=True)
    elif norm_strategy == "softmax":
        logit = nn.softmax(logit, axis=-1)
    elif norm_strategy == "sigmoid":
        logit = nn.sigmoid(logit)
        logit = logit / jnp.sum(logit, axis=-1, keepdims=True)
    else:
        raise ValueError(f"unknown norm_strategy {norm_strategy}")
    return jnp.einsum("bhwk,k->bhw", logit, bins.astype(logit.dtype))[..., None]


class BNHead(nn.Module):
    """The linear depth head: resize_concat of (patch, cls) levels + a 1x1
    classification-regression conv (reference: dinov2/hub/depth/
    decode_heads.py:223-296 with the hub config of depthers.py:36-67).

    Inputs: a sequence of ``(patch_map [B,h,w,C], cls [B,C])`` pairs from
    ``get_intermediate_layers(..., reshape=True, return_class_token=True)``.
    """

    in_index: Sequence[int] = (0, 1, 2, 3)
    upsample: int = 4
    n_bins: int = 256
    bins_strategy: str = "UD"
    norm_strategy: str = "linear"
    min_depth: float = 0.001
    max_depth: float = 80.0
    align_corners: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[Tuple[Array, Array]]) -> Array:
        levels = []
        for i in self.in_index:
            patch, cls = features[i]
            cls_map = jnp.broadcast_to(
                cls[:, None, None, :], patch.shape[:3] + (cls.shape[-1],)
            )
            levels.append(jnp.concatenate([patch, cls_map], axis=-1))
        h, w = levels[0].shape[1:3]
        out_hw = (h * self.upsample, w * self.upsample)
        levels = [
            resize_bilinear(x, out_hw, self.align_corners) for x in levels
        ]
        x = jnp.concatenate(levels, axis=-1)
        logit = nn.Conv(
            self.n_bins, (1, 1), use_bias=True, dtype=self.dtype,
            name="conv_depth",
        )(x)
        bins = _depth_bins(
            self.bins_strategy, self.min_depth, self.max_depth, self.n_bins
        )
        return _binned_depth(logit.astype(jnp.float32), bins,
                             self.norm_strategy)


class ReassembleBlocks(nn.Module):
    """ViT token maps -> 4 pyramid levels (reference: dinov2/hub/depth/
    decode_heads.py:528-597, readout_type='project')."""

    in_channels: int
    out_channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[Tuple[Array, Array]]) -> List[Array]:
        outs = []
        for i, (patch, cls) in enumerate(features):
            b, h, w, c = patch.shape
            readout = jnp.broadcast_to(cls[:, None, None, :], patch.shape)
            x = jnp.concatenate([patch, readout], axis=-1)
            x = nn.Dense(self.in_channels, dtype=self.dtype,
                         name=f"readout_{i}")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Conv(self.out_channels[i], (1, 1), use_bias=True,
                        dtype=self.dtype, name=f"project_{i}")(x)
            if i == 0:
                x = BlockExpand(self.out_channels[0], 4, dtype=self.dtype,
                                name="resize_0")(x)
            elif i == 1:
                x = BlockExpand(self.out_channels[1], 2, dtype=self.dtype,
                                name="resize_1")(x)
            elif i == 3:
                x = nn.Conv(self.out_channels[3], (3, 3), strides=(2, 2),
                            padding=1, use_bias=True, dtype=self.dtype,
                            name="resize_3")(x)
            outs.append(x)
        return outs


class PreActResidualConvUnit(nn.Module):
    """act->conv->act->conv + skip (reference: decode_heads.py:600-641;
    hub config has norm_layer=None so convs are bias-free, order
    act-conv-norm with no norm)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        inputs = x
        x = nn.relu(x)
        x = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        return x + inputs


class FeatureFusionBlock(nn.Module):
    """Merge one pyramid level into the running decode state
    (reference: decode_heads.py:644-687)."""

    channels: int
    first: bool = False  # fusion_blocks[0] has res_conv_unit1 = None
    align_corners: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, res: Optional[Array] = None) -> Array:
        if res is not None:
            if res.shape[1:3] != x.shape[1:3]:
                res = resize_bilinear(res, x.shape[1:3], align_corners=False)
            x = x + PreActResidualConvUnit(
                self.channels, dtype=self.dtype, name="res_conv_unit1"
            )(res)
        x = PreActResidualConvUnit(
            self.channels, dtype=self.dtype, name="res_conv_unit2"
        )(x)
        x = resize_bilinear(
            x, (x.shape[1] * 2, x.shape[2] * 2), self.align_corners
        )
        return nn.Conv(self.channels, (1, 1), use_bias=True,
                       dtype=self.dtype, name="project")(x)


class DPTHead(nn.Module):
    """Dense Prediction Transformer decode head (reference:
    decode_heads.py:690-747 with the hub config of depthers.py:167-177:
    channels=256, readout 'project', norm None, classify=False)."""

    embed_dim: int
    channels: int = 256
    post_process_channels: Optional[Sequence[int]] = None
    min_depth: float = 0.001
    max_depth: float = 10.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[Tuple[Array, Array]]) -> Array:
        ppc = self.post_process_channels or [
            self.embed_dim // 2 ** (3 - i) for i in range(4)
        ]
        x = ReassembleBlocks(self.embed_dim, ppc, dtype=self.dtype,
                             name="reassemble")(features)
        x = [
            nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name=f"conv_{i}")(f)
            for i, f in enumerate(x)
        ]
        out = FeatureFusionBlock(self.channels, first=True, dtype=self.dtype,
                                 name="fusion_0")(x[-1])
        for i in range(1, 4):
            out = FeatureFusionBlock(self.channels, dtype=self.dtype,
                                     name=f"fusion_{i}")(out, x[-(i + 1)])
        out = nn.Conv(self.channels, (3, 3), padding=1, use_bias=True,
                      dtype=self.dtype, name="project")(out)
        out = nn.relu(out)
        # HeadDepth (reference: decode_heads.py:512-525)
        out = nn.Conv(self.channels // 2, (3, 3), padding=1, use_bias=True,
                      dtype=self.dtype, name="head_conv1")(out)
        out = resize_bilinear(
            out, (out.shape[1] * 2, out.shape[2] * 2), align_corners=True
        )
        out = nn.Conv(32, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                      name="head_conv2")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                      name="head_conv3")(out)
        # depth_pred, classify=False, scale_up=False (decode_heads.py:173-177)
        return nn.relu(out.astype(jnp.float32)) + self.min_depth


# ---------------------------------------------------------------------------
# encoder-decoder driver
# ---------------------------------------------------------------------------


def center_padding(x: Array, multiple: int) -> Array:
    """Center-pad H and W up to a multiple of the patch size
    (reference: dinov2/hub/utils.py:CenterPadding)."""
    h, w = x.shape[1], x.shape[2]
    pads = []
    for size in (h, w):
        new = math.ceil(size / multiple) * multiple
        lo = (new - size) // 2
        pads.append((lo, new - size - lo))
    return jnp.pad(
        x, ((0, 0), pads[0], pads[1], (0, 0)), mode="constant"
    )


class DepthEncoderDecoder:
    """Backbone + decode head inference driver (reference: dinov2/hub/
    depth/encoder_decoder.py:34-216). Functional: ``predict`` and the
    slide/whole inference helpers close over nothing mutable and are
    jittable with static image shapes."""

    def __init__(
        self,
        backbone_apply,  # (params, images) -> features for the head
        head: nn.Module,
        patch_size: int,
        min_depth: float,
        max_depth: float,
        align_corners: bool = False,
    ):
        self.backbone_apply = backbone_apply
        self.head = head
        self.patch_size = patch_size
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.align_corners = align_corners

    def encode_decode(
        self, variables, img: Array, out_size: Optional[Tuple[int, int]]
    ) -> Array:
        x = center_padding(img, self.patch_size)
        feats = self.backbone_apply(variables["backbone"], x)
        depth = self.head.apply({"params": variables["head"]}, feats)
        depth = jnp.clip(depth, self.min_depth, self.max_depth)
        if out_size is None:
            out_size = (img.shape[1], img.shape[2])
        return resize_bilinear(depth, out_size, self.align_corners)

    def whole_inference(self, variables, img, out_size=None):
        return self.encode_decode(variables, img, out_size)

    def slide_inference(
        self,
        variables,
        img: Array,
        stride: Tuple[int, int],
        crop_size: Tuple[int, int],
    ) -> Array:
        """Overlap-averaged sliding-window inference. The crop grid is
        static, so each window is one more call into the SAME jitted
        encode_decode shape (reference: encoder_decoder.py:119-151)."""
        h_st, w_st = stride
        h_cr, w_cr = crop_size
        b, h, w, _ = img.shape
        h_cr, w_cr = min(h_cr, h), min(w_cr, w)
        grids = []
        for y in range(0, max(h - h_cr, 0) + h_st, h_st):
            for x0 in range(0, max(w - w_cr, 0) + w_st, w_st):
                y1, x1 = min(y, h - h_cr), min(x0, w - w_cr)
                grids.append((y1, x1))
        preds = jnp.zeros((b, h, w, 1), jnp.float32)
        count = np.zeros((1, h, w, 1), np.float32)
        for (y1, x1) in dict.fromkeys(grids):
            crop = img[:, y1 : y1 + h_cr, x1 : x1 + w_cr]
            d = self.encode_decode(variables, crop, (h_cr, w_cr))
            preds = preds.at[:, y1 : y1 + h_cr, x1 : x1 + w_cr].add(d)
            count[:, y1 : y1 + h_cr, x1 : x1 + w_cr] += 1.0
        assert (count > 0).all()
        return preds / jnp.asarray(count)

    def predict(
        self,
        variables,
        img: Array,
        mode: str = "whole",
        stride: Tuple[int, int] = (171, 171),
        crop_size: Tuple[int, int] = (352, 352),
        flip: bool = False,
        out_size: Optional[Tuple[int, int]] = None,
    ) -> Array:
        """[B, H, W, 3] -> [B, H', W', 1] depth map."""
        assert mode in ("whole", "slide")
        if mode == "slide":
            out = self.slide_inference(variables, img, stride, crop_size)
        else:
            out = self.whole_inference(variables, img, out_size)
        if flip:
            out = out[:, :, ::-1]
        return out
