"""Hub entry points: named pretrained backbones.

Analog of the reference torch.hub surface (reference: dinov2/hub/
backbones.py:64-156 and the `__model_loader__` map of
dinov2/eval/segmentation/dinov2_loader.py:13-73): each entry resolves a
backbone factory + a converted-checkpoint path and returns (model, params,
meta). Checkpoints are loaded either from an orbax directory (this
framework's native format) or from a torch .pth state_dict via the
converter (zero-egress environments must provide local files).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from octic_vits_tpu.models import create_model


@dataclasses.dataclass(frozen=True)
class HubEntry:
    arch: str
    depth: int
    style: str            # 'deit' | 'dinov2'
    patch_size: int
    num_register_tokens: int = 0
    # 'octic' = OcticVisionTransformer checkpoints (convert_octic_vit);
    # 'dinov2_std' = upstream DINOv2 DinoVisionTransformer checkpoints
    # (convert_dinov2_vit; reference: dinov2/hub/backbones.py:64-156)
    family: str = "octic"
    embed_dim: int = 0     # informational (dinov2_std head sizing)


HUB_ENTRIES: Dict[str, HubEntry] = {
    # DeiT III supervised releases (reference: README.md:100-143)
    "hybrid_deit_huge_patch14": HubEntry("hybrid_deit_huge_patch14", 32, "deit", 14),
    "hybrid_deit_large_patch16": HubEntry("hybrid_deit_large_patch16", 24, "deit", 16),
    "d8_inv_early_deit_huge_patch14": HubEntry("d8_inv_early_deit_huge_patch14", 32, "deit", 14),
    "d8_inv_early_deit_large_patch16": HubEntry("d8_inv_early_deit_large_patch16", 24, "deit", 16),
    # DINOv2 SSL teacher backbones (reference: README.md:150-208)
    "hybrid_dinov2_vit_huge_patch16": HubEntry("hybrid_dinov2_vit_huge_patch16", 32, "dinov2", 16),
    "hybrid_dinov2_vit_large_patch16": HubEntry("hybrid_dinov2_vit_large_patch16", 24, "dinov2", 16),
    "d8_inv_early_dinov2_vit_huge_patch16": HubEntry("d8_inv_early_dinov2_vit_huge_patch16", 32, "dinov2", 16),
    "d8_inv_early_dinov2_vit_large_patch16": HubEntry("d8_inv_early_dinov2_vit_large_patch16", 24, "dinov2", 16),
}

# upstream DINOv2 backbones (reference: dinov2/hub/backbones.py:64-156);
# weights-file-driven — pass the released *_pretrain.pth path as `checkpoint`
for _tag, _depth, _dim in (
    ("dinov2_vits14", 12, 384),
    ("dinov2_vitb14", 12, 768),
    ("dinov2_vitl14", 24, 1024),
    ("dinov2_vitg14", 40, 1536),
):
    HUB_ENTRIES[_tag] = HubEntry(
        _tag, _depth, "dinov2", 14, family="dinov2_std", embed_dim=_dim
    )
    HUB_ENTRIES[_tag + "_reg"] = HubEntry(
        _tag + "_reg", _depth, "dinov2", 14, num_register_tokens=4,
        family="dinov2_std", embed_dim=_dim,
    )


def load_backbone(
    name: str,
    checkpoint: Optional[str] = None,
    checkpoint_key: str = "teacher",
    img_size: int = 224,
    dtype: Any = jnp.bfloat16,
    **model_kwargs,
) -> Tuple[Any, Any]:
    """Build a named backbone; load weights from `checkpoint` if given.

    `checkpoint` may be an orbax directory or a torch .pth file. For torch
    files, `checkpoint_key` selects the sub-dict ('teacher'/'model', the
    reference's load_pretrained_weights behavior,
    dinov2/utils/utils.py:20-33)."""
    if name not in HUB_ENTRIES:
        raise KeyError(f"unknown hub entry {name}; known: {sorted(HUB_ENTRIES)}")
    entry = HUB_ENTRIES[name]
    model = create_model(name, img_size=img_size, dtype=dtype, **model_kwargs)
    params = None
    if checkpoint is not None:
        if os.path.isdir(checkpoint):
            from octic_vits_tpu.utils.checkpoint import load_teacher

            params = load_teacher(checkpoint)
        else:
            import torch

            from octic_vits_tpu.utils.convert import (
                convert_dinov2_vit, convert_octic_vit,
            )

            blob = torch.load(checkpoint, map_location="cpu", weights_only=True)
            sd = blob.get(checkpoint_key, blob.get("model", blob))
            sd = {k: v.numpy() for k, v in sd.items()}
            if entry.family == "dinov2_std":
                params = convert_dinov2_vit(sd, depth=entry.depth)
            else:
                params = convert_octic_vit(
                    sd, depth=entry.depth, style=entry.style
                )
            params = jax.tree.map(jnp.asarray, params)
    return model, params


def load_linear_classifier(
    name: str,
    backbone_checkpoint: Optional[str] = None,
    head_checkpoint: Optional[str] = None,
    layers: int = 4,
    img_size: int = 224,
    dtype: Any = jnp.bfloat16,
    **model_kwargs,
):
    """Backbone + IN1K linear head, the reference's `*_lc` hub entries
    (reference: dinov2/hub/classifiers.py:52-268). `layers` in (1, 4):
    features = cat(cls of last `layers` blocks, avg patch of last block).

    Returns (classify_fn, variables) where
    `classify_fn(variables, images) -> [B, 1000]` is jittable."""
    import flax.linen as fnn

    if layers not in (1, 4):
        raise ValueError(f"unsupported layers={layers}")
    model, params = load_backbone(
        name, checkpoint=backbone_checkpoint, img_size=img_size, dtype=dtype,
        **model_kwargs,
    )
    head = fnn.Dense(1000, dtype=dtype)
    head_params = None
    if head_checkpoint is not None:
        import torch

        from octic_vits_tpu.utils.convert import convert_linear_head

        blob = torch.load(head_checkpoint, map_location="cpu",
                          weights_only=True)
        sd = {k: v.numpy() for k, v in blob.items()}
        head_params = jax.tree.map(jnp.asarray, convert_linear_head(sd))
    else:
        # random-init fallback so the returned pair is always callable
        feat_dim = (layers + 1) * model.embed_dim
        head_params = head.init(
            jax.random.PRNGKey(0), jnp.zeros((1, feat_dim), dtype)
        )["params"]

    def classify_fn(variables, images):
        outs = model.apply(
            {"params": variables["backbone"]}, images, layers,
            False, True,  # reshape=False, return_class_token=True
            method=model.get_intermediate_layers,
        )
        cls_feats = [c for _, c in outs]
        feats = jnp.concatenate(cls_feats + [jnp.mean(outs[-1][0], axis=1)],
                                axis=-1)
        return head.apply({"params": variables["head"]}, feats)

    variables = {"backbone": params, "head": head_params}
    return classify_fn, variables


# depther out_index per arch (reference: dinov2/hub/depthers.py:103-119)
_DEPTH_OUT_INDEX = {
    "dinov2_vits14": [2, 5, 8, 11],
    "dinov2_vitb14": [2, 5, 8, 11],
    "dinov2_vitl14": [4, 11, 17, 23],
    "dinov2_vitg14": [9, 19, 29, 39],
}
_DEPTH_RANGES = {"NYU": (0.001, 10.0), "KITTI": (0.001, 80.0)}


def load_depther(
    name: str,
    head_type: str = "dpt",
    weights: str = "NYU",
    layers: int = 4,
    backbone_checkpoint: Optional[str] = None,
    head_checkpoint: Optional[str] = None,
    img_size: int = 224,
    dtype: Any = jnp.float32,
    **model_kwargs,
):
    """Backbone + depth head: the reference's `*_ld` / `*_dd` hub entries
    (reference: dinov2/hub/depthers.py:70-140 linear, 180-246 DPT).

    Returns (depther, variables): `depther` is a
    models.depth.DepthEncoderDecoder whose
    `predict(variables, images[B,H,W,3])` supports whole and
    sliding-window inference; `variables = {'backbone':…, 'head':…}`.
    Checkpoints are local files (zero-egress), converted on load."""
    from octic_vits_tpu.models.depth import (
        BNHead, DepthEncoderDecoder, DPTHead,
    )

    base = name.removesuffix("_reg")
    if base not in _DEPTH_OUT_INDEX:
        raise KeyError(f"no depther for {name}; known: "
                       f"{sorted(_DEPTH_OUT_INDEX)}")
    if weights not in _DEPTH_RANGES:
        raise KeyError(f"unknown weights {weights}; known NYU, KITTI")
    min_depth, max_depth = _DEPTH_RANGES[weights]

    model, params = load_backbone(
        name, checkpoint=backbone_checkpoint, img_size=img_size,
        dtype=dtype, **model_kwargs,
    )
    entry = HUB_ENTRIES[name]

    if head_type == "linear":
        if layers not in (1, 4):
            raise ValueError(f"unsupported layers={layers}")
        out_index = (
            _DEPTH_OUT_INDEX[base] if layers == 4 else [entry.depth - 1]
        )
        # bins range is hardcoded to (0.001, 80) in the reference factory
        # regardless of dataset (dinov2/hub/depthers.py:53-67)
        head = BNHead(
            in_index=tuple(range(layers)), upsample=4,
            min_depth=0.001, max_depth=80.0, dtype=dtype,
        )
    elif head_type == "dpt":
        out_index = _DEPTH_OUT_INDEX[base]
        head = DPTHead(
            embed_dim=entry.embed_dim, channels=256,
            min_depth=min_depth, max_depth=max_depth, dtype=dtype,
        )
    else:
        raise ValueError(f"unknown head_type {head_type}")

    def backbone_apply(backbone_params, images):
        return model.apply(
            {"params": backbone_params}, images, out_index,
            True, True, False,  # reshape, return_class_token, norm=False
            method=model.get_intermediate_layers,
        )

    head_params = None
    if head_checkpoint is not None:
        import torch

        from octic_vits_tpu.utils.convert import convert_depth_head

        blob = torch.load(head_checkpoint, map_location="cpu",
                          weights_only=True)
        sd = blob.get("state_dict", blob)
        sd = {k: v.numpy() for k, v in sd.items()}
        head_params = jax.tree.map(jnp.asarray, convert_depth_head(sd))
    else:
        # random-init fallback so the returned pair is always callable
        dim = entry.embed_dim
        n_levels = layers if head_type == "linear" else 4
        fake = [
            (jnp.zeros((1, img_size // entry.patch_size,
                        img_size // entry.patch_size, dim), dtype),
             jnp.zeros((1, dim), dtype))
            for _ in range(n_levels)
        ]
        head_params = head.init(jax.random.PRNGKey(0), fake)["params"]

    depther = DepthEncoderDecoder(
        backbone_apply, head, patch_size=entry.patch_size,
        min_depth=min_depth, max_depth=max_depth,
    )
    return depther, {"backbone": params, "head": head_params}
