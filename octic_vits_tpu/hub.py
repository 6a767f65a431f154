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
