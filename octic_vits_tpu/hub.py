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

            from octic_vits_tpu.utils.convert import convert_octic_vit

            blob = torch.load(checkpoint, map_location="cpu", weights_only=True)
            sd = blob.get(checkpoint_key, blob.get("model", blob))
            sd = {k: v.numpy() for k, v in sd.items()}
            params = convert_octic_vit(
                sd, depth=entry.depth, style=entry.style
            )
            params = jax.tree.map(jnp.asarray, params)
    return model, params
