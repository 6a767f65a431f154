"""Finetuning utilities.

* `interpolate_vit_pos_embed`: bicubic-resize a standard ViT's per-patch
  pos-embed when finetuning at a different resolution
  (reference: deit/main.py:296-314). Octic models need no special casing —
  their quadrant pos-embed resizes inside the forward (d8/posembed.py).
* `attn_only_trainable_mask`: the reference's attention-only finetuning
  freezes everything except attention blocks, cls token and pos-embed
  (reference: deit/main.py:318-338); returned as an optax-style bool mask.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from octic_vits_tpu.d8.posembed import resize_grid


def interpolate_vit_pos_embed(pos_embed: np.ndarray, new_grid: int) -> np.ndarray:
    """[1, N, C] (no cls slot) -> [1, new_grid^2, C] bicubic."""
    import jax.numpy as jnp

    n, c = pos_embed.shape[1], pos_embed.shape[2]
    g = int(np.sqrt(n))
    assert g * g == n, "pos embed is not a square grid"
    grid = jnp.asarray(pos_embed).reshape(g, g, c)
    out = resize_grid(grid, (new_grid, new_grid))
    return np.asarray(out.reshape(1, new_grid * new_grid, c))


def attn_only_trainable_mask(params: Dict) -> Any:
    """True = trainable. Attention + norm1 + cls/pos only."""

    def leaf(path, _):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return any(
            s in name for s in ("attn", "norm1", "cls_token", "pos_embed")
        )

    return jax.tree_util.tree_map_with_path(leaf, params)


def freeze_gradients(grads: Any, trainable_mask: Any) -> Any:
    return jax.tree.map(
        lambda g, t: g if t else jax.numpy.zeros_like(g), grads, trainable_mask
    )
