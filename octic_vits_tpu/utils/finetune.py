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


def load_pretrained_for_finetune(
    path: str, init_params: Dict, checkpoint_key: str = "model"
) -> Dict:
    """Load a checkpoint for finetuning (reference: deit/main.py:282-338).

    Accepts an orbax checkpoint directory (a TrainState save from this
    package's trainers, a `best` export, or a raw param tree) or a torch
    `.pth` state_dict (converted via utils/convert; `checkpoint_key`
    selects the sub-dict as in the reference's checkpoint['model']).

    Merge semantics mirror the reference: classifier-head params whose
    shapes mismatch are DROPPED (fresh init kept — deit/main.py:289-295),
    a standard-ViT `pos_embed` at a different grid is bicubic-interpolated
    (deit/main.py:296-314; octic models resize in-forward and need nothing),
    and params absent from the checkpoint keep their fresh init."""
    loaded = _load_raw_param_tree(path, checkpoint_key)
    return _merge_params(init_params, loaded)


def _load_raw_param_tree(path: str, checkpoint_key: str) -> Dict:
    import os

    if path.endswith((".pth", ".pt")):
        import torch

        from octic_vits_tpu.utils import convert as C

        blob = torch.load(path, map_location="cpu", weights_only=False)
        sd = blob.get(checkpoint_key, blob.get("model", blob))
        sd = C.normalize_keys(
            {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
        )
        depth = 1 + max(
            (int(k.split(".")[1]) for k in sd if k.startswith("blocks.")),
            default=0,
        )
        if any(".lin_A1." in k or "cls_token.0" in k for k in sd):
            return C.convert_octic_vit(sd, depth)
        return C.convert_standard_vit(sd, depth)

    import orbax.checkpoint as ocp

    tree = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    if isinstance(tree, dict):
        if "params" in tree and isinstance(tree["params"], dict):
            return tree["params"]  # TrainState / SSLState save
    return tree


def _merge_params(init: Dict, loaded, path: str = "") -> Dict:
    import jax.numpy as jnp

    if not isinstance(init, dict):
        if loaded is None:
            return init
        lv = np.asarray(loaded)
        iv = init
        if lv.shape == tuple(np.shape(iv)):
            return jnp.asarray(lv, dtype=np.asarray(iv).dtype)
        if "pos_embed" in path and lv.ndim == 3 and np.ndim(iv) == 3:
            new_grid = int(np.sqrt(np.shape(iv)[1]))
            if new_grid * new_grid == np.shape(iv)[1]:
                out = interpolate_vit_pos_embed(lv, new_grid)
                if out.shape == tuple(np.shape(iv)):
                    return jnp.asarray(out, dtype=np.asarray(iv).dtype)
        # shape mismatch (e.g. a different-class-count head): keep fresh init
        return init
    out = {}
    for k, v in init.items():
        sub = loaded.get(k) if isinstance(loaded, dict) else None
        out[k] = _merge_params(v, sub, f"{path}/{k}")
    return out


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
