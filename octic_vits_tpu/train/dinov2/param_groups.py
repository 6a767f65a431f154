"""Per-parameter learning-rate / weight-decay multipliers.

Functional re-design of the reference param-group machinery
(reference: dinov2/utils/param_groups.py:13-103): instead of optimizer
param-group dicts we build three pytrees (lr_mult, wd_mult, is_last_layer)
aligned with the parameter tree, consumed by the inline AdamW in the SSL
train step.
"""

from __future__ import annotations

import re
from typing import Any, Tuple

import jax
import jax.numpy as jnp

_TOKEN_PAT = re.compile(r"blocks_(\d+)")

_ZERO_LAYER_KEYS = (
    "pos_embed", "patch_embed", "mask_token", "cls_token", "register_tokens",
)
_NO_WD_LEAF = ("bias", "bias_a1", "beta_a1", "scale")
_NO_WD_SUBSTR = ("norm", "gamma", "alpha")


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def vit_lr_decay_rate(name: str, decay: float, num_layers: int) -> float:
    """Layer-wise decay (reference: dinov2/utils/param_groups.py:13-48)."""
    layer_id = num_layers + 1
    if any(k in name for k in _ZERO_LAYER_KEYS):
        layer_id = 0
    else:
        m = _TOKEN_PAT.search(name)
        if m is not None:
            layer_id = int(m.group(1)) + 1
    return decay ** (num_layers + 1 - layer_id)


def build_multiplier_trees(
    params: Any,
    num_layers: int,
    layerwise_decay: float = 0.9,
    patch_embed_lr_mult: float = 0.2,
) -> Tuple[Any, Any, Any]:
    """(lr_mult, wd_mult, is_last_layer) trees for a student param tree."""

    def per_leaf(path, leaf):
        name = _path_str(path)
        lr_mult = vit_lr_decay_rate(name, layerwise_decay, num_layers)
        if "patch_embed" in name:
            lr_mult *= patch_embed_lr_mult
        leaf_name = name.rsplit("/", 1)[-1]
        wd_mult = 1.0
        if leaf_name in _NO_WD_LEAF or any(
            s in name for s in _NO_WD_SUBSTR
        ):
            wd_mult = 0.0
        is_last = 1.0 if "last_layer" in name else 0.0
        return (lr_mult, wd_mult, is_last)

    triples = jax.tree_util.tree_map_with_path(per_leaf, params)
    lr_tree = jax.tree.map(lambda t: t[0], triples, is_leaf=lambda x: isinstance(x, tuple))
    wd_tree = jax.tree.map(lambda t: t[1], triples, is_leaf=lambda x: isinstance(x, tuple))
    ll_tree = jax.tree.map(lambda t: t[2], triples, is_leaf=lambda x: isinstance(x, tuple))
    return lr_tree, wd_tree, ll_tree
