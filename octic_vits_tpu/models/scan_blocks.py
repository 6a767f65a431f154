"""Scan-over-blocks execution: compile the transformer trunk as ONE
`lax.scan` over stacked per-block parameters instead of N unrolled blocks.

TPU-first rationale: XLA compile time (and HLO size) scales with the
unrolled depth; a ViT-H trunk is 32 structurally identical blocks, so
scanning compiles ~depth-times faster with identical math. Optional
per-block rematerialization (`remat`) trades recompute for activation
memory in training (jax.checkpoint).

Param layout in scan mode: params["octic_blocks"]["block"][...] and
params["standard_blocks"]["block"][...] carry a leading `depth` axis on
every leaf (flax nn.scan variable_axes=0).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from octic_vits_tpu.layers.d8_layers import BlockD8
from octic_vits_tpu.layers.vit_layers import Block


class _ScanBlockD8(nn.Module):
    cfg: Any  # dict of BlockD8 kwargs

    @nn.compact
    def __call__(self, xs, deterministic):
        return BlockD8(**self.cfg, name="block")(xs, deterministic), None


class _ScanBlock(nn.Module):
    cfg: Any  # dict of Block kwargs

    @nn.compact
    def __call__(self, x, deterministic):
        return Block(**self.cfg, name="block")(x, deterministic), None


def make_scanned_stack(kind: str, cfg: dict, length: int, name: str,
                       remat: bool = False, unroll: int = 1,
                       split_transpose: bool = False):
    """kind: 'octic' | 'standard'. Returns a module instance: call with
    (carry, deterministic) -> (carry, None).

    `remat` uses a SELECTIVE policy: attention outputs AND the qkv
    projections feeding the attention kernels (tagged `attn_out` /
    `attn_in` via jax.ad_checkpoint.checkpoint_name in the attention
    modules) are saved. attn_out (21 MB/block at B=32) spares the kernel
    recompute on the output side; attn_in (63 MB/block) is the custom_vjp
    RESIDUAL set, so saving it makes the forward kernel call dead code in
    the bwd replay — without it remat re-runs the attention kernel
    (~0.35 std / ~0.65 octic ms/block) just to rebuild residuals.
    Everything else (mlp intermediates, norms) is rematerialized."""
    target = _ScanBlockD8 if kind == "octic" else _ScanBlock
    if remat:
        import jax

        target = nn.remat(
            target,
            static_argnums=(2,),  # deterministic flag stays static
            prevent_cse=False,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_out", "attn_in"
            ),
        )
    scanned = nn.scan(
        target,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        length=length,
        in_axes=(nn.broadcast,),
        # `unroll`/`_split_transpose` knobs target the scan-bwd
        # stacked-grad dynamic-update-slice cost (BENCH.md bwd table)
        unroll=unroll,
        _split_transpose=split_transpose,
    )
    return scanned(cfg=cfg, name=name)
