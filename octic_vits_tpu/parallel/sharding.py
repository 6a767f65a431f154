"""Parameter / optimizer-state sharding rules.

The reference's FSDP SHARD_GRAD_OP (ZeRO-2: shard gradients + optimizer
state, replicate parameters; reference: dinov2/fsdp/__init__.py:22-54) maps
on TPU to: parameters replicated (or sharded over the `fsdp` mesh axis for
ZeRO-3), optimizer state sharded over `fsdp`. XLA then emits the
reduce-scatter / all-gather pairs the FSDP wrapper does by hand.

Rules here are shape-driven (no model cooperation needed): each leaf is
sharded along its largest axis divisible by the mesh-axis size; small leaves
stay replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from octic_vits_tpu.parallel.mesh import FSDP_AXIS


def leaf_partition_spec(
    shape, mesh: Mesh, axis_name: str = FSDP_AXIS, min_elements: int = 2**15
) -> P:
    """Shard the largest divisible axis of `shape` over `axis_name`."""
    size = mesh.shape[axis_name]
    if size == 1 or not shape:
        return P()
    n = 1
    for d in shape:
        n *= d
    if n < min_elements:
        return P()
    # largest axis divisible by the mesh axis size
    cands = [(d, i) for i, d in enumerate(shape) if d % size == 0]
    if not cands:
        return P()
    _, idx = max(cands)
    spec = [None] * len(shape)
    spec[idx] = axis_name
    return P(*spec)


def tree_shardings(
    tree: Any, mesh: Mesh, axis_name: str = FSDP_AXIS, min_elements: int = 2**15
):
    """NamedSharding pytree for params or optimizer state."""

    def leaf(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(
            mesh, leaf_partition_spec(shape, mesh, axis_name, min_elements)
        )

    return jax.tree.map(leaf, tree)


def replicated_tree(tree: Any, mesh: Mesh):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
