"""Device-mesh construction for SPMD training.

TPU-native replacement for the reference's NCCL process-group bootstrap
(reference: dinov2/distributed/__init__.py:180-270, deit/util.py:216-238):
instead of rank/world_size plumbing, we build a `jax.sharding.Mesh` and let
XLA insert collectives from sharding annotations. Multi-host TPU pods
initialize via `jax.distributed.initialize()` (automatic on TPU VMs).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    fsdp: int = 1,
) -> Mesh:
    """2-D `(data, fsdp)` mesh over all (or given) devices.

    `fsdp=1` is pure data parallelism (DDP analog). `fsdp=k` shards
    parameters/optimizer state over contiguous groups of k devices (the
    ZeRO / FSDP SHARD_GRAD_OP analog, reference: dinov2/fsdp/__init__.py:22-54)
    while gradients still all-reduce over the full mesh. Keep `fsdp` within
    a single ICI domain so parameter all-gathers ride ICI, not DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % fsdp == 0, f"{n} devices not divisible by fsdp={fsdp}"
    arr = np.asarray(devices).reshape(n // fsdp, fsdp)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over the entire mesh (both axes)."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
