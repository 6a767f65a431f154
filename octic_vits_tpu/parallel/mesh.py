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


def create_hybrid_mesh(fsdp: int = 1) -> Mesh:
    """DCN-aware `(data, fsdp)` mesh for multi-slice pods.

    Slices are connected by DCN (data-center network), chips within a
    slice by ICI. The data axis is laid out slice-major so the per-step
    gradient all-reduce hierarchically combines fast ICI reductions with
    one DCN hop, and the fsdp axis stays strictly inside a slice so
    ZeRO parameter all-gathers never cross DCN (scaling-book recipe;
    replaces the reference's single-tier NCCL world,
    dinov2/distributed/__init__.py:239-270).

    On a single slice (or CPU) this degrades to :func:`create_mesh`.
    """
    devices = jax.devices()
    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if n_slices <= 1:
        return create_mesh(devices, fsdp=fsdp)
    per_slice = len(devices) // n_slices
    assert per_slice % fsdp == 0, (
        f"fsdp={fsdp} must divide the {per_slice} chips of one slice "
        "(parameter all-gathers must not cross DCN)"
    )
    from jax.experimental import mesh_utils

    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_slice // fsdp, fsdp),
        dcn_mesh_shape=(n_slices, 1),
        devices=devices,
    )
    return Mesh(arr.reshape(-1, fsdp), (DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over the entire mesh (both axes)."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
