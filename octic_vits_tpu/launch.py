"""Job launch / orchestration (TPU analog of the reference's submitit stack).

The reference launches Slurm array jobs via submitit with a Trainer shim
that maps the job environment to ranks and requeues on preemption
(reference: submit.py:20-123, trainer.py:4-37, utils/cluster.py:12-115).
On TPU pods the launch model is different and simpler:

* every host runs the SAME program (SPMD); `bootstrap_distributed()` calls
  `jax.distributed.initialize()` (automatic coordinator discovery on TPU
  VMs; explicit args for CPU/GPU clusters),
* preemption handling is in-process (utils.checkpoint.PreemptionGuard +
  deterministic sampler `advance` resume) rather than a requeue hook,
* `main()` is the single CLI entry dispatching to the training modules,
  mirroring trainer.py's dynamic `args.training_module` import.
"""

from __future__ import annotations

import argparse
import importlib
import os
from typing import List, Optional


def bootstrap_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-host JAX. On TPU pods all arguments are discovered
    automatically; single-process runs skip initialization."""
    import jax

    env_np = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    if coordinator_address or env_np > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def main(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser("octic-vits-tpu launcher")
    parser.add_argument(
        "training_module",
        help="module with a main(args) entry, e.g. "
        "octic_vits_tpu.train.deit.cli or octic_vits_tpu.train.dinov2.cli",
    )
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args, rest = parser.parse_known_args(argv)

    bootstrap_distributed(args.coordinator, args.num_processes, args.process_id)
    module = importlib.import_module(args.training_module)
    return module.main(rest)


if __name__ == "__main__":
    main()
