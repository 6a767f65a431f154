"""Checkpointing (orbax): sharded async train-state checkpoints, teacher-only
eval exports, and preemption-safe resume.

Maps the reference's three regimes (SURVEY.md §5): DeiT rank-0 monolithic
checkpoint.pth -> a single orbax checkpoint of the TrainState; DINOv2
FSDPCheckpointer per-rank shards -> orbax's native sharded save (each host
writes its shards); teacher_checkpoint.pth -> `save_teacher`. Preemption:
`PreemptionGuard` saves on SIGTERM (the TPU analog of submitit's
Trainer.checkpoint requeue hook, reference: trainer.py:16-26).
"""

from __future__ import annotations

import os
import signal
import threading
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: keep-N rotating sharded checkpoints."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False):
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def should_save(self, step: int) -> bool:
        """Whether `save(step)` would actually write (interval gate).

        Host loops must ask this BEFORE materializing state on host:
        `jax.device_get(full train state)` is a multi-GB device->host pull
        at ViT-H scale and must only happen on real save steps."""
        return bool(self._mgr.should_save(step))

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_teacher(directory: str, iteration: int, teacher_params: Any):
    """Teacher-only export for the eval paths
    (reference: dinov2/train/train.py:128-137)."""
    path = os.path.abspath(os.path.join(directory, "eval", str(iteration), "teacher"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, teacher_params, force=True)
    ckptr.wait_until_finished()
    return path


def load_teacher(path: str, teacher_like: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), teacher_like)


class PreemptionGuard:
    """Save a final checkpoint on SIGTERM/SIGINT before exit.

    TPU-preemption analog of the reference's submitit requeue hook
    (reference: trainer.py:16-26, utils/cluster.py:85)."""

    def __init__(self):
        self._requested = threading.Event()
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, self._handler)
            except (ValueError, OSError):
                pass  # non-main thread

    def _handler(self, signum, frame):
        self._requested.set()

    @property
    def preempted(self) -> bool:
        return self._requested.is_set()
