"""Training schedules (reference: dinov2/utils/utils.py:67-87,
dinov2/train/train.py:71-116)."""

from __future__ import annotations

import numpy as np


class CosineScheduler:
    """Precomputed cosine schedule with optional warmup and freeze segments,
    exact semantics of the reference class."""

    def __init__(
        self,
        base_value: float,
        final_value: float,
        total_iters: int,
        warmup_iters: int = 0,
        start_warmup_value: float = 0.0,
        freeze_iters: int = 0,
    ):
        self.final_value = final_value
        self.total_iters = total_iters
        freeze = np.zeros((freeze_iters,))
        warmup = np.linspace(start_warmup_value, base_value, warmup_iters)
        n = total_iters - warmup_iters - freeze_iters
        it = np.arange(n)
        cos = final_value + 0.5 * (base_value - final_value) * (
            1 + np.cos(np.pi * it / max(n, 1))
        )
        self.schedule = np.concatenate((freeze, warmup, cos))
        assert len(self.schedule) == total_iters

    def __getitem__(self, it: int) -> float:
        if it >= self.total_iters:
            return float(self.final_value)
        return float(self.schedule[it])


def build_ssl_schedules(cfg):
    """The five schedules of the DINOv2 recipe
    (reference: dinov2/train/train.py:71-116)."""
    ep_len = cfg.train.OFFICIAL_EPOCH_LENGTH
    total = cfg.optim.epochs * ep_len
    lr = CosineScheduler(
        base_value=cfg.optim.lr,
        final_value=cfg.optim.min_lr,
        total_iters=total,
        warmup_iters=cfg.optim.warmup_epochs * ep_len,
        start_warmup_value=0,
    )
    wd = CosineScheduler(
        base_value=cfg.optim.weight_decay,
        final_value=cfg.optim.weight_decay_end,
        total_iters=total,
    )
    momentum = CosineScheduler(
        base_value=cfg.teacher.momentum_teacher,
        final_value=cfg.teacher.final_momentum_teacher,
        total_iters=total,
    )
    teacher_temp = CosineScheduler(
        base_value=cfg.teacher.teacher_temp,
        final_value=cfg.teacher.teacher_temp,
        total_iters=cfg.teacher.warmup_teacher_temp_epochs * ep_len,
        warmup_iters=cfg.teacher.warmup_teacher_temp_epochs * ep_len,
        start_warmup_value=cfg.teacher.warmup_teacher_temp,
    )
    last_layer_lr = CosineScheduler(
        base_value=cfg.optim.lr,
        final_value=cfg.optim.min_lr,
        total_iters=total,
        warmup_iters=cfg.optim.warmup_epochs * ep_len,
        start_warmup_value=0,
    )
    last_layer_lr.schedule[: cfg.optim.freeze_last_layer_epochs * ep_len] = 0
    return lr, wd, momentum, teacher_temp, last_layer_lr


def sqrt_lr_scaling(base_lr: float, global_batch_size: int) -> float:
    """sqrt_wrt_1024 rule (reference: dinov2/utils/config.py:21-29)."""
    return base_lr * (global_batch_size / 1024.0) ** 0.5
