"""Evaluation metrics (reference: dinov2/eval/metrics.py:20-113)."""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def topk_accuracy(logits, labels, ks: Sequence[int] = (1, 5)) -> Dict[str, float]:
    logits = np.asarray(logits)
    labels = np.asarray(labels)
    order = np.argsort(-logits, axis=-1)
    out = {}
    for k in ks:
        hit = (order[:, :k] == labels[:, None]).any(-1)
        out[f"top{k}"] = float(hit.mean())
    return out


def real_labels_accuracy(
    logits, real_labels: Sequence[Sequence[int]], k: int = 1
) -> float:
    """ImageNet-ReaL accuracy: a prediction is correct if it is in the
    sample's set of re-assessed labels; samples with empty label sets are
    skipped (reference: dinov2/eval/metrics.py ImageNetReaLAccuracy)."""
    logits = np.asarray(logits)
    order = np.argsort(-logits, axis=-1)[:, :k]
    hits, total = 0, 0
    for preds, labels in zip(order, real_labels):
        if not len(labels):
            continue
        total += 1
        if any(p in labels for p in preds):
            hits += 1
    return hits / max(total, 1)


def confusion_matrix(pred: np.ndarray, target: np.ndarray, num_classes: int,
                     ignore_index: int = 255) -> np.ndarray:
    valid = target != ignore_index
    p = pred[valid].astype(np.int64)
    t = target[valid].astype(np.int64)
    cm = np.bincount(t * num_classes + p, minlength=num_classes**2)
    return cm.reshape(num_classes, num_classes)


def miou_from_confusion(
    cm: np.ndarray, exclude: Sequence[int] = ()
) -> Dict[str, float]:
    """mIoU + per-pixel acc (segmentation probing;
    reference: dinov2/eval/segmentation/eval_segmentation.py:50-67).
    `exclude` removes ignore-label classes (e.g. ADE20K raw label 0) from
    the macro average even when a probe predicts them."""
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(0) + cm.sum(1) - inter
    iou = np.where(union > 0, inter / np.maximum(union, 1), np.nan)
    for c in exclude:
        if 0 <= c < len(iou):
            iou[c] = np.nan
    acc = inter.sum() / max(cm.sum(), 1)
    return {"miou": float(np.nanmean(iou)), "acc": float(acc)}
