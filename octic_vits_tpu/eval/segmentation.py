"""Segmentation probing (capi-style): per-patch features -> kNN / logistic
regression probes -> mIoU.

TPU re-design of the reference segmentation eval (reference:
dinov2/eval/segmentation/eval_segmentation.py:50-446): patch features are
extracted at 224^2, labels are majority-downsampled per patch, probes are a
chunked-cdist kNN and a logistic regression (sklearn L-BFGS replacing cuML),
and the hyper-parameter grid is evaluated sequentially (distribute across
hosts by slicing the grid, reference :104-133).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from octic_vits_tpu.eval.metrics import confusion_matrix, miou_from_confusion

Array = jnp.ndarray


def downsample_labels(
    label_map: np.ndarray, patch_size: int, num_classes: int,
    ignore_index: int = 255,
) -> np.ndarray:
    """[H, W] pixel labels -> [h, w] per-patch majority label
    (ignoring ignore_index; patch fully ignored -> ignore_index)."""
    h, w = label_map.shape
    gh, gw = h // patch_size, w // patch_size
    crop = label_map[: gh * patch_size, : gw * patch_size]
    patches = crop.reshape(gh, patch_size, gw, patch_size).transpose(0, 2, 1, 3)
    patches = patches.reshape(gh, gw, -1)
    out = np.full((gh, gw), ignore_index, np.int32)
    for i in range(gh):
        for j in range(gw):
            vals = patches[i, j]
            vals = vals[vals != ignore_index]
            if len(vals):
                out[i, j] = np.bincount(vals, minlength=num_classes).argmax()
    return out


def extract_patch_features(
    feature_fn: Callable[[np.ndarray], np.ndarray],
    images: Iterable[Tuple[np.ndarray, np.ndarray]],
    patch_size: int,
    num_classes: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """feature_fn(batch NHWC) -> [B, N, D] patch features; images yields
    (image [H,W,3] normalized, label_map [H,W])."""
    feats, labels = [], []
    for img, lab in images:
        f = np.asarray(feature_fn(img[None]))[0]
        pl = downsample_labels(lab, patch_size, num_classes).flatten()
        keep = pl != 255
        feats.append(f.reshape(-1, f.shape[-1])[keep])
        labels.append(pl[keep])
    return np.concatenate(feats), np.concatenate(labels)


class KNNSegProbe:
    """Chunked-similarity kNN over patch features
    (reference: eval_segmentation.py:172-278)."""

    def __init__(self, k: int = 32, temperature: float = 0.07,
                 num_classes: int = 150, chunk: int = 4096):
        self.k = k
        self.t = temperature
        self.num_classes = num_classes
        self.chunk = chunk

    def fit(self, feats: np.ndarray, labels: np.ndarray):
        f = feats / (np.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
        self.train_feats = jnp.asarray(f)
        self.train_labels = jnp.asarray(labels)
        return self

    def predict(self, feats: np.ndarray) -> np.ndarray:
        f = feats / (np.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
        out = []
        k = min(self.k, self.train_feats.shape[0])

        @jax.jit
        def _scores(chunk_feats):
            sims = chunk_feats @ self.train_feats.T
            top_s, top_i = jax.lax.top_k(sims, k)
            w = jnp.exp(top_s / self.t)
            onehot = jax.nn.one_hot(self.train_labels[top_i], self.num_classes)
            return jnp.einsum("bk,bkc->bc", w, onehot)

        for s in range(0, len(f), self.chunk):
            out.append(np.asarray(_scores(jnp.asarray(f[s : s + self.chunk]))))
        return np.concatenate(out).argmax(-1)


class LogregSegProbe:
    """Multinomial logistic regression probe; sklearn L-BFGS replaces the
    reference's cuML GPU solver (reference: eval_segmentation.py:281-337)."""

    def __init__(self, C: float = 1.0, max_iter: int = 200, num_classes: int = 150):
        from sklearn.linear_model import LogisticRegression

        self.clf = LogisticRegression(C=C, max_iter=max_iter)
        self.num_classes = num_classes

    def fit(self, feats: np.ndarray, labels: np.ndarray):
        self.clf.fit(feats, labels)
        return self

    def predict(self, feats: np.ndarray) -> np.ndarray:
        return self.clf.predict(feats)


@dataclasses.dataclass
class SegEvalResult:
    probe: str
    params: Dict
    miou: float
    acc: float


def evaluate_seg_probes(
    train_feats: np.ndarray,
    train_labels: np.ndarray,
    val_feats: np.ndarray,
    val_labels: np.ndarray,
    num_classes: int,
    knn_grid: Sequence[Dict] = ({"k": 32}, {"k": 128}),
    logreg_grid: Sequence[Dict] = ({"C": 0.01}, {"C": 0.1}, {"C": 1.0}),
    grid_slice: Tuple[int, int] = (0, 1),  # (index, total) for multi-host split
) -> List[SegEvalResult]:
    """Run the probe grid; `grid_slice` reproduces the reference's
    round-robin split of hyper-parameters across workers
    (reference: eval_segmentation.py:104-133)."""
    jobs: List[Tuple[str, Dict]] = [("knn", g) for g in knn_grid] + [
        ("logreg", g) for g in logreg_grid
    ]
    idx, total = grid_slice
    results = []
    for j, (kind, g) in enumerate(jobs):
        if j % total != idx:
            continue
        if kind == "knn":
            probe = KNNSegProbe(num_classes=num_classes, **g)
        else:
            probe = LogregSegProbe(num_classes=num_classes, **g)
        probe.fit(train_feats, train_labels)
        pred = probe.predict(val_feats)
        cm = confusion_matrix(pred, val_labels, num_classes)
        m = miou_from_confusion(cm)
        results.append(SegEvalResult(kind, g, m["miou"], m["acc"]))
    return results
