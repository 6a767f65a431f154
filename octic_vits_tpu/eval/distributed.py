"""Multi-host feature extraction and merge.

TPU re-design of the reference's gather_for_metrics machinery
(reference: dinov2/eval/utils.py:86-146 — torch.distributed all_gather of
per-rank feature shards followed by index_copy into dataset order): each
process extracts features for ITS round-robin dataset shard, then one
`multihost_utils.process_allgather` ships every shard to every process and
a scatter by the original dataset indices restores order. Single-process
degenerates to the pure scatter (no collective).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import numpy as np


def gather_features_across_processes(
    features: np.ndarray,   # [n_local, D] this process's shard
    labels: np.ndarray,     # [n_local]
    indices: np.ndarray,    # [n_local] dataset positions of each row
    total_n: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge per-process feature shards into the full dataset-ordered
    (features[total_n, D], labels[total_n]) on EVERY process.

    Shards may differ in length by one (round-robin sampling); they are
    padded to the max shard size with index -1 rows, which the scatter
    drops (the reference pads the sampler instead and relies on
    index_copy overwrites, dinov2/eval/utils.py:120-146)."""
    features = np.asarray(features)
    labels = np.asarray(labels)
    indices = np.asarray(indices, np.int64)
    d = features.shape[1]
    out_f = np.zeros((total_n, d), features.dtype)
    out_y = np.zeros((total_n,), labels.dtype)

    if jax.process_count() == 1:
        out_f[indices] = features
        out_y[indices] = labels
        return out_f, out_y

    from jax.experimental import multihost_utils

    cap = -(-total_n // jax.process_count())
    pad = cap - len(indices)
    if pad:
        features = np.concatenate(
            [features, np.zeros((pad, d), features.dtype)]
        )
        labels = np.concatenate([labels, np.zeros((pad,), labels.dtype)])
        indices = np.concatenate([indices, np.full((pad,), -1, np.int64)])
    gf = np.asarray(multihost_utils.process_allgather(features))  # [P,cap,D]
    gy = np.asarray(multihost_utils.process_allgather(labels))
    gi = np.asarray(multihost_utils.process_allgather(indices)).reshape(-1)
    valid = gi >= 0
    out_f[gi[valid]] = gf.reshape(-1, d)[valid]
    out_y[gi[valid]] = gy.reshape(-1)[valid]
    return out_f, out_y


def extract_features_sharded(
    apply_fn: Callable,
    dataset,
    batch_size: int = 256,
    num_workers: int = 4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Process-sharded `extract_features`: this process runs `apply_fn`
    over its EpochSampler shard only, then the shards are merged into the
    full dataset-ordered feature matrix on every process
    (reference: dinov2/eval/utils.py:86-146). The single-process case is
    exactly `extract_features` plus a reorder."""
    from octic_vits_tpu.data.loaders import DataLoader
    from octic_vits_tpu.data.samplers import EpochSampler
    from octic_vits_tpu.eval.knn import extract_features

    sampler = EpochSampler(
        len(dataset), shard=jax.process_index(),
        num_shards=jax.process_count(),
    )
    indices = np.fromiter(iter(sampler), np.int64)
    loader = DataLoader(
        dataset, sampler, batch_size=batch_size, num_workers=num_workers,
        drop_last=False,
    )
    feats, labels = extract_features(apply_fn, loader)
    return gather_features_across_processes(
        feats, labels, indices, len(dataset)
    )
