"""Distributed k-NN classification on frozen features.

TPU re-design of the reference k-NN evaluator
(reference: dinov2/eval/knn.py:100-406): instead of the chunk/broadcast/
gather/re-top-k merge pipeline over NCCL, the train-feature matrix is
sharded over the device mesh and one jitted similarity+top-k runs under
pjit — XLA emits the cross-device merge.

Protocol parity: features L2-normalized, cosine similarity, exp(sim/T)
weighted class vote, k in {10, 20, 100, 200}, T = 0.07; optional few-shot
`n_per_class` subsampling.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

DEFAULT_KS = (10, 20, 100, 200)
DEFAULT_T = 0.07


def l2_normalize(x: Array, eps: float = 1e-12) -> Array:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=("max_k",))
def _topk_sims(test_feats, train_feats, max_k: int):
    sims = test_feats @ train_feats.T  # [Bt, Ntr]
    return jax.lax.top_k(sims, max_k)


def knn_classify(
    train_features: Array,      # [Ntr, D] (normalized or not)
    train_labels: Array,        # [Ntr]
    test_features: Array,       # [Nte, D]
    num_classes: int,
    ks: Sequence[int] = DEFAULT_KS,
    temperature: float = DEFAULT_T,
    batch_size: int = 1024,
) -> Dict[int, Array]:
    """Returns {k: [Nte, num_classes] vote scores} (reference KnnModule
    semantics, dinov2/eval/knn.py:100-185)."""
    train_features = l2_normalize(jnp.asarray(train_features))
    test_features = l2_normalize(jnp.asarray(test_features))
    train_labels = jnp.asarray(train_labels)
    max_k = max(ks)

    out = {k: [] for k in ks}
    n = test_features.shape[0]
    for start in range(0, n, batch_size):
        chunk = test_features[start : start + batch_size]
        sims, idx = _topk_sims(chunk, train_features, max_k)
        neighbor_labels = train_labels[idx]                    # [B, max_k]
        weights = jnp.exp(sims / temperature)
        onehot = jax.nn.one_hot(neighbor_labels, num_classes)  # [B, max_k, C]
        for k in ks:
            votes = jnp.einsum("bk,bkc->bc", weights[:, :k], onehot[:, :k])
            out[k].append(votes)
    return {k: jnp.concatenate(v, axis=0) for k, v in out.items()}


def knn_classify_sharded(
    train_features: Array,
    train_labels: Array,
    test_features: Array,
    num_classes: int,
    mesh,
    ks: Sequence[int] = DEFAULT_KS,
    temperature: float = DEFAULT_T,
    batch_size: int = 1024,
) -> Dict[int, Array]:
    """Mesh-sharded k-NN: the train matrix is sharded over devices; each
    device computes local top-k, then the per-device candidates are
    all-gathered and re-top-k'd — the SPMD analog of the reference's
    chunk/broadcast/gather/re-top-k merge (dinov2/eval/knn.py:100-185).

    Pads the train set to a multiple of the device count."""
    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    axis_names = mesh.axis_names
    ntr = train_features.shape[0]
    pad = (-ntr) % n_dev
    max_k = max(ks)

    shard = NamedSharding(mesh, P(axis_names))
    rep = NamedSharding(mesh, P())
    if isinstance(train_features, jax.Array):
        # device-resident bank: pad + reshard + normalize ON DEVICE in the
        # bank's dtype — a host round-trip of an IN1K-scale bank (3+ GiB)
        # costs minutes on one core and is never needed
        tf = jnp.asarray(train_features)
        tl = jnp.asarray(train_labels)
        if pad:
            tf = jnp.concatenate([tf, jnp.zeros((pad, tf.shape[1]), tf.dtype)])
            tl = jnp.concatenate([tl, jnp.full((pad,), -1, tl.dtype)])
        tf_d = jax.jit(l2_normalize, out_shardings=shard)(
            jax.device_put(tf, shard))
        tl_d = jax.device_put(tl, shard)
    else:
        tf = np.asarray(train_features, np.float32)
        tf = tf / (np.linalg.norm(tf, axis=-1, keepdims=True) + 1e-12)
        tl = np.asarray(train_labels)
        if pad:
            tf = np.concatenate([tf, np.zeros((pad, tf.shape[1]), tf.dtype)])
            tl = np.concatenate(
                [tl, np.full((pad,), -1, tl.dtype)])  # never top-k
        tf_d = jax.device_put(jnp.asarray(tf), shard)
        tl_d = jax.device_put(jnp.asarray(tl), shard)

    def local_topk(queries, feats, labels):
        sims = queries @ feats.T  # [B, ntr/D]
        s, idx = jax.lax.top_k(sims, max_k)
        lab = labels[idx]
        # gather candidates from every device, merge, re-top-k
        s_all = jax.lax.all_gather(s, axis_names, axis=1, tiled=True)
        lab_all = jax.lax.all_gather(lab, axis_names, axis=1, tiled=True)
        s_m, pos = jax.lax.top_k(s_all, max_k)
        lab_m = jnp.take_along_axis(lab_all, pos, axis=1)
        return s_m, lab_m

    fn = shard_map(
        local_topk, mesh=mesh,
        in_specs=(P(), P(axis_names), P(axis_names)),
        out_specs=(P(), P()),
        check_rep=False,  # outputs are replicated by the tiled all_gather
    )
    fn = jax.jit(fn)

    @jax.jit
    def votes_fn(sims, labels):
        weights = jnp.exp(sims.astype(jnp.float32) / temperature)
        valid = (labels >= 0).astype(weights.dtype)
        onehot = jax.nn.one_hot(jnp.maximum(labels, 0), num_classes) * (
            weights * valid
        )[..., None]
        return {k: jnp.sum(onehot[:, :k], axis=1) for k in ks}

    qd = jnp.asarray(test_features)
    if qd.dtype != tf_d.dtype:
        qd = qd.astype(tf_d.dtype)
    qd = jax.jit(l2_normalize, out_shardings=rep)(jax.device_put(qd, rep))
    out = {k: [] for k in ks}
    for start in range(0, qd.shape[0], batch_size):
        sims, labels = fn(qd[start : start + batch_size], tf_d, tl_d)
        v = votes_fn(sims, labels)
        for k in ks:
            out[k].append(v[k])
    return {k: jnp.concatenate(v) for k, v in out.items()}


def filter_n_per_class(
    features: np.ndarray, labels: np.ndarray, n_per_class: int, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Few-shot filtering (reference: dinov2/eval/knn.py:199-238)."""
    rng = np.random.RandomState(seed)
    keep = []
    for c in np.unique(labels):
        idx = np.nonzero(labels == c)[0]
        rng.shuffle(idx)
        keep.append(idx[:n_per_class])
    keep = np.concatenate(keep)
    return features[keep], labels[keep]


def extract_features(
    apply_fn,
    data_iter: Iterable,
    feature_dim: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Run `apply_fn(images) -> [B, D]` over an iterator of (images, labels)
    batches; returns stacked numpy (features, labels) for THIS process's
    stream. Multi-host extraction (the reference's all_gather + index_copy,
    dinov2/eval/utils.py:86-146) lives in eval.distributed:
    `extract_features_sharded` shards the dataset by process index and
    merges via multihost_utils.process_allgather."""
    feats, labels = [], []
    for images, ys in data_iter:
        f = apply_fn(images)
        feats.append(np.asarray(f))
        labels.append(np.asarray(ys))
    return np.concatenate(feats), np.concatenate(labels)


def evaluate_knn(
    train_features, train_labels, test_features, test_labels,
    num_classes: int,
    ks: Sequence[int] = DEFAULT_KS,
    temperature: float = DEFAULT_T,
    n_per_class: Optional[int] = None,
) -> Dict[str, float]:
    if n_per_class is not None:
        train_features, train_labels = filter_n_per_class(
            np.asarray(train_features), np.asarray(train_labels), n_per_class
        )
    votes = knn_classify(
        train_features, train_labels, test_features, num_classes, ks, temperature
    )
    from octic_vits_tpu.eval.metrics import topk_accuracy

    results = {}
    for k, v in votes.items():
        acc = topk_accuracy(v, test_labels, ks=(1, 5))
        results[f"knn_{k}_top1"] = acc["top1"]
        results[f"knn_{k}_top5"] = acc["top5"]
    return results
