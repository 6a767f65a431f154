"""Attention-pooling probe learns separable synthetic patch features."""

import numpy as np

from octic_vits_tpu.eval.attnpool import train_attnpool_probe


def test_attnpool_probe_learns():
    rng = np.random.RandomState(0)
    centers = rng.randn(3, 8) * 3

    def make(n):
        xs, ys = [], []
        for _ in range(n):
            y = rng.randint(3)
            feats = centers[y] + 0.2 * rng.randn(6, 8)
            xs.append(feats.astype(np.float32))
            ys.append(y)
        return np.stack(xs), np.asarray(ys)

    train = make(64)
    test = make(32)

    def batches(data, bs=16):
        xs, ys = data
        for i in range(0, len(xs), bs):
            yield xs[i : i + bs], ys[i : i + bs]

    res = train_attnpool_probe(
        feature_fn=lambda x: x,
        train_iter_factory=lambda: batches(train),
        eval_iter=batches(test),
        num_classes=3,
        iters=120,
        lr=5e-3,
        num_heads=2,
    )
    assert res["attnpool_top1"] > 0.85, res
