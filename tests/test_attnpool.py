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


def test_probe_grid_trains_all_representations():
    """Joint vmapped grid (2 lrs x 2 wds) over cls/avg_patch/patch
    representations; best member beats chance on separable synthetics."""
    from octic_vits_tpu.eval.attnpool import train_probe_grid

    rng = np.random.RandomState(1)
    centers = rng.randn(3, 8) * 3.0

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

    def feature_fn(x):
        return {
            "cls": x[:, 0],
            "avg_patch": x.mean(1),
            "patch": x,
        }

    res = train_probe_grid(
        feature_fn,
        lambda: batches(train),
        batches(test),
        num_classes=3,
        learning_rates=(1e-3, 1e-2),
        weight_decays=(1e-4, 1e-3),
        n_iters=100,
        warmup_iters=10,
        batch_size=16,
    )
    for rep in ("cls", "avg_patch", "patch"):
        assert res[f"{rep}_top1"] > 0.8, res
        assert "lr" in str(res.keys()) or f"{rep}_best_lr" in res
