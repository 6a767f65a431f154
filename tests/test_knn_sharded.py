"""Sharded k-NN must agree with the single-device path (8-dev CPU mesh)."""

import pytest
import numpy as np

pytestmark = pytest.mark.slow  # heavyweight lane; quick lane: -m "not slow"


from octic_vits_tpu.eval.knn import knn_classify, knn_classify_sharded
from octic_vits_tpu.parallel import create_mesh


def test_sharded_knn_matches_single_device():
    rng = np.random.RandomState(0)
    centers = rng.randn(4, 16) * 3
    train_x = np.concatenate(
        [centers[i] + 0.1 * rng.randn(30, 16) for i in range(4)]
    ).astype(np.float32)  # 120 rows -> one pad row to reach 128 on 8 devices
    train_y = np.repeat(np.arange(4), 30)
    test_x = np.concatenate(
        [centers[i] + 0.1 * rng.randn(5, 16) for i in range(4)]
    ).astype(np.float32)

    single = knn_classify(train_x, train_y, test_x, 4, ks=(10,))
    mesh = create_mesh()
    sharded = knn_classify_sharded(train_x, train_y, test_x, 4, mesh, ks=(10,))
    p1 = np.asarray(single[10]).argmax(-1)
    p2 = np.asarray(sharded[10]).argmax(-1)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(
        np.asarray(single[10]), np.asarray(sharded[10]), rtol=1e-4
    )
