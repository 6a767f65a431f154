"""Native C++ data-kernel tests (skipped if no compiler/OpenMP)."""

import numpy as np
import pytest

from octic_vits_tpu.data import native


def test_normalize_matches_numpy():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (4, 16, 16, 3), np.uint8)
    ref = (imgs.astype(np.float32) / 255.0 - native.IMAGENET_MEAN) / native.IMAGENET_STD
    out = native.normalize_batch(imgs)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    if not native.available():
        pytest.skip("native lib unavailable; numpy fallback verified")


@pytest.mark.parametrize("k,flip", [(0, False), (1, False), (2, True), (3, True)])
def test_rot90_flip_matches_numpy(k, flip):
    rng = np.random.RandomState(1)
    imgs = rng.randn(3, 8, 8, 3).astype(np.float32)
    ref = np.rot90(imgs, k=k, axes=(1, 2))
    if flip:
        ref = ref[:, :, ::-1]
    out = native.rot90_flip_batch(imgs, k=k, flip=flip)
    np.testing.assert_allclose(out, np.ascontiguousarray(ref), atol=0)


def test_native_lib_builds():
    assert native.available(), "libocticdata.so failed to build (g++ expected in image)"
