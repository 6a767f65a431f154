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


def test_resize_crop_matches_pil():
    if not native.has_resize():
        pytest.skip("native resize kernel unavailable")
    from PIL import Image

    rng = np.random.RandomState(2)
    arr = rng.randint(0, 255, (300, 280, 3), np.uint8)
    img = Image.fromarray(arr)
    for box, out_hw in [
        ((10, 5, 290, 270), (224, 224)),   # antialiased downscale
        ((40, 40, 120, 130), (96, 96)),    # mild resize
    ]:
        t, l, b, r = box
        ref = np.asarray(
            img.resize((out_hw[1], out_hw[0]), Image.BICUBIC, box=(l, t, r, b)),
            np.uint8,
        )
        got = native.resize_crop(arr, box, out_hw)
        d = np.abs(ref.astype(int) - got.astype(int))
        # PIL uses 8-bit fixed-point filter weights; float weights land
        # within a few counts on noise images, mean well under 1
        assert d.mean() < 1.0 and (d > 4).mean() < 0.01, (d.max(), d.mean())


def test_color_jitter_matches_pil():
    if not native.has_resize():
        pytest.skip("native jitter kernel unavailable")
    from PIL import Image, ImageEnhance

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 255, (64, 64, 3), np.uint8)
    img = Image.fromarray(arr)
    cases = [
        (0, 1.25, lambda im, f: ImageEnhance.Brightness(im).enhance(f)),
        (1, 0.8, lambda im, f: ImageEnhance.Contrast(im).enhance(f)),
        (2, 1.3, lambda im, f: ImageEnhance.Color(im).enhance(f)),
    ]
    for op, f, pil_fn in cases:
        got = arr.copy()
        assert native.color_jitter_inplace(got, [op], [f])
        ref = np.asarray(pil_fn(img, f), np.uint8)
        d = np.abs(ref.astype(int) - got.astype(int))
        assert d.max() <= 2, (op, d.max())
    # hue: matches the python uint8-HSV path within HSV roundtrip rounding
    f = 0.07
    got = arr.copy()
    assert native.color_jitter_inplace(got, [3], [f])
    hsv = np.asarray(img.convert("HSV"), np.uint8).copy()
    hsv[..., 0] = (hsv[..., 0].astype(np.int16) + int(f * 255)) % 256
    ref = np.asarray(Image.fromarray(hsv, "HSV").convert("RGB"), np.uint8)
    d = np.abs(ref.astype(int) - got.astype(int))
    assert d.mean() < 0.5 and (d > 6).mean() < 0.001, (d.max(), d.mean())


def test_native_dino_augmentation_shapes_and_range():
    from octic_vits_tpu.data.transforms import DataAugmentationDINO
    import random as pyrandom
    from PIL import Image

    rng = np.random.RandomState(4)
    img = Image.fromarray(rng.randint(0, 255, (320, 300, 3), np.uint8))
    aug = DataAugmentationDINO(local_crops_number=4)
    aug.normalize = False
    out = aug(img, pyrandom.Random(0))
    assert len(out["global_crops"]) == 2 and len(out["local_crops"]) == 4
    for g in out["global_crops"]:
        assert g.shape == (224, 224, 3) and g.dtype == np.uint8
    for l in out["local_crops"]:
        assert l.shape == (96, 96, 3) and l.dtype == np.uint8
    # normalized float path
    aug2 = DataAugmentationDINO(local_crops_number=2)
    out2 = aug2(img, pyrandom.Random(0))
    assert out2["global_crops"][0].dtype == np.float32
