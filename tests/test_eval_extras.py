"""Segmentation probing, DINO head, and hub tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_dino_head_shapes_and_norm():
    from octic_vits_tpu.models.dino_head import DINOHead, WeightNormDense

    head = DINOHead(out_dim=128, hidden_dim=32, bottleneck_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 24))
    params = head.init(jax.random.PRNGKey(1), x)
    out = head.apply(params, x)
    assert out.shape == (4, 128)

    # weight-normed last layer: scaling g doubles the logits
    wnd = WeightNormDense(8)
    p = wnd.init(jax.random.PRNGKey(2), x)
    base = wnd.apply(p, x)
    p2 = jax.tree.map(lambda a: a, p)
    p2 = {"params": {"v": p["params"]["v"], "g": 2.0 * p["params"]["g"]}}
    np.testing.assert_allclose(
        np.asarray(wnd.apply(p2, x)), 2 * np.asarray(base), rtol=1e-5
    )
    # and rescaling v does nothing (normalized away)
    p3 = {"params": {"v": 3.0 * p["params"]["v"], "g": p["params"]["g"]}}
    np.testing.assert_allclose(
        np.asarray(wnd.apply(p3, x)), np.asarray(base), rtol=1e-4
    )


def test_downsample_labels_majority():
    from octic_vits_tpu.eval.segmentation import downsample_labels

    lab = np.zeros((8, 8), np.int32)
    lab[:4, :4] = 2
    lab[0, 0] = 255  # ignore doesn't change majority
    out = downsample_labels(lab, patch_size=4, num_classes=3)
    assert out.shape == (2, 2)
    assert out[0, 0] == 2 and out[1, 1] == 0

    all_ignore = np.full((4, 4), 255, np.int32)
    out2 = downsample_labels(all_ignore, 4, 3)
    assert out2[0, 0] == 255


def test_seg_probes_separable_data():
    from octic_vits_tpu.eval.segmentation import evaluate_seg_probes

    rng = np.random.RandomState(0)
    centers = rng.randn(3, 8) * 4
    tr_f = np.concatenate([centers[i] + 0.1 * rng.randn(50, 8) for i in range(3)])
    tr_y = np.repeat(np.arange(3), 50)
    va_f = np.concatenate([centers[i] + 0.1 * rng.randn(10, 8) for i in range(3)])
    va_y = np.repeat(np.arange(3), 10)
    results = evaluate_seg_probes(
        tr_f, tr_y, va_f, va_y, num_classes=3,
        knn_grid=({"k": 8},), logreg_grid=({"C": 1.0},),
    )
    assert len(results) == 2
    for r in results:
        assert r.miou > 0.9, (r.probe, r.miou)


def test_miou_confusion():
    from octic_vits_tpu.eval.metrics import confusion_matrix, miou_from_confusion

    pred = np.array([0, 0, 1, 1, 2])
    targ = np.array([0, 1, 1, 1, 255])
    cm = confusion_matrix(pred, targ, 3)
    m = miou_from_confusion(cm)
    # class0: inter 1, union 2 -> .5 ; class1: inter 2 union 3 -> .667; class2 nan
    np.testing.assert_allclose(m["miou"], (0.5 + 2 / 3) / 2, atol=1e-6)


def test_hub_entries_build():
    from octic_vits_tpu.hub import HUB_ENTRIES, load_backbone

    # 8 octic paper models + 8 upstream DINOv2 backbones (±reg)
    assert len(HUB_ENTRIES) == 16
    assert {"dinov2_vits14", "dinov2_vitb14", "dinov2_vitl14",
            "dinov2_vitg14", "dinov2_vitl14_reg"} <= set(HUB_ENTRIES)
    model, params = load_backbone(
        "hybrid_dinov2_vit_large_patch16", checkpoint=None, dtype=jnp.float32
    )
    assert params is None and model.embed_dim == 1024
    up, up_params = load_backbone(
        "dinov2_vits14_reg", checkpoint=None, dtype=jnp.float32, img_size=28
    )
    assert up_params is None and up.embed_dim == 384
    assert up.num_register_tokens == 4 and up.patch_size == 14


def test_seg_dataset_layouts(tmp_path):
    from PIL import Image

    from octic_vits_tpu.data.seg_datasets import make_seg_dataset

    # fabricate a 2-image ADE20K layout UNDER the archive subdir the
    # reference creates (data.py:117-143 ADEChallengeData2016)
    base = tmp_path / "ADEChallengeData2016"
    for sub in ["images/training", "annotations/training"]:
        (base / sub).mkdir(parents=True)
    for i in range(2):
        Image.new("RGB", (32, 32), (100, 50, 0)).save(
            base / "images/training" / f"img{i}.jpg"
        )
        Image.fromarray(
            np.full((32, 32), i + 1, np.uint8)
        ).save(base / "annotations/training" / f"img{i}.png")
    ds = make_seg_dataset("ade20k", str(tmp_path), "train", image_size=16)
    img, lab = ds[1]
    assert img.shape == (16, 16, 3)
    # labels are served RAW (0=bg ignored via ignore_labels, classes 1..150)
    assert lab.shape == (16, 16) and lab.max() == 2
    assert ds.ignore_labels == (0, 255)
    assert ds.num_classes == 151


def test_voc_trainaug_layout(tmp_path):
    """VOC dual-root layout + mmseg trainaug split + SBD .mat targets
    (reference: data.py:146-205)."""
    import scipy.io
    from PIL import Image

    from octic_vits_tpu.data.seg_datasets import make_seg_dataset

    ori = tmp_path / "original" / "VOCdevkit" / "VOC2012"
    aug = tmp_path / "aug" / "benchmark_RELEASE" / "dataset"
    for d in ["JPEGImages", "SegmentationClass", "ImageSets/Segmentation"]:
        (ori / d).mkdir(parents=True)
    for d in ["img", "cls"]:
        (aug / d).mkdir(parents=True)

    Image.new("RGB", (16, 16), (10, 20, 30)).save(ori / "JPEGImages/a.jpg")
    Image.fromarray(np.full((16, 16), 3, np.uint8)).save(
        ori / "SegmentationClass/a.png"
    )
    (ori / "ImageSets/Segmentation/train.txt").write_text("a\n")
    (ori / "ImageSets/Segmentation/val.txt").write_text("a\n")

    for n, v in [("b", 5), ("c", 7)]:
        Image.new("RGB", (16, 16), (1, 2, 3)).save(aug / "img" / f"{n}.jpg")
        scipy.io.savemat(
            aug / "cls" / f"{n}.mat",
            {"GTcls": {"Segmentation": np.full((16, 16), v, np.uint8)}},
        )
    (aug / "train.txt").write_text("b\n")
    (aug / "val.txt").write_text("c\n")

    ds = make_seg_dataset("voc2012", str(tmp_path), "trainaug", image_size=16)
    assert len(ds) == 3  # ori train + aug train + aug val
    labs = [ds[i][1] for i in range(3)]
    assert [int(l.max()) for l in labs] == [3, 5, 7]
    assert make_seg_dataset("voc2012", str(tmp_path), "train").items == ds.items[:1]
    assert len(make_seg_dataset("voc2012", str(tmp_path), "val")) == 1


def test_seg_grids_match_reference_protocol():
    """Grid sizes/values must equal the reference's ctor defaults
    (reference: eval_segmentation.py:184-187, 292-296)."""
    from octic_vits_tpu.eval.segmentation import (
        DEFAULT_KNN_GRID,
        DEFAULT_LOGREG_GRID,
    )

    assert len(DEFAULT_KNN_GRID) == 8
    assert [g["k"] for g in DEFAULT_KNN_GRID] == [1, 1, 3, 3, 10, 10, 30, 30]
    assert {g["distance"] for g in DEFAULT_KNN_GRID} == {"cosine", "L2"}
    assert len(DEFAULT_LOGREG_GRID) == 8
    np.testing.assert_allclose(
        [g["C"] for g in DEFAULT_LOGREG_GRID], 10 ** np.linspace(-6, 5, 8)
    )
    assert all(
        g["max_iter"] == 1000 and g["tol"] == 1e-12 for g in DEFAULT_LOGREG_GRID
    )


def test_knn_seg_probe_l2_distance():
    from octic_vits_tpu.eval.segmentation import KNNSegProbe

    rng = np.random.RandomState(1)
    centers = rng.randn(3, 6) * 5
    tr_f = np.concatenate([centers[i] + 0.1 * rng.randn(30, 6) for i in range(3)])
    tr_y = np.repeat(np.arange(3), 30)
    va_f = np.concatenate([centers[i] + 0.1 * rng.randn(5, 6) for i in range(3)])
    va_y = np.repeat(np.arange(3), 5)
    for dist in ("cosine", "L2"):
        probe = KNNSegProbe(k=5, distance=dist, num_classes=3)
        pred = probe.fit(tr_f, tr_y).predict(va_f)
        assert (pred == va_y).mean() > 0.9, dist


def test_logreg_probe_jax_backend_chunked():
    """The on-device L-BFGS logreg (cuML analog) with a chunk size that
    forces the scan + pad/mask path (reference protocol:
    dinov2/eval/segmentation/eval_segmentation.py:281-337)."""
    from octic_vits_tpu.eval.segmentation import LogregSegProbe

    rng = np.random.RandomState(1)
    centers = rng.randn(4, 16) * 4
    y = np.tile(np.arange(4), 55)[:219]  # 219 % 64 != 0 -> pad rows masked
    x = (centers[y] + 0.15 * rng.randn(219, 16)).astype(np.float32)
    probe = LogregSegProbe(C=1.0, max_iter=200, num_classes=4,
                           backend="jax", chunk_size=64)
    probe.fit(x, y)
    assert probe.n_iter_ > 1
    va_y = np.tile(np.arange(4), 10)
    va_x = (centers[va_y] + 0.15 * rng.randn(40, 16)).astype(np.float32)
    acc = (probe.predict(va_x) == va_y).mean()
    assert acc > 0.95, acc

    # unchunked oracle agrees on the decision function
    probe2 = LogregSegProbe(C=1.0, max_iter=200, num_classes=4,
                            backend="jax", chunk_size=1 << 20)
    probe2.fit(x, y)
    acc2 = (probe2.predict(va_x) == va_y).mean()
    assert acc2 > 0.95, acc2
