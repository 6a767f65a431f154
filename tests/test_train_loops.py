"""End-to-end smoke tests for the host training loops (tiny synthetic data):
DeiT supervised epoch loop incl. checkpointing + eval, and the DINOv2
do_train loop driving the SSL step."""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def image_folder(tmp_path):
    root = tmp_path / "data"
    for split in ["train", "val"]:
        for c in ["a", "b"]:
            d = root / split / c
            d.mkdir(parents=True)
            for i in range(6):
                Image.new(
                    "RGB", (40, 40),
                    (50 * i, 10 if c == "a" else 200, 30),
                ).save(d / f"{i}.jpg")
    return root


def test_deit_train_loop(image_folder, tmp_path):
    from octic_vits_tpu.data.datasets import ImageFolder
    from octic_vits_tpu.data.transforms import eval_transform
    from octic_vits_tpu.models.registry import register_model
    from octic_vits_tpu.train.deit.engine import DeiTConfig
    from octic_vits_tpu.train.deit.main import train

    from octic_vits_tpu.models import OcticVisionTransformer

    @register_model
    def _tiny_octic_for_loop(img_size=32, **kw):
        kw.setdefault("num_classes", 2)
        kw.pop("drop_path_rate", None)
        return OcticVisionTransformer(
            img_size=img_size, patch_size=8, embed_dim=32, depth=2,
            num_heads=2, mlp_ratio=2.0, qkv_bias=True,
            drop_path_rate=0.0, **kw,
        )

    tf = lambda im: eval_transform(im, 32, 1.0)
    train_ds = ImageFolder(str(image_folder / "train"), transform=tf)
    val_ds = ImageFolder(str(image_folder / "val"), transform=tf)
    cfg = DeiTConfig(
        num_classes=2, epochs=1, batch_size=4, steps_per_epoch=3,
        warmup_epochs=1, lr=1e-3, drop_path=0.0, mixup_alpha=0.0,
        cutmix_alpha=0.0, loss_type="ce",
    )
    out = tmp_path / "out"
    state = train(
        "_tiny_octic_for_loop", cfg, train_ds, val_ds, str(out),
        img_size=32, num_workers=2, max_steps=3,
    )
    assert int(state.step) >= 3
    assert (out / "ckpt").exists()
    assert (out / "log.txt").exists()


def test_dinov2_do_train_loop(tmp_path):
    from octic_vits_tpu.train.dinov2.ssl_meta_arch import SSLConfig, SSLMetaArch
    from octic_vits_tpu.train.dinov2.train import do_train
    from octic_vits_tpu.utils.config import ConfigNode
    import tests.test_ssl_training as tst

    cfg_arch = tst.tiny_cfg()
    arch = SSLMetaArch(cfg_arch)

    def batches():
        while True:
            yield tst.make_batch(cfg_arch)

    cfg = ConfigNode.from_dict(
        {
            "optim": {
                "epochs": 1, "lr": 1e-4, "min_lr": 1e-5, "warmup_epochs": 0,
                "weight_decay": 0.04, "weight_decay_end": 0.4,
                "freeze_last_layer_epochs": 0,
            },
            "teacher": {
                "momentum_teacher": 0.992, "final_momentum_teacher": 1.0,
                "teacher_temp": 0.07, "warmup_teacher_temp": 0.04,
                "warmup_teacher_temp_epochs": 1,
            },
            "train": {"OFFICIAL_EPOCH_LENGTH": 2},
        }
    )
    state = do_train(
        arch, cfg, batches(), str(tmp_path / "ssl_out"), max_iter=2,
        log_every=1,
    )
    assert int(state.step) == 2
    assert (tmp_path / "ssl_out" / "training_metrics.json").exists()
