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


def test_lamb_one_step_matches_trust_ratio_formula():
    """Pin optax.lamb to the LAMB paper / apex FusedLAMB update: adam
    direction with bias correction, decoupled weight decay, per-leaf trust
    ratio ||p|| / ||u||, then -lr scaling (reference uses apex fusedlamb,
    experiments/train_deit.py:42). Divergence from apex documented in
    DeiTConfig.clip_grad: apex additionally clips the global grad norm at
    max_grad_norm=1.0, which we apply in the train step instead."""
    import optax

    lr, wd, b1, b2, eps = 0.1, 0.02, 0.9, 0.999, 1e-8
    p = jnp.asarray(np.random.RandomState(0).randn(4, 3), jnp.float32)
    g = jnp.asarray(np.random.RandomState(1).randn(4, 3), jnp.float32)
    tx = optax.lamb(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    upd, _ = tx.update(g, tx.init(p), p)

    # hand-computed step 1: m_hat = g, v_hat = g^2 after bias correction
    u = g / (jnp.abs(g) + eps) + wd * p
    trust = jnp.linalg.norm(p) / jnp.linalg.norm(u)
    want = -lr * trust * u
    np.testing.assert_allclose(np.asarray(upd), np.asarray(want), rtol=2e-5)


def test_linear_probe_lr_grid_matches_reference():
    """The 13-lr grid and batch scaling rule are the reference's verbatim
    (dinov2/eval/linear.py:147,233-234)."""
    from octic_vits_tpu.eval.linear import DEFAULT_LRS, scale_lr

    ref = [1e-5, 2e-5, 5e-5, 1e-4, 2e-4, 5e-4,
           1e-3, 2e-3, 5e-3, 1e-2, 2e-2, 5e-2, 0.1]
    np.testing.assert_allclose(list(DEFAULT_LRS), ref)
    assert scale_lr(1e-3, 1024) == pytest.approx(1e-3 * 1024 / 256)
    assert scale_lr(1e-3, 128, world_size=8) == pytest.approx(4e-3)


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
