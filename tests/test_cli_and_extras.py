"""CLI parsing, cosub loss branch, distillation, transforms, native-loader
extras."""

import os

import pytest
import random

pytestmark = pytest.mark.slow  # heavyweight lane; quick lane: -m "not slow"


import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


def test_deit_cli_parser_defaults():
    from octic_vits_tpu.train.deit.cli import get_args_parser

    args = get_args_parser().parse_args([])
    assert args.model == "hybrid_deit_huge_patch14"
    assert args.batch_size == 2048 and args.epochs == 400
    assert args.bce_loss and args.lr == 3e-3
    args2 = get_args_parser().parse_args(
        ["--model", "deit_large_patch16_LS", "--rot-eval", "--eval"]
    )
    assert args2.rot_eval and args2.eval


def test_dinov2_cli_setup(tmp_path, monkeypatch):
    from octic_vits_tpu.train.dinov2.cli import get_args_parser, setup

    monkeypatch.setenv("IMAGENET_PATH", "/data/in1k")
    monkeypatch.setenv("EXTRA_PATH", "/data/extra")
    args = get_args_parser().parse_args(
        ["--output-dir", str(tmp_path), "optim.epochs=2",
         "crops.local_crops_number=4"]
    )
    cfg = setup(args)
    assert cfg.optim.epochs == 2
    assert cfg.crops.local_crops_number == 4
    assert cfg.optim.lr > 0  # sqrt scaling applied
    assert "/data/in1k" in cfg.train.dataset_path
    assert (tmp_path / "config.yaml").exists()


def test_cosub_train_step():
    import optax

    from octic_vits_tpu.models import VisionTransformer
    from octic_vits_tpu.train.common import create_train_state
    from octic_vits_tpu.train.deit.engine import (
        DeiTConfig, build_optimizer, make_deit_train_step,
    )

    model = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=1, num_heads=2,
        num_classes=4, qkv_bias=True, drop_path_rate=0.1,
    )
    cfg = DeiTConfig(
        num_classes=4, epochs=1, steps_per_epoch=2, warmup_epochs=0,
        cosub=True, loss_type="bce", mixup_alpha=0.8, cutmix_alpha=1.0,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 32, 32, 3)))["params"]
    tx = build_optimizer(cfg, params)
    state = create_train_state(params, tx, ema=True)
    step = jax.jit(make_deit_train_step(model, cfg, tx), donate_argnums=(0,))
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    state, metrics = step(state, images, jnp.arange(4) % 4, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_distillation_loss_modes():
    from octic_vits_tpu.train.deit.losses import distillation_loss

    s = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    t = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    base = jnp.asarray(1.0)
    assert float(distillation_loss(base, s, t, "none")) == 1.0
    soft = float(distillation_loss(base, s, t, "soft", alpha=0.5, tau=2.0))
    hard = float(distillation_loss(base, s, t, "hard", alpha=0.5))
    assert np.isfinite(soft) and np.isfinite(hard) and soft != hard


def test_dino_augmentation_shapes():
    from octic_vits_tpu.data.transforms import DataAugmentationDINO

    aug = DataAugmentationDINO(
        local_crops_number=4, global_crops_size=32, local_crops_size=16
    )
    img = Image.new("RGB", (64, 48), (120, 80, 40))
    out = aug(img, rng=random.Random(0))
    assert len(out["global_crops"]) == 2
    assert out["global_crops"][0].shape == (32, 32, 3)
    assert len(out["local_crops"]) == 4
    assert out["local_crops"][0].shape == (16, 16, 3)


def test_three_augment_shapes():
    from octic_vits_tpu.data.transforms import three_augment

    img = Image.new("RGB", (50, 70), (10, 200, 30))
    for seed in range(4):  # hits grayscale/solarize/blur branches
        arr = three_augment(img, size=32, rng=random.Random(seed))
        assert arr.shape == (32, 32, 3)
        assert np.isfinite(arr).all()


def test_wandb_shims(monkeypatch):
    """maybe_wandb_* no-op without config, activate with a fake wandb."""
    import sys
    import types

    from octic_vits_tpu.utils import logging as L

    monkeypatch.delenv("WANDB_ENTITY", raising=False)
    monkeypatch.delenv("WANDB_PROJECT", raising=False)
    monkeypatch.setattr(L, "_WANDB_RUN", None)
    assert L.maybe_wandb_init("proj") is None
    L.maybe_wandb_log({"x": 1})  # no-op

    logged = []

    class _Run:
        def log(self, metrics, step=None):
            logged.append((metrics, step))

    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: _Run()
    monkeypatch.setitem(sys.modules, "wandb", fake)
    monkeypatch.setenv("WANDB_PROJECT", "test-proj")
    run = L.maybe_wandb_init("proj")
    assert run is not None
    L.maybe_wandb_log({"loss": 0.5}, step=3)
    assert logged == [({"loss": 0.5}, 3)]
    monkeypatch.setattr(L, "_WANDB_RUN", None)


def test_cli_modules_run_as_main():
    """`python -m octic_vits_tpu.train.{deit,dinov2}.cli` must execute main()
    (reference entry points are runnable scripts: deit/main.py:790,
    dinov2/train/train.py:335). Regression: a missing __main__ guard made
    module-run a silent rc=0 no-op, which broke the round-5 TPU soak."""
    import subprocess
    import sys

    for mod in ("octic_vits_tpu.train.deit.cli",
                "octic_vits_tpu.train.dinov2.cli"):
        p = subprocess.run(
            [sys.executable, "-m", mod, "--help"],
            capture_output=True, text=True, timeout=300,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert p.returncode == 0, (mod, p.stderr[-500:])
        assert "usage" in p.stdout.lower(), (mod, p.stdout[:200])
