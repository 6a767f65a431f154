"""DINOv2 SSL meta-arch tests: one full train step on a tiny octic backbone,
loss math parity checks, masking/collate static shapes.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight lane; quick lane: -m "not slow"


from octic_vits_tpu.models.registry import register_model
from octic_vits_tpu.train.dinov2 import losses as L
from octic_vits_tpu.train.dinov2.masking import (
    MaskingGenerator,
    collate_crops_and_masks,
    mask_upperbound,
)
from octic_vits_tpu.train.dinov2.schedules import (
    CosineScheduler,
    build_ssl_schedules,
    sqrt_lr_scaling,
)
from octic_vits_tpu.train.dinov2.ssl_meta_arch import SSLConfig, SSLMetaArch


# register a micro octic dinov2 arch for tests
@register_model
def _test_octic_dinov2(img_size=32, **kwargs):
    from octic_vits_tpu.models import OcticDinoVisionTransformer

    kwargs.setdefault("drop_path_rate", 0.0)
    return OcticDinoVisionTransformer(
        img_size=img_size, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        mlp_ratio=2.0, init_scale=1e-5, **kwargs,
    )


def tiny_cfg(**kw):
    defaults = dict(
        arch="_test_octic_dinov2",
        img_size=32,
        local_crop_size=16,
        patch_size=8,
        drop_path_rate=0.0,
        dino_out_dim=64,
        dino_head_hidden_dim=32,
        dino_head_bottleneck_dim=16,
        ibot_out_dim=64,
        n_local_crops=2,
        compute_dtype=jnp.float32,
    )
    defaults.update(kw)
    return SSLConfig(**defaults)


def make_batch(cfg, b=2, seed=0):
    rng = random.Random(seed)
    npr = np.random.RandomState(seed)
    n_tokens = (cfg.img_size // cfg.patch_size) ** 2
    gen = MaskingGenerator(
        cfg.img_size // cfg.patch_size,
        num_masking_patches=n_tokens // 2,
    )
    gc = npr.randn(2 * b, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    lc = npr.randn(
        cfg.n_local_crops * b, cfg.local_crop_size, cfg.local_crop_size, 3
    ).astype(np.float32)
    return collate_crops_and_masks(
        gc, lc, n_tokens, gen, mask_probability=0.5,
        mask_ratio_tuple=(0.1, 0.5), rng=rng,
    )


@pytest.mark.parametrize("centering", ["centering", "sinkhorn_knopp"])
def test_ssl_train_step(centering):
    cfg = tiny_cfg(centering=centering)
    arch = SSLMetaArch(cfg)
    state = arch.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    sched = {
        "lr": 1e-4, "wd": 0.04, "last_layer_lr": 0.0,
        "momentum": 0.992, "teacher_temp": 0.04,
    }
    step = jax.jit(arch.make_train_step())
    state, metrics = step(state, batch, sched, jax.random.PRNGKey(1))
    state, metrics = step(state, batch, sched, jax.random.PRNGKey(1))
    assert int(state.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(metrics["total_loss"]) != 0.0
    if centering == "centering":
        assert float(jnp.abs(state.dino_center).max()) > 0


def test_ssl_train_step_ibot_separate_head():
    """Separate-iBOT-head layout end-to-end (reference trains both layouts,
    dinov2/train/ssl_meta_arch.py:84-112): one jitted step, finite losses,
    and the ibot head receives its own (distinct) gradients."""
    cfg = tiny_cfg(ibot_separate_head=True)
    arch = SSLMetaArch(cfg)
    state = arch.init(jax.random.PRNGKey(0))
    assert "ibot_head" in state.student
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    sched = {
        "lr": 1e-3, "wd": 0.04, "last_layer_lr": 1e-3,
        "momentum": 0.992, "teacher_temp": 0.04,
    }
    step = jax.jit(arch.make_train_step())
    new_state, metrics = step(state, batch, sched, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(metrics["ibot_loss"]) != 0.0
    # the separate ibot head trained: every leaf moved…
    ib_old = jax.tree.leaves(state.student["ibot_head"])
    ib_new = jax.tree.leaves(new_state.student["ibot_head"])
    assert any(
        float(jnp.abs(a - b).max()) > 0 for a, b in zip(ib_old, ib_new)
    )
    # …and its update is distinct from the dino head's (same init via
    # head(out_dim) but different loss paths)
    dh_delta = jax.tree.map(
        lambda a, b: b - a, state.student["dino_head"],
        new_state.student["dino_head"],
    )
    ib_delta = jax.tree.map(
        lambda a, b: b - a, state.student["ibot_head"],
        new_state.student["ibot_head"],
    )
    diffs = [
        float(jnp.abs(d - i).max())
        for d, i in zip(jax.tree.leaves(dh_delta), jax.tree.leaves(ib_delta))
        if d.shape == i.shape
    ]
    assert max(diffs) > 0


def test_teacher_ema_moves_toward_student():
    cfg = tiny_cfg()
    arch = SSLMetaArch(cfg)
    state = arch.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    sched = {
        "lr": 1e-2, "wd": 0.0, "last_layer_lr": 1e-2,
        "momentum": 0.9, "teacher_temp": 0.04,
    }
    step = jax.jit(arch.make_train_step())
    new_state, _ = step(state, batch, sched, jax.random.PRNGKey(1))
    # teacher changed (EMA), and equals 0.9*old_teacher + 0.1*new_student
    old_t = jax.tree.leaves(state.teacher)[0]
    new_t = jax.tree.leaves(new_state.teacher)[0]
    new_s = jax.tree.leaves(new_state.student)[0]
    np.testing.assert_allclose(
        np.asarray(new_t), 0.9 * np.asarray(old_t) + 0.1 * np.asarray(new_s),
        atol=1e-6,
    )


def test_dino_loss_matches_manual():
    key = jax.random.PRNGKey(0)
    s = jax.random.normal(key, (4, 8))
    t = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (4, 8)))
    out = L.dino_loss([s], [t], student_temp=0.1)
    lsm = jax.nn.log_softmax(s / 0.1, axis=-1)
    manual = -jnp.mean(jnp.sum(t * lsm, axis=-1))
    np.testing.assert_allclose(float(out), float(manual), rtol=1e-6)


def test_sinkhorn_rows_sum_to_one():
    t = jax.random.normal(jax.random.PRNGKey(0), (6, 10))
    q = L.sinkhorn_knopp_teacher(t, 0.07)
    np.testing.assert_allclose(np.asarray(q.sum(-1)), np.ones(6), atol=1e-4)


def test_sinkhorn_with_padding_mask():
    t = jax.random.normal(jax.random.PRNGKey(0), (6, 10))
    valid = jnp.array([1, 1, 1, 1, 0, 0], bool)
    q = L.sinkhorn_knopp_teacher(t, 0.07, sample_mask=valid)
    np.testing.assert_allclose(np.asarray(q[:4].sum(-1)), np.ones(4), atol=1e-4)
    np.testing.assert_allclose(np.asarray(q[4:]), 0.0, atol=1e-6)


def test_koleo_loss_finite_and_spreads():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    l1 = float(L.koleo_loss(x))
    assert np.isfinite(l1)
    # collapsed points -> much larger loss
    x2 = jnp.ones((8, 16)) + 1e-4 * jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    assert float(L.koleo_loss(x2)) > l1


def test_koleo_per_device_matches_per_shard_mean():
    """koleo_loss_per_device == mean of koleo_loss over the 8 device shards
    (the reference's per-GPU batch scope, koleo_loss.py:38-48) and differs
    from the global-batch nearest-neighbor scope."""
    from octic_vits_tpu.parallel import create_mesh

    mesh = create_mesh(devices=jax.devices()[:8], fsdp=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 8))
    got = float(L.koleo_loss_per_device(x, mesh))
    want = np.mean([float(L.koleo_loss(x[i * 2:(i + 1) * 2])) for i in range(8)])
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert abs(got - float(L.koleo_loss(x))) > 1e-4


def test_student_rng_streams_distinct():
    """Global- and local-crop student passes must draw uncorrelated
    dropout/droppath masks (reference draws fresh randomness per forward;
    round-1 bug: one shared rngs dict)."""
    import flax.linen as nn

    from octic_vits_tpu.train.dinov2.ssl_meta_arch import split_student_rngs

    rngs = {"dropout": jax.random.PRNGKey(7)}
    rngs_g, rngs_l = split_student_rngs(rngs)
    drop = nn.Dropout(rate=0.5, deterministic=False)
    x = jnp.ones((4, 32))
    out_g = drop.apply({}, x, rngs={"dropout": rngs_g["dropout"]})
    out_l = drop.apply({}, x, rngs={"dropout": rngs_l["dropout"]})
    assert not np.allclose(np.asarray(out_g), np.asarray(out_l))
    # and the split is deterministic
    rngs_g2, _ = split_student_rngs(rngs)
    out_g2 = drop.apply({}, x, rngs={"dropout": rngs_g2["dropout"]})
    np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_g2))
    assert split_student_rngs(None) == (None, None)


def test_center_update_formula():
    state = L.CenterState.create(4)
    t = jnp.arange(12.0).reshape(3, 4)
    new = L.update_center(state, t, momentum=0.9)
    np.testing.assert_allclose(
        np.asarray(new.center), 0.1 * np.asarray(t.mean(0)), atol=1e-6
    )


def test_cosine_scheduler_matches_reference_semantics():
    s = CosineScheduler(1.0, 0.1, total_iters=100, warmup_iters=10)
    assert s[0] == 0.0
    np.testing.assert_allclose(s[9], 1.0, atol=1e-6)
    np.testing.assert_allclose(s[99], 0.1 + 0.45 * (1 + np.cos(np.pi * 89 / 90)), atol=1e-6)
    assert s[1000] == 0.1


def test_mask_upperbound_deterministic_and_sufficient():
    b, n = 8, 16
    ub = mask_upperbound(b, n, 0.5, (0.1, 0.5))
    gen = MaskingGenerator(4, num_masking_patches=8)
    for seed in range(5):
        batch = collate_crops_and_masks(
            np.zeros((b, 8, 8, 3), np.float32),
            np.zeros((b, 4, 4, 3), np.float32),
            n, gen, rng=random.Random(seed),
        )
        assert batch["mask_indices"].shape == (ub,)
        assert batch["masks_weight"].shape == (ub,)
        nm = int(batch["n_masked_patches"])
        assert (batch["masks_weight"][nm:] == 0).all()


def test_sqrt_lr_scaling():
    np.testing.assert_allclose(sqrt_lr_scaling(0.004, 1024), 0.004)
    np.testing.assert_allclose(sqrt_lr_scaling(0.004, 4096), 0.008)
