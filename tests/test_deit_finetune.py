"""DeiT finetune/distillation/attn-only/grad-accum wiring tests
(reference behaviors: deit/main.py:282-338 finetune + pos-embed interp,
deit/main.py:318-338 attn-only freeze, deit/losses.py:10-70 distillation).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight lane; quick lane: -m "not slow"


from octic_vits_tpu.models import VisionTransformer
from octic_vits_tpu.train.common import create_train_state
from octic_vits_tpu.train.deit.engine import (
    DeiTConfig,
    build_optimizer,
    make_deit_train_step,
)


def tiny_vit(num_classes=4, img_size=32):
    return VisionTransformer(
        img_size=img_size, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        mlp_ratio=2.0, qkv_bias=True, num_classes=num_classes,
        drop_path_rate=0.0,
    )


def _cfg(**kw):
    base = dict(
        num_classes=4, epochs=1, batch_size=8, steps_per_epoch=2,
        warmup_epochs=0, lr=1e-3, drop_path=0.0, mixup_alpha=0.0,
        cutmix_alpha=0.0, loss_type="ce", smoothing=0.0, ema_decay=0.9,
    )
    base.update(kw)
    return DeiTConfig(**base)


def _setup(cfg, seed=0):
    model = tiny_vit(num_classes=cfg.num_classes)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3))
    )["params"]
    tx = build_optimizer(cfg, params)
    state = create_train_state(params, tx, ema=True)
    return model, params, tx, state


def _batch(b=8, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(b, 32, 32, 3), jnp.float32),
        jnp.asarray(rng.randint(0, 4, size=(b,))),
    )


def test_grad_accum_matches_big_batch():
    """accum_steps=k must reproduce the one-big-batch update (fp tolerance)."""
    images, labels = _batch()
    rng = jax.random.PRNGKey(3)
    results = {}
    for k in (1, 2, 4):
        cfg = _cfg(accum_steps=k)
        model, params, tx, state = _setup(cfg)
        step = jax.jit(make_deit_train_step(model, cfg, tx))
        new_state, metrics = step(state, images, labels, rng)
        results[k] = (new_state.params, float(metrics["loss"]))
    p1, l1 = results[1]
    for k in (2, 4):
        pk, lk = results[k]
        assert lk == pytest.approx(l1, rel=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7),
            p1, pk,
        )


def test_attn_only_freezes_everything_else():
    from octic_vits_tpu.utils.finetune import attn_only_trainable_mask

    cfg = _cfg(attn_only=True)
    model, params, tx, state = _setup(cfg)
    mask = attn_only_trainable_mask(params)
    step = jax.jit(
        make_deit_train_step(model, cfg, tx, trainable_mask=mask)
    )
    images, labels = _batch()
    new_state = state
    for i in range(2):
        new_state, _ = step(new_state, images, labels, jax.random.PRNGKey(i))

    flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    flat_mask = jax.tree_util.tree_flatten_with_path(mask)[0]
    n_frozen = n_trained = 0
    for (path, old), (_, new), (_, trainable) in zip(
        flat_old, flat_new, flat_mask
    ):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if trainable:
            n_trained += 1
        else:
            n_frozen += 1
            np.testing.assert_array_equal(
                np.asarray(old), np.asarray(new), err_msg=name
            )
    assert n_frozen > 0 and n_trained > 0
    # and at least one attention param actually moved
    moved = any(
        not np.array_equal(np.asarray(o), np.asarray(n))
        for (_, o), (_, n), (_, t) in zip(flat_old, flat_new, flat_mask)
        if t
    )
    assert moved


def test_distillation_wiring_changes_update():
    cfg_plain = _cfg()
    model, params, tx, state = _setup(cfg_plain)
    images, labels = _batch()
    rng = jax.random.PRNGKey(7)

    step_plain = jax.jit(make_deit_train_step(model, cfg_plain, tx))
    s_plain, m_plain = step_plain(state, images, labels, rng)

    # teacher = a differently-seeded copy of the same tiny model
    cfg_soft = dataclasses.replace(cfg_plain, distillation_type="soft")
    t_model, t_params, _, _ = _setup(cfg_plain, seed=99)
    teacher_apply = lambda x: t_model.apply({"params": t_params}, x)
    model2, params2, tx2, state2 = _setup(cfg_soft)
    step_soft = jax.jit(
        make_deit_train_step(model2, cfg_soft, tx2, teacher_apply=teacher_apply)
    )
    s_soft, m_soft = step_soft(state2, images, labels, rng)
    assert float(m_soft["loss"]) != pytest.approx(float(m_plain["loss"]))
    assert np.isfinite(float(m_soft["loss"]))

    # hard mode runs too
    cfg_hard = dataclasses.replace(cfg_plain, distillation_type="hard")
    step_hard = jax.jit(
        make_deit_train_step(model2, cfg_hard, tx2, teacher_apply=teacher_apply)
    )
    _, m_hard = step_hard(state2, images, labels, rng)
    assert np.isfinite(float(m_hard["loss"]))

    # distillation without a teacher is a config error
    with pytest.raises(ValueError):
        make_deit_train_step(model2, cfg_soft, tx2)


def test_finetune_load_merges_drops_head_and_interpolates(tmp_path):
    import orbax.checkpoint as ocp

    from octic_vits_tpu.utils.finetune import (
        interpolate_vit_pos_embed,
        load_pretrained_for_finetune,
    )

    src = tiny_vit(num_classes=4, img_size=32)
    src_params = src.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    ck = ocp.StandardCheckpointer()
    path = str(tmp_path / "pretrained")
    ck.save(path, {"params": jax.device_get(src_params), "step": 5}, force=True)
    ck.wait_until_finished()

    # different class count AND different resolution (grid 4 -> 5)
    dst = tiny_vit(num_classes=7, img_size=40)
    dst_init = dst.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 40, 40, 3))
    )["params"]
    merged = load_pretrained_for_finetune(path, dst_init)

    # head dropped (shape mismatch -> fresh init kept)
    np.testing.assert_array_equal(
        np.asarray(merged["head"]["kernel"]),
        np.asarray(dst_init["head"]["kernel"]),
    )
    # pos-embed bicubic-interpolated to the new grid
    expect = interpolate_vit_pos_embed(
        np.asarray(src_params["pos_embed"]), 5
    )
    np.testing.assert_allclose(
        np.asarray(merged["pos_embed"]), expect, rtol=1e-6
    )
    # matching params taken verbatim from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(merged["cls_token"]), np.asarray(src_params["cls_token"])
    )
    q = lambda p: np.asarray(
        p["blocks_0"]["attn"]["qkv"]["kernel"]
        if "blocks_0" in p else p["blocks"]["0"]["attn"]["qkv"]["kernel"]
    )
    np.testing.assert_array_equal(q(merged), q(src_params))
