"""End-to-end on-chip training smoke: a small hybrid octic ViT must fit a
synthetic labeled set (loss decreasing) with the fused kernels active, and
one SSL step must run in bf16. The convergence check runs the whole loop
inside a lax.fori_loop (single dispatch)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.models import OcticVisionTransformer


def supervised_smoke(steps=60):
    model = OcticVisionTransformer(
        img_size=64, patch_size=8, embed_dim=128, depth=4, num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, num_classes=8, dtype=jnp.bfloat16,
        init_scale=1.0,
        use_pallas_attention=True, use_pallas_linear=True,
    )
    b = 32
    images = jax.random.normal(jax.random.PRNGKey(0), (b, 64, 64, 3), jnp.bfloat16)
    labels = jax.random.randint(jax.random.PRNGKey(1), (b,), 0, 8)
    params = model.init(jax.random.PRNGKey(2), images)["params"]
    tx = optax.adamw(3e-4)

    def loss_fn(p):
        logits = model.apply({"params": p}, images)
        onehot = jax.nn.one_hot(labels, 8)
        return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(
            logits.astype(jnp.float32), -1), -1))

    @jax.jit
    def train(params, opt_state):
        def body(_, carry):
            p, o, _ = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        first_loss = loss_fn(params)
        p, o, last_loss = jax.lax.fori_loop(
            0, steps, body, (params, opt_state, jnp.float32(0))
        )
        return first_loss, last_loss

    t0 = time.time()
    first, last = train(params, tx.init(params))
    first, last = float(first), float(last)
    print(f"supervised smoke: loss {first:.3f} -> {last:.3f} "
          f"({steps} steps, {time.time()-t0:.1f}s)", flush=True)
    assert np.isfinite(last) and last < 0.5 * first, (first, last)
    print("supervised smoke: PASS", flush=True)


def ssl_smoke():
    import random as pyrandom

    from octic_vits_tpu.models import OcticDinoVisionTransformer
    from octic_vits_tpu.models.registry import register_model
    from octic_vits_tpu.train.dinov2.masking import (
        MaskingGenerator, collate_crops_and_masks,
    )
    from octic_vits_tpu.train.dinov2.ssl_meta_arch import SSLConfig, SSLMetaArch

    @register_model
    def _smoke_octic_dinov2(img_size=64, **kw):
        kw.pop("drop_path_rate", None)
        return OcticDinoVisionTransformer(
            img_size=img_size, patch_size=8, embed_dim=128, depth=4,
            num_heads=4, mlp_ratio=2.0, init_scale=1e-5,
            drop_path_rate=0.0, **kw,
        )

    cfg = SSLConfig(
        arch="_smoke_octic_dinov2", img_size=64, local_crop_size=32,
        patch_size=8, drop_path_rate=0.0, dino_out_dim=256,
        dino_head_hidden_dim=64, dino_head_bottleneck_dim=32,
        ibot_out_dim=256, n_local_crops=4, compute_dtype=jnp.bfloat16,
    )
    arch = SSLMetaArch(cfg)
    state = arch.init(jax.random.PRNGKey(0))
    step = jax.jit(arch.make_train_step(), donate_argnums=(0,))
    rng = pyrandom.Random(0)
    npr = np.random.RandomState(0)
    b = 8
    n_tokens = 64
    gen = MaskingGenerator(8, num_masking_patches=32)
    batch = collate_crops_and_masks(
        npr.randn(2 * b, 64, 64, 3).astype(np.float32),
        npr.randn(4 * b, 32, 32, 3).astype(np.float32),
        n_tokens, gen, rng=rng,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    sched = {"lr": 1e-4, "wd": 0.04, "last_layer_lr": 0.0,
             "momentum": 0.992, "teacher_temp": 0.04}
    t0 = time.time()
    state, metrics = step(state, batch, sched, jax.random.PRNGKey(1))
    vals = {k: float(v) for k, v in metrics.items()}
    print(f"ssl smoke: {vals} ({time.time()-t0:.1f}s)", flush=True)
    assert np.isfinite(vals["total_loss"])
    print("ssl smoke: PASS", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "sup"):
        supervised_smoke()
    if which in ("all", "ssl"):
        ssl_smoke()
