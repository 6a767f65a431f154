"""Trace one supervised training step (fwd+bwd+optimizer) on TPU and dump
the top device ops — the bwd-side analog of trace_model.py.

Mirrors the training bench protocol (scripts/smoke_train_tpu.py / BENCH.md):
hybrid or standard ViT-H/14, B=32, bf16, scan trunk with remat, LAMB.

Usage: python scripts/trace_train.py [hybrid|standard] [topk] [--no-remat]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import optax

from octic_vits_tpu.models import OcticVisionTransformer, VisionTransformer
from octic_vits_tpu.train.common import create_train_state, make_train_step, cross_entropy_loss
from scripts.trace_model import parse_trace

B, IMG = 32, 224


def build(which, remat):
    common = dict(
        img_size=IMG, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, qkv_bias=True, num_classes=1000, dtype=jnp.bfloat16,
        scan_blocks=True, remat=remat,
    )
    if which == "hybrid":
        return OcticVisionTransformer(
            use_pallas_attention=True, use_pallas_linear=True,
            use_pallas_std_mlp=True, flat_e_carry=True, **common
        )
    return VisionTransformer(
        use_pallas_attention=True, use_pallas_mlp=True, **common
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "hybrid"
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    remat = "--no-remat" not in sys.argv
    log_dir = f"/tmp/trace_train_{which}"
    model = build(which, remat)
    images = jnp.zeros((B, IMG, IMG, 3), jnp.bfloat16)
    labels = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    tx = optax.lamb(1e-3, weight_decay=0.02)
    state = create_train_state(params, tx, ema=False)

    def apply_fn(p, x, rngs):
        return model.apply(p, x, deterministic=False, rngs=rngs)

    step = make_train_step(apply_fn, tx, cross_entropy_loss)
    rng = jax.random.PRNGKey(1)
    state, m = step(state, images, labels, rng)
    jax.block_until_ready(m)
    jax.profiler.start_trace(log_dir)
    for _ in range(3):
        state, m = step(state, images, labels, rng)
    jax.block_until_ready(m)
    jax.profiler.stop_trace()
    print(f"loss={float(m['loss']):.4f} remat={remat}")
    parse_trace(log_dir, topk)


if __name__ == "__main__":
    main()
