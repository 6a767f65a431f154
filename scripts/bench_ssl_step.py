"""DINOv2 SSL train-step throughput on the real chip.

Times the FULL SSLMetaArch step (teacher 2x224 fwd, student 2x224 + N x 96
fwd+bwd, packed DINO-head batch, DINO+iBOT+KoLeo losses, AdamW with
layerwise decay, teacher EMA) at paper-shaped crops, hybrid vs standard
backbone — the SSL analog of scripts/check_train_step_tpu.py.

Usage: python scripts/bench_ssl_step.py [hybrid|standard|all] [batch=16]
"""

import os
import random as pyrandom
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.train.dinov2.masking import (
    MaskingGenerator, collate_crops_and_masks,
)
from octic_vits_tpu.train.dinov2.ssl_meta_arch import SSLConfig, SSLMetaArch

ARCHS = {
    "hybrid": "hybrid_dinov2_vit_large_patch16",
    "standard": "dinov2_vit_large_patch16",
}


def run(which: str, b: int, iters: int = 8) -> float:
    cfg = SSLConfig(
        arch=ARCHS[which], img_size=224, local_crop_size=96, patch_size=16,
        drop_path_rate=0.0, n_local_crops=8, compute_dtype=jnp.bfloat16,
    )
    arch = SSLMetaArch(cfg)
    state = arch.init(jax.random.PRNGKey(0))
    step = jax.jit(arch.make_train_step(), donate_argnums=(0,))
    rng = pyrandom.Random(0)
    npr = np.random.RandomState(0)
    n_tokens = (224 // 16) ** 2
    gen = MaskingGenerator(224 // 16, num_masking_patches=n_tokens // 2)
    batch = collate_crops_and_masks(
        npr.randn(2 * b, 224, 224, 3).astype(np.float32),
        npr.randn(8 * b, 96, 96, 3).astype(np.float32),
        n_tokens, gen, rng=rng,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    sched = {"lr": 1e-4, "wd": 0.04, "last_layer_lr": 0.0,
             "momentum": 0.992, "teacher_temp": 0.04}
    t0 = time.time()
    state, metrics = step(state, batch, sched, jax.random.PRNGKey(1))
    loss = float(metrics["total_loss"])
    print(f"{which}: compile+step {time.time()-t0:.1f}s loss={loss:.3f}",
          flush=True)
    state, metrics = step(state, batch, sched, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)
    t0 = time.time()
    for i in range(iters):
        state, metrics = step(state, batch, sched, jax.random.PRNGKey(i))
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / iters
    print(f"{which}: SSL step {dt*1e3:.1f} ms -> {b/dt:.1f} img/s "
          f"(B={b}, 2x224 + 8x96 crops)", flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    if which in ("all", "hybrid"):
        h = run("hybrid", b)
    if which in ("all", "standard"):
        s = run("standard", b)
        if which == "all":
            print(f"SSL step speedup hybrid vs standard: {s/h:.3f}",
                  flush=True)
