"""Headline benchmark: hybrid octic ViT-H/14 inference throughput.

Protocol mirrors the reference complexity benchmark
(reference: experiments/complexity.py:13-56, README.md:260-264):
batch 64 @ 224^2, half precision (bf16 on TPU vs fp16 AMP on A100),
100 timed iters after 10 warmup. We additionally time the standard ViT-H
baseline and report the speedup ratio — the north-star metric is
>= 1.5x images/sec/chip for hybrid vs standard ViT-H (BASELINE.json).

Prints ONE json line:
  {"metric": "hybrid_vith14_images_per_sec_per_chip", "value": N,
   "unit": "images/sec", "vs_baseline": hybrid/standard speedup}
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the axon remote-compile warmup dominates
# first-run latency; cached executables make reruns immediate
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 64
IMG = 224
WARMUP = 10
ITERS = 100


def _throughput(apply_fn, params, images) -> float:
    # params are jit ARGUMENTS, never closure constants: capturing them
    # would embed the whole tree in the HLO (a giant device->host fetch).
    out = apply_fn(params, images)
    jax.block_until_ready(out)
    for _ in range(WARMUP - 1):
        out = apply_fn(params, images)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = apply_fn(params, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def bench_model(model) -> float:
    images = jnp.zeros((BATCH, IMG, IMG, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    fn = jax.jit(model.apply)
    return _throughput(fn, params, images)


def main():
    from octic_vits_tpu.models import OcticVisionTransformer, VisionTransformer

    use_pallas = True
    try:
        from octic_vits_tpu.ops.pallas_gelu import gelu_d8_pallas  # noqa: F401
    except Exception:
        use_pallas = False

    # scan_blocks: identical math, ~depth-times faster XLA compiles
    hybrid = OcticVisionTransformer(
        img_size=IMG, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, qkv_bias=True, num_classes=1000, dtype=jnp.bfloat16,
        scan_blocks=True,
        use_pallas_gelu=use_pallas and jax.default_backend() != "cpu",
    )
    standard = VisionTransformer(
        img_size=IMG, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, qkv_bias=True, num_classes=1000, dtype=jnp.bfloat16,
        scan_blocks=True,
    )

    hybrid_ips = bench_model(hybrid)
    standard_ips = bench_model(standard)

    print(
        json.dumps(
            {
                "metric": "hybrid_vith14_images_per_sec_per_chip",
                "value": round(hybrid_ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(hybrid_ips / standard_ips, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
