"""Throughput / params / peak-memory table over the 6 paper models.

Analog of the reference complexity benchmark (reference:
experiments/complexity.py:19-103): B=64 @ 224^2, bf16 (the TPU analog of
fp16 AMP + torch.compile), 100 timed iters after 10 warmup, plus analytic
GMACs (utils/flops replaces fvcore).

Usage: python scripts/complexity.py [--models large] [--batch 64]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.models import create_model
from octic_vits_tpu.utils.flops import ViTSpec, gmacs, octic_vit_macs, standard_vit_macs

MODELS = {
    "huge": [
        ("deit_huge_patch14_LS", "standard", dict(patch=14, dim=1280, depth=32)),
        ("d8_inv_early_deit_huge_patch14", "invariant", dict(patch=14, dim=1280, depth=32)),
        ("hybrid_deit_huge_patch14", "hybrid", dict(patch=14, dim=1280, depth=32)),
    ],
    "large": [
        ("deit_large_patch16_LS", "standard", dict(patch=16, dim=1024, depth=24)),
        ("d8_inv_early_deit_large_patch16", "invariant", dict(patch=16, dim=1024, depth=24)),
        ("hybrid_deit_large_patch16", "hybrid", dict(patch=16, dim=1024, depth=24)),
    ],
}


def throughput(model, batch, iters=100, warmup=10):
    images = jnp.zeros((batch, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    fn = jax.jit(model.apply)  # params as args, never closure constants
    jax.block_until_ready(fn(params, images))
    for _ in range(warmup - 1):
        out = fn(params, images)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    return batch * iters / dt, n_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", choices=["huge", "large", "all"], default="all")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    groups = ["huge", "large"] if args.models == "all" else [args.models]

    print(f"{'model':42s} {'params(M)':>10s} {'GMACs':>8s} {'img/s':>10s}")
    for g in groups:
        for name, kind, d in MODELS[g]:
            spec = ViTSpec(patch_size=d["patch"], embed_dim=d["dim"], depth=d["depth"])
            if kind == "standard":
                g_macs = gmacs(standard_vit_macs(spec))
            else:
                g_macs = gmacs(octic_vit_macs(spec, invariant=kind == "invariant"))
            model = create_model(name, dtype=jnp.bfloat16)
            ips, n_params = throughput(model, args.batch)
            print(f"{name:42s} {n_params/1e6:10.1f} {g_macs:8.1f} {ips:10.1f}")


if __name__ == "__main__":
    main()
