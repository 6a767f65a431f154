"""Throughput / params / peak-memory table over the 6 paper models.

Analog of the reference complexity benchmark (reference:
experiments/complexity.py:19-103): B=64 @ 224^2, bf16 (the TPU analog of
fp16 AMP + torch.compile), 100 timed iters after 10 warmup, plus analytic
GMACs (utils/flops replaces fvcore).

Usage: python scripts/complexity.py [--models large] [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def throughput(model, batch):
    from octic_vits_tpu.utils.benchlib import measure_steps

    images = jnp.zeros((batch, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    # on-device fori_loop with a data dependence between iterations —
    # plain repeated dispatch through the axon relay pipelines unboundedly
    # and reports enqueue rate, not device time (utils/benchlib.py)
    step = measure_steps(model.apply, params, images)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    return batch / step, n_params


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
            # best config, like the reference benching under --amp
            # --compile (experiments/complexity.py:13-15): scan trunk +
            # fused kernels on TPU (kernels interpret too slowly on CPU)
            on_tpu = jax.default_backend() not in ("cpu",)
            kernel_kw = dict(
                scan_blocks=True,
                use_pallas_attention=on_tpu,
            )
            if kind == "standard":
                kernel_kw["use_pallas_mlp"] = on_tpu
            else:
                kernel_kw["use_pallas_linear"] = on_tpu
                kernel_kw["use_pallas_std_mlp"] = on_tpu
                kernel_kw["flat_e_carry"] = True
                kernel_kw["fuse_mlp"] = on_tpu
                kernel_kw["fuse_qkv"] = on_tpu
            model = create_model(name, dtype=jnp.bfloat16, **kernel_kw)
            ips, n_params = throughput(model, args.batch)
            print(f"{name:42s} {n_params/1e6:10.1f} {g_macs:8.1f} {ips:10.1f}")


if __name__ == "__main__":
    main()
