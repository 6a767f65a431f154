"""Model-level A/B for round-3 octic-block candidates (bench.py protocol:
hybrid ViT-H/14, B=64 @ 224^2, bf16, fused kernels, scan trunk).

Usage: python scripts/r3_model_ab.py [variant ...]
Variants: base flat  (default: all)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.models import OcticVisionTransformer
from octic_vits_tpu.utils.benchlib import measure_steps

B, IMG = 64, 224

COMMON = dict(
    img_size=IMG, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
    mlp_ratio=4.0, qkv_bias=True, num_classes=1000, dtype=jnp.bfloat16,
    scan_blocks=True, use_pallas_attention=True, use_pallas_linear=True,
    use_pallas_std_mlp=True,
)

VARIANTS = {
    "base": {},
    "flat": {"flat_e_carry": True},
    "flat_mlpbranch": {"flat_e_carry": True, "fuse_mlp_branch": True},
    "mlpbranch": {"fuse_mlp_branch": True},
    "flat_epi": {"flat_e_carry": True, "fuse_block_epilogues": True},
    "flat_xstdmlp": {"flat_e_carry": True, "use_pallas_std_mlp": False},
    "flat_xoctmlp": {"flat_e_carry": True, "use_pallas_linear": False,
                     "use_pallas_gelu": True},
    "flat_xoctmlp2": {"flat_e_carry": True, "use_pallas_linear": False},
    "flat_fusemlp": {"flat_e_carry": True, "fuse_mlp": True},
    "flat_fuseqkv": {"flat_e_carry": True, "fuse_mlp": True,
                     "fuse_qkv": True},
    "flat_fuseqkv_u2": {"flat_e_carry": True, "fuse_mlp": True,
                        "fuse_qkv": True, "scan_unroll": 2},
    "flat_fuseqkv_u4": {"flat_e_carry": True, "fuse_mlp": True,
                        "fuse_qkv": True, "scan_unroll": 4},
    "packed": {"packed_carry": True, "fuse_mlp": True, "fuse_qkv": True},
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    images = jnp.zeros((B, IMG, IMG, 3), jnp.bfloat16)
    params = None
    for name in names:
        cfg = dict(COMMON)
        cfg.update(VARIANTS[name])
        model = OcticVisionTransformer(**cfg)
        if params is None:
            params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
        step = measure_steps(model.apply, params, images)
        print(f"{name:12s} {step*1e3:8.2f} ms/64  {B/step:8.1f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
