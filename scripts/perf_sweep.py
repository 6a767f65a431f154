"""One-shot consolidated perf sweep (single TPU session to amortize the
tunnel's stall risk): attention variants, block variants, and full-model
ViT-H throughput for every kernel configuration. Writes results to
perf_sweep.json as it goes."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.d8.group import pack_8_to_5
from octic_vits_tpu.layers.d8_layers import AttentionD8, BlockD8
from octic_vits_tpu.layers.vit_layers import Attention, Block
from octic_vits_tpu.models import OcticVisionTransformer, VisionTransformer
from octic_vits_tpu.utils.benchlib import measure_steps

B, N, C, H = 64, 257, 1280, 16
DT = jnp.bfloat16
RESULTS = {}
OUT = "/root/repo/perf_sweep.json"


def record(name, ms):
    RESULTS[name] = round(ms, 4)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"{name:40s} {ms:8.3f} ms", flush=True)


def tup():
    return pack_8_to_5(tuple(jnp.zeros((B, N, C // 8), DT) for _ in range(8)))


def run_module(name, module, x, k2=22):
    params = module.init(jax.random.PRNGKey(0), x)

    def apply_fn(p, probe):
        inp = (probe,) + x[1:] if isinstance(x, tuple) else probe
        out = module.apply(p, inp)
        # reduce over EVERY output: a partial return lets XLA dead-code-
        # eliminate whole branches and fakes the timing
        if isinstance(out, tuple):
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in out)
        else:
            s = jnp.sum(out.astype(jnp.float32))
        return s.reshape(1, 1)

    probe = x[0] if isinstance(x, tuple) else x
    record(name, measure_steps(apply_fn, params, probe, k1=2, k2=k2) * 1e3)


def run_model(name, model, k2=8):
    img = jnp.zeros((B, 224, 224, 3), DT)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    step = measure_steps(model.apply, params, img, k1=1, k2=k2, repeats=2)
    record(name, step * 1e3)
    return step


stages = sys.argv[1] if len(sys.argv) > 1 else "all"

if stages in ("all", "attn"):
    run_module("attn_d8_einsum", AttentionD8(num_heads=H, qkv_bias=True, dtype=DT), tup())
    run_module("attn_d8_pallas", AttentionD8(
        num_heads=H, qkv_bias=True, dtype=DT, use_pallas_attention=True), tup())
    run_module("attn_std_einsum", Attention(num_heads=H, qkv_bias=True, dtype=DT),
               jnp.zeros((B, N, C), DT))
    run_module("attn_std_pallas", Attention(
        num_heads=H, qkv_bias=True, dtype=DT, use_pallas_attention=True),
        jnp.zeros((B, N, C), DT))

if stages in ("all", "block"):
    run_module("block_d8_base", BlockD8(
        num_heads=H, qkv_bias=True, layerscale_init=1e-5, dtype=DT), tup())
    run_module("block_d8_kernels", BlockD8(
        num_heads=H, qkv_bias=True, layerscale_init=1e-5, dtype=DT,
        use_pallas_attention=True, use_pallas_linear=True), tup())
    run_module("block_std_base", Block(
        num_heads=H, qkv_bias=True, layerscale_init=1e-5, dtype=DT),
        jnp.zeros((B, N, C), DT))
    run_module("block_std_pallas_attn", Block(
        num_heads=H, qkv_bias=True, layerscale_init=1e-5, dtype=DT,
        use_pallas_attention=True), jnp.zeros((B, N, C), DT))

if stages in ("all", "model"):
    common = dict(
        img_size=224, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, qkv_bias=True, num_classes=1000, dtype=DT,
        scan_blocks=True,
    )
    s_h2 = run_model("model_hybrid_permodule", OcticVisionTransformer(
        use_pallas_attention=True, use_pallas_linear=True,
        use_pallas_std_mlp=True, fuse_mlp_branch=False, **common))
    s_s = run_model("model_std_kernels", VisionTransformer(
        use_pallas_attention=True, use_pallas_mlp=True, **common))
    record("speedup_hybrid_vs_std", s_s / s_h2 * 1000)
    print("ratio:", s_s / s_h2, flush=True)
