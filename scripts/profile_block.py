"""Per-component timing of the octic block at ViT-H shapes (B=64, N=257,
C=1280) to localize the non-matmul overhead."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.d8.group import pack_8_to_5
from octic_vits_tpu.layers.d8_layers import (
    AttentionD8, GeluD8, LayerNormD8, LinearD8, MlpD8,
)
from octic_vits_tpu.layers.vit_layers import Attention
from octic_vits_tpu.utils.benchlib import measure_steps

B, N, C, H = 64, 257, 1280, 16
DT = jnp.bfloat16


def tup():
    return pack_8_to_5(tuple(jnp.zeros((B, N, C // 8), DT) for _ in range(8)))


def run(name, module, x, method=None, k2=22):
    params = module.init(jax.random.PRNGKey(0), x)

    def apply_fn(p, a1):
        inp = (a1,) + x[1:] if isinstance(x, tuple) else a1
        out = module.apply(p, inp)
        # reduce over EVERY output or XLA dead-code-eliminates branches
        if isinstance(out, tuple):
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in out)
        else:
            s = jnp.sum(out.astype(jnp.float32))
        return s.reshape(1, 1)

    probe = x[0] if isinstance(x, tuple) else x
    step = measure_steps(apply_fn, params, probe, k1=2, k2=k2)
    print(f"{name:34s} {step*1e3:8.3f} ms", flush=True)
    return step


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "attn"):
    run("AttentionD8 (einsum)", AttentionD8(num_heads=H, qkv_bias=True, dtype=DT), tup())
    run("AttentionD8 (pallas)", AttentionD8(
        num_heads=H, qkv_bias=True, dtype=DT, use_pallas_attention=True), tup())
    run("Attention standard (einsum)", Attention(num_heads=H, qkv_bias=True, dtype=DT),
        jnp.zeros((B, N, C), DT))
    run("Attention standard (pallas)", Attention(
        num_heads=H, qkv_bias=True, dtype=DT, use_pallas_attention=True),
        jnp.zeros((B, N, C), DT))
if which in ("all", "mlp"):
    run("MlpD8 (xla)", MlpD8(dtype=DT), tup())
    run("MlpD8 (pallas fused)", MlpD8(dtype=DT, use_pallas_linear=True), tup())
if which in ("all", "norm"):
    run("LayerNormD8", LayerNormD8(), tup())
if which in ("all", "gelu"):
    run("GeluD8 eager (hidden width)", GeluD8(), pack_8_to_5(tuple(
        jnp.zeros((B, N, 4 * C // 8), DT) for _ in range(8))))
    run("GeluD8 pallas (hidden width)", GeluD8(use_pallas=True), pack_8_to_5(tuple(
        jnp.zeros((B, N, 4 * C // 8), DT) for _ in range(8))))
if which in ("all", "linear"):
    run("LinearD8 qkv (xla)", LinearD8(3 * C, dtype=DT), tup())
    run("LinearD8 qkv (pallas)", LinearD8(3 * C, dtype=DT, use_pallas=True), tup())
