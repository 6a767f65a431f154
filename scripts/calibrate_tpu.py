"""Calibrate achievable TFLOP/s through the axon stack with a pure matmul,
and time isolated hybrid vs standard sub-programs to localize overheads."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.utils.benchlib import measure_steps


def calibrate_matmul(n=4096, k=4096, m=4096):
    a = jnp.zeros((n, k), jnp.bfloat16)
    b = jnp.zeros((k, m), jnp.bfloat16)

    def apply_fn(b, a):
        return a @ b

    step = measure_steps(apply_fn, b, a, k1=4, k2=44, repeats=3)
    fl = 2 * n * k * m
    print(f"matmul {n}x{k}x{m}: {step*1e3:.2f} ms -> {fl/step/1e12:.1f} TF/s",
          flush=True)


def time_block_stack(kind):
    from octic_vits_tpu.layers.d8_layers import BlockD8
    from octic_vits_tpu.layers.vit_layers import Block
    from octic_vits_tpu.d8.group import pack_8_to_5

    B, N, C, H = 64, 257, 1280, 16
    if kind == "octic":
        blk = BlockD8(num_heads=H, qkv_bias=True, layerscale_init=1e-5,
                      dtype=jnp.bfloat16)
        xs = pack_8_to_5(tuple(
            jnp.zeros((B, N, C // 8), jnp.bfloat16) for _ in range(8)
        ))
        params = blk.init(jax.random.PRNGKey(0), xs)

        def apply_fn(p, x):
            a1 = x
            t = (a1,) + xs[1:]
            out = blk.apply(p, t)
            return out[0]

        step = measure_steps(apply_fn, params, xs[0], k1=2, k2=22)
    else:
        blk = Block(num_heads=H, qkv_bias=True, layerscale_init=1e-5,
                    dtype=jnp.bfloat16)
        x = jnp.zeros((B, N, C), jnp.bfloat16)
        params = blk.init(jax.random.PRNGKey(0), x)
        step = measure_steps(blk.apply, params, x, k1=2, k2=22)
    print(f"{kind} block: {step*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "matmul"):
        calibrate_matmul()
    if which in ("all", "blocks"):
        time_block_stack("standard")
        time_block_stack("octic")
