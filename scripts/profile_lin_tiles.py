"""Tile-size sweep for the pallas qkv linear (tuple + wide stores) at
hybrid ViT-H qkv shapes. Run on TPU: python scripts/profile_lin_tiles.py"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import octic_vits_tpu.ops.pallas_linear as PL
from octic_vits_tpu.utils.benchlib import measure_steps

B, H, N = 64, 16, 257
C = 1280
C8 = C // 8
F = 3 * C8
M = B * N
DT = jnp.bfloat16


def bench(name, fn, params):
    x = jnp.zeros((1,), DT)
    step = measure_steps(fn, params, x, k1=2, k2=22)
    print(f"{name:44s} {step*1e6:9.1f} us", flush=True)
    return step


def call_tuple(x1, xef, w1, we, tm):
    grid = (pl.cdiv(M, tm),)
    kern = functools.partial(PL._kernel, fuse_gelu=False, use_bias=False,
                             use_epilogue=False)
    bias = jnp.zeros((1, F), DT)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, tm, C8), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * C8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C8, F), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * C8, 2 * F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((4, tm, F), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, M, F), DT),
            jax.ShapeDtypeStruct((M, 4 * F), DT),
        ),
    )(x1, xef, w1, we, bias)


def call_wide(x1, xef, w1, we, tm):
    grid = (pl.cdiv(M, tm),)
    kern = functools.partial(PL._wide_kernel, num_heads=H, use_bias=False)
    bias = jnp.zeros((1, F), DT)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, tm, C8), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * C8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C8, F), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * C8, 2 * F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 8 * F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 8 * F), DT),
    )(x1, xef, w1, we)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x1 = (jax.random.normal(ks[0], (4, M, C8)) * 0.2).astype(DT)
    xef = (jax.random.normal(ks[1], (M, 4 * C8)) * 0.2).astype(DT)
    w1 = (jax.random.normal(ks[2], (4, C8, F)) * 0.05).astype(DT)
    we = (jax.random.normal(ks[3], (2 * C8, 2 * F)) * 0.05).astype(DT)
    params = (x1, xef, w1, we)

    for tm in (128, 192, 256, 384, 512, 1024):
        def run_t(p, x, tm=tm):
            x1_, xef_, w1_, we_ = (q + x.astype(q.dtype) for q in p)
            y1, yef = call_tuple(x1_, xef_, w1_, we_, tm)
            return jnp.maximum(jnp.max(y1), jnp.max(yef))
        bench(f"tuple store  tm={tm}", run_t, params)

    for tm in (128, 192, 256, 384, 512, 1024):
        def run_w(p, x, tm=tm):
            x1_, xef_, w1_, we_ = (q + x.astype(q.dtype) for q in p)
            return jnp.max(call_wide(x1_, xef_, w1_, we_, tm))
        bench(f"WIDE  store  tm={tm}", run_w, params)


if __name__ == "__main__":
    main()
