"""Measure the v5e per-matmul cost law for the attention kernel's two
matmul shapes, inside a Pallas kernel exactly like the attention kernels.

Hypotheses to separate:
  - lane-parallelism: MXUs split work by output lanes, so an 80->128-lane
    output matmul ([N,N]@[N,80] AV) engages 1 MXU while the [N,80]@[80,N]
    scores matmul (384 output lanes) engages 3.
  - K-splitting: the compiler parallelizes over the contraction instead.

Per grid step each kernel body runs 16 identical matmuls (like 16 heads)
on data already in VMEM; inputs are aligned; outputs reduce to a max so
stores don't dominate. Run: python scripts/r3_matmul_law.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from octic_vits_tpu.utils.benchlib import measure_steps

B = 64
N = 257
DT = jnp.bfloat16


def _mm_kernel(a, b, o, *, mode, reps):
    acc = None
    for i in range(reps):
        # nonlinear per-rep perturbation: affine ones get algebraically
        # factored out of the matmul by the compiler
        ai = jnp.maximum(a[0], jnp.asarray(-10.0 - i, a.dtype))
        if mode == "nt":      # scores: contract last dims  [M,K]x[L,K]->[M,L]
            r = jax.lax.dot_general(
                ai, b[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:                  # nn: [M,K]x[K,L]->[M,L]
            r = jax.lax.dot_general(
                ai, b[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m = jnp.max(r)
        acc = m if acc is None else acc + m
    o[0, :, :] = jnp.zeros((8, 128), jnp.float32) + acc


def bench_mm(name, a_shape, b_shape, mode, reps=16):
    a = (jax.random.normal(jax.random.PRNGKey(0), (B,) + a_shape) * 0.02).astype(DT)
    bm = (jax.random.normal(jax.random.PRNGKey(1), (B,) + b_shape) * 0.02).astype(DT)

    def run(params, x):
        aa = params[0] + x
        bb = params[1] + x
        out = pl.pallas_call(
            functools.partial(_mm_kernel, mode=mode, reps=reps),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1,) + a_shape, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + b_shape, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            interpret=jax.default_backend() == "cpu",
        )(aa, bb)
        return jnp.max(out)

    x = jnp.zeros((1,), DT)
    step = measure_steps(run, (a, bm), x, k1=2, k2=12)
    per_mm = step / (B * reps) * 1e9
    print(f"{name:42s} {step*1e6:9.1f} us   {per_mm:8.0f} ns/matmul",
          flush=True)
    return step


def main():
    print(f"B={B} grid steps x 16 matmuls each, bf16, f32 acc", flush=True)
    # scores shape: q [N,80] x k [N,80] contracting 80 -> [N,N]
    bench_mm("scores  [257,80]x[257,80]^T -> 384L", (N, 80), (N, 80), "nt")
    # AV shape: p [N,N] x v [N,80] -> [N,80]: 128 output lanes
    bench_mm("AV      [257,257]x[257,80] -> 128L", (N, N), (N, 80), "nn")
    bench_mm("AV wide [257,257]x[257,256] -> 256L", (N, N), (N, 256), "nn")
    bench_mm("AV wide [257,257]x[257,384] -> 384L", (N, N), (N, 384), "nn")
    bench_mm("AV wide [257,257]x[257,512] -> 512L", (N, N), (N, 512), "nn",
             reps=8)
    # lane-width sweep at fixed K=257
    bench_mm("nn      [257,257]x[257,128]", (N, N), (N, 128), "nn")
    # K sweep at fixed 128 lanes out
    bench_mm("nn      [257,128]x[128,128]", (N, 128), (128, 128), "nn")
    bench_mm("nn      [257,512]x[512,128]", (N, 512), (512, 128), "nn")
    # scores vs padded-K
    bench_mm("nt      [257,128]x[257,128]^T", (N, 128), (N, 128), "nt")
    # big-square calibration
    bench_mm("nn      [256,512]x[512,512]", (256, 512), (512, 512), "nn",
             reps=8)

    # batched (leading-dim) matmuls: one instruction for 16 heads
    def batched_kernel(a, b, o, *, mode):
        ai = jnp.maximum(a[0], jnp.asarray(-10.0, a.dtype))
        if mode == "nt":
            r = jax.lax.dot_general(
                ai, b[0], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        else:
            r = jax.lax.dot_general(
                ai, b[0], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        o[0, :, :] = jnp.zeros((8, 128), jnp.float32) + jnp.max(r)

    def bench_batched(name, a_shape, b_shape, mode):
        a = (jax.random.normal(jax.random.PRNGKey(0), (B,) + a_shape) * 0.02
             ).astype(DT)
        bm = (jax.random.normal(jax.random.PRNGKey(1), (B,) + b_shape) * 0.02
              ).astype(DT)

        def run(params, x):
            aa = jnp.maximum(params[0], x - 100.0)
            bb = params[1]
            out = pl.pallas_call(
                functools.partial(batched_kernel, mode=mode),
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1,) + a_shape, lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1,) + b_shape, lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
                interpret=jax.default_backend() == "cpu",
            )(aa, bb)
            return jnp.max(out)

        x = jnp.zeros((1,), DT)
        step = measure_steps(run, (a, bm), x, k1=2, k2=12)
        print(f"{name:42s} {step*1e6:9.1f} us   {step/(B*16)*1e9:8.0f} ns/head",
              flush=True)

    bench_batched("BATCH16 scores [16,257,128]nt", (16, N, 128), (16, N, 128),
                  "nt")
    bench_batched("BATCH16 AV [16,257,257]x[16,257,128]", (16, N, N),
                  (16, N, 128), "nn")


if __name__ == "__main__":
    main()
