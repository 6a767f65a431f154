"""Measure the wide-qkv path at hybrid ViT-H shapes (B=64, H=16, N=257).

Compares the full qkv-linear -> attention segment:
  A. XLA batched-dot qkv linear + octic_attention      (round-1 shipping path)
  B. pallas tuple-store linear + octic_attention
  C. pallas WIDE-store linear + octic_attention_wide   (the BENCH.md plan)
plus the isolated linear variants. Run on TPU:
  python scripts/profile_wide_qkv.py [--bwd]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.ops.pallas_attention import (
    octic_attention, octic_attention_wide,
)
from octic_vits_tpu.ops.pallas_linear import linear_d8_fused, linear_d8_qkv_wide
from octic_vits_tpu.utils.benchlib import measure_steps

B, H, N = 64, 16, 257
C = 1280
C8 = C // 8
F = 3 * C8         # qkv out per 1-dim irrep
M = B * N
DT = jnp.bfloat16


def bench(name, fn, params):
    x = jnp.zeros((1,), DT)
    step = measure_steps(fn, params, x, k1=2, k2=22)
    print(f"{name:44s} {step*1e6:9.1f} us", flush=True)
    return step


def main():
    bwd = "--bwd" in sys.argv
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x1 = (jax.random.normal(ks[0], (4, M, C8)) * 0.2).astype(DT)
    xef = (jax.random.normal(ks[1], (M, 4 * C8)) * 0.2).astype(DT)
    w1 = (jax.random.normal(ks[2], (4, C8, F)) * 0.05).astype(DT)
    we = (jax.random.normal(ks[3], (2 * C8, 2 * F)) * 0.05).astype(DT)
    b = (jax.random.normal(ks[4], (F,)) * 0.05).astype(DT)

    def prep(params, x):
        x1_, xef_, w1_, we_, b_ = (p + x.astype(p.dtype) for p in params)
        return x1_, xef_, w1_, we_, b_

    def red(outs):
        return jnp.stack([jnp.max(o) for o in outs])

    def wrap(f):
        if not bwd:
            return f
        def g(params, x):
            return jax.grad(
                lambda p: jnp.sum(f(p, x).astype(jnp.float32))
            )(params)[0][0, 0, 0]
        return g

    # ---- isolated linears -------------------------------------------------
    def lin_xla(params, x):
        x1_, xef_, w1_, we_, b_ = prep(params, x)
        y1 = jax.lax.dot_general(
            x1_, w1_, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=DT,
        )
        row0 = xef_[:, : 2 * C8] @ we_
        row1 = xef_[:, 2 * C8 :] @ we_
        return jnp.stack(
            (jnp.max(y1), jnp.max(row0), jnp.max(row1))
        )

    def lin_tuple(params, x):
        y1, yef = linear_d8_fused(*prep(params, x), None, None, None, None,
                                  False, False)
        return jnp.stack((jnp.max(y1), jnp.max(yef)))

    def lin_wide(params, x):
        y = linear_d8_qkv_wide(*prep(params, x), H, False)
        return jnp.max(y)

    params = (x1, xef, w1, we, b)
    bench("linear qkv: XLA batched dot", lin_xla, params)
    bench("linear qkv: pallas tuple store", lin_tuple, params)
    bench("linear qkv: pallas WIDE store", lin_wide, params)

    # ---- full qkv + attention segments ------------------------------------
    def seg_a(params, x):
        x1_, xef_, w1_, we_, b_ = prep(params, x)
        y1 = jax.lax.dot_general(
            x1_, w1_, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=DT,
        )
        y1 = y1.at[0].add(b_)
        arrs = tuple(y1[g].reshape(B, N, F) for g in range(4))
        e0 = (xef_[:, : 2 * C8] @ we_).reshape(B, N, 2 * F)
        e1 = (xef_[:, 2 * C8 :] @ we_).reshape(B, N, 2 * F)
        outs = octic_attention(*arrs, e0, e1, H, False)
        return red(outs).max()

    def seg_b(params, x):
        y1, yef = linear_d8_fused(*prep(params, x), None, None, None, None,
                                  False, False)
        arrs = tuple(y1[g].reshape(B, N, F) for g in range(4))
        e0 = yef[:, : 2 * F].reshape(B, N, 2 * F)
        e1 = yef[:, 2 * F :].reshape(B, N, 2 * F)
        outs = octic_attention(*arrs, e0, e1, H, False)
        return red(outs).max()

    def seg_c(params, x):
        y = linear_d8_qkv_wide(*prep(params, x), H, False)
        outs = octic_attention_wide(y.reshape(B, N, 3 * C), H, False)
        return red(outs).max()

    tag = " (fwd+bwd)" if bwd else ""
    bench(f"segment A: XLA lin + octic attn{tag}", wrap(seg_a), params)
    bench(f"segment B: tuple lin + octic attn{tag}", wrap(seg_b), params)
    bench(f"segment C: WIDE lin + wide attn{tag}", wrap(seg_c), params)


if __name__ == "__main__":
    main()
