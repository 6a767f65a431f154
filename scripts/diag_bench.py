"""Staged ViT-H/14 compile + throughput diagnostic on the local chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.models import OcticVisionTransformer, VisionTransformer

t0 = time.time()
x = jnp.zeros((8, 128), jnp.bfloat16)
w = jnp.zeros((128, 128), jnp.bfloat16)
jax.block_until_ready(jax.jit(lambda a, b: a @ b)(x, w))
print("warmup %.1fs" % (time.time() - t0), flush=True)


def stage(name, cls=OcticVisionTransformer, **kw):
    m = cls(
        img_size=224, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, qkv_bias=True, num_classes=1000, dtype=jnp.bfloat16,
        scan_blocks=True, **kw,
    )
    img = jnp.zeros((64, 224, 224, 3), jnp.bfloat16)
    t0 = time.time()
    params = jax.jit(m.init)(jax.random.PRNGKey(0), img)
    jax.block_until_ready(params)
    print(name, "init %.1fs" % (time.time() - t0), flush=True)
    f = jax.jit(m.apply)

    def drain(o):
        return float(np.asarray(jax.device_get(o[0, 0])))

    t0 = time.time()
    drain(f(params, img))
    print(name, "fwd compile %.1fs" % (time.time() - t0), flush=True)

    def chained(k):
        """k calls with a data dependency between consecutive steps, one
        drain at the end — measures true sequential step time."""
        x = img
        t0 = time.time()
        out = None
        for _ in range(k):
            out = f(params, x)
            x = img + (out[0, 0] * 0).astype(img.dtype)
        drain(out)
        return time.time() - t0

    chained(2)  # compile the chained variant (input is now a traced add)
    t1 = min(chained(1) for _ in range(3))
    tk = min(chained(9) for _ in range(3))
    step = (tk - t1) / 8
    print(
        name,
        "steady %.1f ms/step -> %.1f img/s (1-call %.1f ms incl fetch)"
        % (step * 1e3, 64 / step, t1 * 1e3),
        flush=True,
    )


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "xla"):
        stage("hybrid-xla")
    if which in ("all", "gelu"):
        stage("hybrid-pallas-gelu", use_pallas_gelu=True)
    if which in ("all", "linear"):
        stage("hybrid-pallas-linear", use_pallas_linear=True)
    if which in ("all", "std"):
        stage("standard", cls=VisionTransformer)
