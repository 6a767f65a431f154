"""Compile + run a kernel-equipped hybrid training step on the real chip
(exercises the Pallas attention/linear BACKWARD kernels under Mosaic) and
time hybrid vs standard train steps."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.models import OcticVisionTransformer, VisionTransformer
from octic_vits_tpu.train.common import (
    create_train_state, cross_entropy_loss, make_train_step,
)
from octic_vits_tpu.utils.benchlib import measure_steps

B = 32


def build(model):
    img = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)["params"]
    tx = optax.adamw(1e-4)
    state = create_train_state(params, tx)

    def apply_fn(p, x, rngs):
        return model.apply({"params": p}, x, deterministic=False, rngs=rngs)

    step = make_train_step(apply_fn, tx, cross_entropy_loss)
    labels = jnp.arange(B) % 1000
    return state, step, img, labels


def run(name, model, iters=12):
    state, step, img, labels = build(model)
    t0 = time.time()
    state, metrics = step(state, img, labels, jax.random.PRNGKey(1))
    loss0 = float(metrics["loss"])  # forces completion
    print(f"{name}: compile+step {time.time()-t0:.1f}s loss={loss0:.3f}",
          flush=True)
    # async back-to-back steps; sync once — per-step host sync would add
    # ~50 ms of axon relay latency to every step
    state, metrics = step(state, img, labels, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics)
    t0 = time.time()
    for i in range(iters):
        state, metrics = step(state, img, labels, jax.random.PRNGKey(i))
    jax.block_until_ready(metrics)
    p50 = (time.time() - t0) / iters
    print(f"{name}: train step {p50*1e3:.1f} ms -> {B/p50:.1f} img/s",
          flush=True)
    return p50


common = dict(
    img_size=224, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
    mlp_ratio=4.0, qkv_bias=True, num_classes=1000, dtype=jnp.bfloat16,
    scan_blocks=True, remat=True,
)
if "--unroll" in sys.argv:
    common["scan_unroll"] = int(sys.argv[sys.argv.index("--unroll") + 1])
if "--split-transpose" in sys.argv:
    common["scan_split_transpose"] = True
which = sys.argv[1] if len(sys.argv) > 1 else "all"
if len(sys.argv) > 2:
    B = int(sys.argv[2])
if "--no-remat" in sys.argv:
    common["remat"] = False
if which in ("all", "hybrid"):
    packed = "--packed" in sys.argv
    h = run("hybrid(kernels)", OcticVisionTransformer(
        use_pallas_attention=True, use_pallas_linear=True,
        use_pallas_std_mlp=True, use_wide_qkv="--wide" in sys.argv,
        flat_e_carry=not packed and "--no-flat" not in sys.argv,
        packed_carry=packed,
        fuse_mlp=packed or "--fusemlp" in sys.argv,
        fuse_qkv=packed or "--fuseqkv" in sys.argv,
        **common))
if which in ("all", "std"):
    s = run("standard(kernels)", VisionTransformer(
        use_pallas_attention=True, use_pallas_mlp=True, **common))
    if which == "all":
        print(f"train-step speedup hybrid vs std: {s/h:.3f}", flush=True)
