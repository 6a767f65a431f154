"""Dump the backend-optimized HLO of a flagship forward / train step to a
local text file (works over the axon relay where --xla_dump_to would land
on the remote compile service's filesystem, not ours).

Usage:
  python scripts/dump_hlo.py fwd   /tmp/hlo_fwd.txt    [batch]
  python scripts/dump_hlo.py train /tmp/hlo_train.txt  [batch] [--std]

The fwd target matches bench.py's hybrid child (flat-E carry, fused
qkv+attention, scan trunk); the train target matches
scripts/check_train_step_tpu.py (scan+remat, Pallas kernels, adamw).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.models import OcticVisionTransformer, VisionTransformer

mode, out_path = sys.argv[1], sys.argv[2]
B = int(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3].isdigit() else (
    64 if mode == "fwd" else 32)
std = "--std" in sys.argv

common = dict(
    img_size=224, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
    mlp_ratio=4.0, qkv_bias=True, num_classes=1000, dtype=jnp.bfloat16,
    scan_blocks=True,
)
if std:
    model = VisionTransformer(
        use_pallas_attention=True, use_pallas_mlp=True,
        remat=(mode == "train"), **common)
else:
    model = OcticVisionTransformer(
        use_pallas_attention=True, use_pallas_linear=True,
        use_pallas_std_mlp=True, flat_e_carry=True, fuse_qkv=True,
        remat=(mode == "train"), **common)

img = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)
params = jax.jit(model.init)(jax.random.PRNGKey(0), img)["params"]

if mode == "fwd":
    def fn(p, x):
        return model.apply({"params": p}, x, deterministic=True)

    lowered = jax.jit(fn).lower(params, img)
else:
    from octic_vits_tpu.train.common import (
        create_train_state, cross_entropy_loss, make_train_step,
    )

    tx = optax.adamw(1e-4)
    state = create_train_state(params, tx)

    def apply_fn(p, x, rngs):
        return model.apply({"params": p}, x, deterministic=False, rngs=rngs)

    step = make_train_step(apply_fn, tx, cross_entropy_loss)
    labels = jnp.arange(B) % 1000
    lowered = jax.jit(step).lower(state, img, labels, jax.random.PRNGKey(1))

compiled = lowered.compile()
txt = compiled.as_text()
with open(out_path, "w") as f:
    f.write(txt)
print(f"wrote {len(txt)/1e6:.1f} MB of optimized HLO to {out_path}")
