"""Trace the flagship forward on TPU and dump the top device ops.

Runs the bench.py model (hybrid or standard, fused kernels, scan trunk)
under jax.profiler, parses the perfetto trace json, aggregates device-op
durations by op name, and prints the top-K. This is how the per-block
`reshape.92` / `copy.153` numbers in BENCH.md were found.

Usage: python scripts/trace_model.py [hybrid|standard] [topk]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.models import OcticVisionTransformer, VisionTransformer

B, IMG = 64, 224


def build(which):
    common = dict(
        img_size=IMG, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, qkv_bias=True, num_classes=1000, dtype=jnp.bfloat16,
        scan_blocks=True,
    )
    if which == "hybrid_packed":
        return OcticVisionTransformer(
            use_pallas_attention=True, use_pallas_linear=True,
            use_pallas_std_mlp=True, packed_carry=True, fuse_mlp=True,
            fuse_qkv=True, **common
        )
    if which in ("hybrid", "hybrid_wide", "hybrid_flat", "hybrid_fused",
                 "hybrid_fuseqkv"):
        return OcticVisionTransformer(
            use_pallas_attention=True, use_pallas_linear=True,
            use_pallas_std_mlp=True, use_wide_qkv=(which == "hybrid_wide"),
            flat_e_carry=which in ("hybrid_flat", "hybrid_fused",
                                   "hybrid_fuseqkv"),
            fuse_mlp=which in ("hybrid_fused", "hybrid_fuseqkv"),
            fuse_qkv=(which == "hybrid_fuseqkv"),
            **common
        )
    return VisionTransformer(
        use_pallas_attention=True, use_pallas_mlp=True, **common
    )


def parse_trace(log_dir, topk):
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {log_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    # collect device complete events per (pid, tid)
    by_thread = defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        by_thread[(e["pid"], e.get("tid"))].append(
            (e["ts"], e.get("dur", 0.0), e.get("name", "?"))
        )
    # LEAF ops only: an event is a leaf if no other event starts strictly
    # inside it on the same thread. Attribute each leaf to the innermost
    # enclosing while.* scope (the scan bodies) if any.
    totals = defaultdict(float)
    counts = defaultdict(int)
    for _, evs in by_thread.items():
        evs.sort(key=lambda x: (x[0], -x[1]))
        stack = []  # (end_ts, name) of open scopes
        n = len(evs)
        for i, (ts, dur, name) in enumerate(evs):
            while stack and stack[-1][0] <= ts:
                stack.pop()
            scope = next(
                (s for _, s in reversed(stack) if s.startswith("while")), "-"
            )
            nxt = evs[i + 1][0] if i + 1 < n else float("inf")
            is_leaf = nxt >= ts + dur or evs[i + 1][1] == 0
            if is_leaf and dur > 0:
                totals[(scope, name)] += dur
                counts[(scope, name)] += 1
            else:
                stack.append((ts + dur, name))
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:topk]
    tot = sum(totals.values())
    print(f"trace: {path}")
    print(f"total leaf device-op time: {tot/1e3:.2f} ms (3 runs)")
    by_scope = defaultdict(float)
    for (scope, _), dur in totals.items():
        by_scope[scope] += dur
    print("per-scope subtotals ('-' = outside every scan):")
    for scope, dur in sorted(by_scope.items(), key=lambda kv: -kv[1]):
        print(f"  {dur/1e3:9.3f} ms  [{scope}]")
    for (scope, name), dur in rows:
        print(f"  {dur/1e3:9.3f} ms  x{counts[(scope, name)]:<5d} "
              f"[{scope:8s}] {name}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "hybrid"
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    log_dir = f"/tmp/trace_{which}"
    model = build(which)
    images = jnp.zeros((B, IMG, IMG, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    fwd = jax.jit(model.apply)
    fwd(params, images).block_until_ready()  # compile outside the trace
    jax.profiler.start_trace(log_dir)
    for _ in range(3):
        out = fwd(params, images)
    out.block_until_ready()
    jax.profiler.stop_trace()
    parse_trace(log_dir, topk)


if __name__ == "__main__":
    main()
