"""DINOv2 SSL train-step throughput on the real chip.

Times the FULL SSLMetaArch step (teacher 2x224 fwd, student 2x224 + N x 96
fwd+bwd, packed DINO-head batch, DINO+iBOT+KoLeo losses, AdamW with
layerwise decay, teacher EMA) at paper-shaped crops, hybrid vs standard
backbone — the SSL analog of scripts/check_train_step_tpu.py.

Usage: python scripts/bench_ssl_step.py [hybrid|standard|all] [batch=16]
                                         [--size large|huge] [--trace]

--size huge benches ViT-H/16 (the paper's headline DINOv2 config,
reference: dinov2 configs + configs/train/hybrid_vith16.yaml here).
--trace dumps a per-op device-time aggregation of the step (teacher scan /
student scan / head+loss groups), trace_model.py methodology.
"""

import os
import random as pyrandom
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octic_vits_tpu.train.dinov2.masking import (
    MaskingGenerator, collate_crops_and_masks,
)
from octic_vits_tpu.train.dinov2.ssl_meta_arch import SSLConfig, SSLMetaArch

ARCHS = {
    "large": {
        "hybrid": "hybrid_dinov2_vit_large_patch16",
        "standard": "dinov2_vit_large_patch16",
    },
    "huge": {
        "hybrid": "hybrid_dinov2_vit_huge_patch16",
        "standard": "dinov2_vit_huge_patch16",
    },
}


def run(which: str, b: int, iters: int = 8, size: str = "large",
        trace: bool = False) -> float:
    cfg = SSLConfig(
        arch=ARCHS[size][which], img_size=224, local_crop_size=96,
        patch_size=16,
        drop_path_rate=0.0, n_local_crops=8, compute_dtype=jnp.bfloat16,
        # scan+remat needed for the H/16 student fwd+bwd to fit 16G HBM;
        # L/16 at B=16 also overflows by ~0.7G without remat (round-4
        # measurement), so --remat forces it on for the two-sided L/16
        # hybrid-vs-standard ratio (same remat policy both sides = fair)
        backbone_scan=True,
        backbone_remat=((size == "huge" or "--remat" in sys.argv)
                        and "--no-remat" not in sys.argv),
    )
    arch = SSLMetaArch(cfg)
    state = arch.init(jax.random.PRNGKey(0))
    step = jax.jit(arch.make_train_step(), donate_argnums=(0,))
    rng = pyrandom.Random(0)
    npr = np.random.RandomState(0)
    n_tokens = (224 // 16) ** 2
    gen = MaskingGenerator(224 // 16, num_masking_patches=n_tokens // 2)
    batch = collate_crops_and_masks(
        npr.randn(2 * b, 224, 224, 3).astype(np.float32),
        npr.randn(8 * b, 96, 96, 3).astype(np.float32),
        n_tokens, gen, rng=rng,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    sched = {"lr": 1e-4, "wd": 0.04, "last_layer_lr": 0.0,
             "momentum": 0.992, "teacher_temp": 0.04}
    t0 = time.time()
    state, metrics = step(state, batch, sched, jax.random.PRNGKey(1))
    loss = float(metrics["total_loss"])
    print(f"{which}: compile+step {time.time()-t0:.1f}s loss={loss:.3f}",
          flush=True)
    state, metrics = step(state, batch, sched, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)
    t0 = time.time()
    for i in range(iters):
        state, metrics = step(state, batch, sched, jax.random.PRNGKey(i))
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / iters
    print(f"{which} {size}: SSL step {dt*1e3:.1f} ms -> {b/dt:.1f} img/s "
          f"(B={b}, 2x224 + 8x96 crops)", flush=True)
    if trace:
        _trace_step(which, size, step, state, batch, sched)
    return dt


def _trace_step(which, size, step, state, batch, sched):
    """Per-op device-time aggregation (trace_model.py methodology): leaf
    device ops attributed to their innermost enclosing while-loop (= a
    scanned trunk: teacher / student, octic / standard halves); everything
    outside the scans is patch-embed / head / loss / optimizer work."""
    import glob
    import gzip
    import json
    from collections import defaultdict

    log_dir = f"/tmp/trace_ssl_{which}_{size}"
    with jax.profiler.trace(log_dir):
        _, metrics = step(state, batch, sched, jax.random.PRNGKey(7))
        jax.block_until_ready(metrics)
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found", flush=True)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
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
    totals = defaultdict(float)
    counts = defaultdict(int)
    scope_totals = defaultdict(float)
    for _, evs in by_thread.items():
        evs.sort(key=lambda x: (x[0], -x[1]))
        stack = []
        n = len(evs)
        for i, (ts, dur, name) in enumerate(evs):
            while stack and stack[-1][0] <= ts:
                stack.pop()
            scope = next(
                (sc for _, sc in reversed(stack) if sc.startswith("while")),
                "-",
            )
            nxt = evs[i + 1][0] if i + 1 < n else float("inf")
            is_leaf = nxt >= ts + dur or evs[i + 1][1] == 0
            if is_leaf and dur > 0:
                totals[(scope, name)] += dur
                counts[(scope, name)] += 1
                scope_totals[scope] += dur
            else:
                stack.append((ts + dur, name))
    tot = sum(totals.values())
    print(f"--- {which} {size} trace: {path}", flush=True)
    print(f"total leaf device time {tot/1e3:.1f} ms; by scope:", flush=True)
    for sc, d in sorted(scope_totals.items(), key=lambda kv: -kv[1]):
        print(f"  {d/1e3:9.2f} ms  [{sc}]", flush=True)
    print("top ops:", flush=True)
    for (sc, name), dur in sorted(totals.items(), key=lambda kv: -kv[1])[:45]:
        print(f"  {dur/1e3:9.3f} ms  x{counts[(sc, name)]:<5d} [{sc:8s}] "
              f"{name}", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = args[0] if args else "all"
    b = int(args[1]) if len(args) > 1 else 16
    size = "large"
    if "--size" in sys.argv:
        size = sys.argv[sys.argv.index("--size") + 1]
    trace = "--trace" in sys.argv
    if which in ("all", "hybrid"):
        h = run("hybrid", b, size=size, trace=trace)
    if which in ("all", "standard"):
        s = run("standard", b, size=size, trace=trace)
        if which == "all":
            print(f"SSL step speedup hybrid vs standard: {s/h:.3f}",
                  flush=True)
