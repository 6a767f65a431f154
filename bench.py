"""Headline benchmark: hybrid octic ViT-H/14 inference throughput.

Protocol mirrors the reference complexity benchmark
(reference: experiments/complexity.py:13-56, README.md:260-264):
batch 64 @ 224^2, half precision (bf16 on TPU vs fp16 AMP on A100).
Timing runs the forward K times inside one on-device `lax.fori_loop`
dispatch (utils/benchlib.py) because per-dispatch relay latency would
otherwise dominate; the standard ViT-H baseline is measured with the same
protocol and the speedup ratio reported as `vs_baseline` (north star:
>= 1.5x, BASELINE.json).

Robustness: the device tunnel occasionally wedges on host fetches, so each
measurement runs in a subprocess with a timeout and is retried.

Prints ONE json line:
  {"metric": "hybrid_vith14_images_per_sec_per_chip", "value": N,
   "unit": "images/sec", "vs_baseline": hybrid/standard speedup}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

BATCH = 64
IMG = 224
CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def _child(which: str) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from octic_vits_tpu.models import OcticVisionTransformer, VisionTransformer
    from octic_vits_tpu.utils.benchlib import measure_steps

    common = dict(
        img_size=IMG, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, qkv_bias=True, num_classes=1000, dtype=jnp.bfloat16,
        scan_blocks=True,
    )
    on_tpu = jax.default_backend() not in ("cpu",)
    if which == "hybrid":
        model = OcticVisionTransformer(
            use_pallas_attention=on_tpu, use_pallas_linear=on_tpu,
            use_pallas_std_mlp=on_tpu, flat_e_carry=True,
            fuse_mlp=on_tpu, fuse_qkv=on_tpu, **common
        )
    else:
        # the baseline gets the same generic fused kernels —
        # apples-to-apples, like the reference benching both models under
        # torch.compile (reference: experiments/complexity.py:40-56)
        model = VisionTransformer(
            use_pallas_attention=on_tpu, use_pallas_mlp=on_tpu, **common
        )
    images = jnp.zeros((BATCH, IMG, IMG, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    step = measure_steps(model.apply, params, images)
    print(f"RESULT {BATCH / step:.4f}", flush=True)


def _run_child(which: str, timeout: int = 1800, retries: int = 3) -> float:
    # the device tunnel can stall 10-20 min before recovering; budget for it
    env = dict(os.environ)
    for attempt in range(retries):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", which],
                capture_output=True, text=True, timeout=timeout, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT "):
                    return float(line.split()[1])
            sys.stderr.write(
                f"[bench] child {which} attempt {attempt}: no RESULT\n"
                + proc.stdout[-2000:] + proc.stderr[-2000:] + "\n"
            )
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"[bench] child {which} attempt {attempt}: timeout\n")
    raise RuntimeError(f"benchmark child '{which}' failed after {retries} tries")


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        _child(sys.argv[2])
        return
    # best-of-3 per model: cross-process variance on this host is a few
    # percent (one outlier measured standard at 429 vs its steady 412),
    # and host contention can starve the timing entirely (a concurrent
    # pytest run once produced 17.7 "img/s") — min-time/max-ips is the
    # standard defense, applied symmetrically; raw runs are published in
    # the JSON so round-over-round ratio moves are attributable
    hybrid_runs = [_run_child("hybrid") for _ in range(3)]
    standard_runs = [_run_child("standard") for _ in range(3)]
    if max(hybrid_runs) < 100 or max(standard_runs) < 100:
        sys.stderr.write(
            f"[bench] implausible ({max(hybrid_runs):.0f}/"
            f"{max(standard_runs):.0f} img/s) — host contention? "
            "retrying once\n"
        )
        import time

        time.sleep(30)
        hybrid_runs.append(_run_child("hybrid"))
        standard_runs.append(_run_child("standard"))
    hybrid_ips = max(hybrid_runs)
    standard_ips = max(standard_runs)
    print(
        json.dumps(
            {
                "metric": "hybrid_vith14_images_per_sec_per_chip",
                "value": round(hybrid_ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(hybrid_ips / standard_ips, 4),
                "runs": {
                    "hybrid_img_per_s": [round(r, 1) for r in hybrid_runs],
                    "standard_img_per_s": [round(r, 1) for r in standard_runs],
                    "hybrid_ms_per_batch": [
                        round(1e3 * BATCH / r, 2) for r in hybrid_runs
                    ],
                    "standard_ms_per_batch": [
                        round(1e3 * BATCH / r, 2) for r in standard_runs
                    ],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
