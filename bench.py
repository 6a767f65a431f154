"""Headline benchmark: hybrid octic ViT-H/14 inference throughput.

Protocol mirrors the reference complexity benchmark
(reference: experiments/complexity.py:13-56, README.md:260-264):
batch 64 @ 224^2, half precision (bf16 on TPU vs fp16 AMP on A100).
Timing runs the forward K times inside one on-device `lax.fori_loop`
dispatch (utils/benchlib.py) because per-dispatch relay latency would
otherwise dominate; the standard ViT-H baseline is measured with the same
protocol and the speedup ratio reported as `vs_baseline` (north star:
>= 1.5x, BASELINE.json).

Failure discipline (round-4 redesign): the round-3 driver bench died rc=124
with no output because a dead TPU backend made each child hang to its full
timeout and the retry loop had no total budget. Now:
  * ONE total wall-clock budget (default 900 s, env BENCH_BUDGET_S) enforced
    both by per-child timeouts and a process-level SIGALRM backstop;
  * dead-backend detection is decoupled from compile time: each child prints
    a HEARTBEAT line as soon as a trivial op completes on the backend
    (~seconds). No heartbeat within 300 s => the backend is dead => fail
    fast. A live child is then allowed to keep compiling up to the budget
    (a COLD persistent cache takes ~8 min for the hybrid ViT-H; killing it
    mid-compile would also forfeit the cache write, so patience is the only
    correct policy);
  * this script ALWAYS prints exactly one JSON line: on success with the
    measurement, on failure with `"value": null` and an `"error"` tail.

Success line:
  {"metric": "hybrid_vith14_images_per_sec_per_chip", "value": N,
   "unit": "images/sec", "vs_baseline": hybrid/standard speedup,
   "mfu": {"hybrid": f, "standard": f}, "runs": {...}}
MFU = 2 * analytic MACs/img (utils/flops.py) * img/s / v5e bf16 peak
(197 TFLOP/s); it normalizes round-over-round numbers against toolchain
drift and quantifies the remaining headroom (standard ~0.70, hybrid ~0.49).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

BATCH = 64
IMG = 224
CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
METRIC = "hybrid_vith14_images_per_sec_per_chip"
# total wall budget for the whole script; must stay well under the driver's
# own timeout so a structured error line is emitted instead of rc=124
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
FIRST_CHILD_TIMEOUT_S = float(os.environ.get("BENCH_FIRST_TIMEOUT_S", "300"))
V5E_BF16_PEAK_FLOPS = 197e12

_T0 = time.monotonic()
_LAST_ERR: list[str] = []


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _emit(value, vs_baseline, extra=None) -> None:
    line = {
        "metric": METRIC,
        "value": value,
        "unit": "images/sec",
        "vs_baseline": vs_baseline,
    }
    line.update(extra or {})
    print(json.dumps(line), flush=True)


def _fail(msg: str) -> "NoReturn":  # noqa: F821
    tail = (msg + ("\n" + "\n".join(_LAST_ERR[-3:]) if _LAST_ERR else ""))[-1500:]
    _emit(None, None, {"error": tail})
    sys.exit(1)


def _mfu(img_per_s: float, macs_per_img: float) -> float:
    return 2.0 * macs_per_img * img_per_s / V5E_BF16_PEAK_FLOPS


def _child(which: str) -> None:
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_SMOKE"):
        # the container's sitecustomize force-selects the axon platform
        # even under JAX_PLATFORMS=cpu; override it the way conftest does
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # liveness probe: completes in seconds on a healthy backend, hangs/dies
    # on a wedged one. The parent keys its fail-fast decision off this line,
    # NOT off total child runtime (compile on a cold cache takes ~8 min).
    probe = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    probe.block_until_ready()
    print(f"HEARTBEAT backend={jax.default_backend()}", flush=True)

    from octic_vits_tpu.models import OcticVisionTransformer, VisionTransformer
    from octic_vits_tpu.utils.benchlib import measure_steps

    if os.environ.get("BENCH_SMOKE"):  # CPU plumbing test: tiny model
        common = dict(
            img_size=56, patch_size=14, embed_dim=64, depth=2, num_heads=2,
            mlp_ratio=4.0, qkv_bias=True, num_classes=10, dtype=jnp.bfloat16,
            scan_blocks=True,
        )
    else:
        common = dict(
            img_size=IMG, patch_size=14, embed_dim=1280, depth=32,
            num_heads=16, mlp_ratio=4.0, qkv_bias=True, num_classes=1000,
            dtype=jnp.bfloat16, scan_blocks=True,
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
    sz = common["img_size"]
    images = jnp.zeros((BATCH, sz, sz, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    if os.environ.get("BENCH_PRECAST", "1") == "1":
        # bf16-resident weights, matching serving (model.half()) and the
        # reference's half-precision protocol (experiments/complexity.py:
        # 33-48). Measured NEUTRAL (498.5 vs 499.4 img/s, within noise):
        # XLA already hoists the loop-invariant f32->bf16 tree converts out
        # of the fori_loop, so they never were per-step cost. Kept so the
        # measurement stays insensitive to hoisting across toolchain drift.
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a,
            params,
        )
    step = measure_steps(model.apply, params, images)
    print(f"RESULT {BATCH / step:.4f}", flush=True)


def _run_child(which: str, timeout: float,
               heartbeat_timeout: float | None = None) -> float | None:
    """One measurement subprocess; returns img/s or None (error recorded).

    `heartbeat_timeout`, when set, bounds the time until the child's
    HEARTBEAT line (backend liveness) — a much tighter deadline than the
    full run, which may legitimately spend minutes in XLA compilation on a
    cold persistent cache.
    """
    import select

    def _stop(p) -> None:
        # SIGINT first: SIGKILLing a process holding the TPU wedges the
        # device lease for ~10-20 min, which would starve every later child
        if p.poll() is None:
            p.send_signal(signal.SIGINT)
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()

    timeout = min(timeout, max(_remaining(), 1.0))
    start = time.monotonic()
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", which],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    lines: list[str] = []
    beat = False
    result: float | None = None
    try:
        while True:
            elapsed = time.monotonic() - start
            if elapsed > timeout:
                if result is None:
                    # only an error if no RESULT was captured (a child that
                    # printed RESULT and then hung in teardown is a success)
                    _LAST_ERR.append(
                        f"child {which}: timeout after {timeout:.0f}s"
                        + ("" if beat else " (no heartbeat)"))
                _stop(proc)
                break
            if (not beat and heartbeat_timeout is not None
                    and elapsed > heartbeat_timeout):
                _LAST_ERR.append(
                    f"child {which}: no heartbeat within "
                    f"{heartbeat_timeout:.0f}s (backend dead?)")
                _stop(proc)
                break
            ready, _, _ = select.select([proc.stdout], [], [], 1.0)
            if not ready:
                if proc.poll() is not None:
                    # the OS pipe is drained but readline()'s TextIOWrapper
                    # may still hold complete buffered lines (two lines can
                    # arrive in one read chunk) — drain them before breaking
                    for line in proc.stdout:
                        lines.append(line.rstrip("\n"))
                        if line.startswith("RESULT "):
                            result = float(line.split()[1])
                    break
                continue
            line = proc.stdout.readline()
            if not line:  # EOF
                proc.wait(timeout=30)
                break
            lines.append(line.rstrip("\n"))
            if line.startswith("HEARTBEAT "):
                beat = True
            elif line.startswith("RESULT "):
                result = float(line.split()[1])
    finally:
        _stop(proc)
        proc.wait()
    if result is not None:
        return result
    if not _LAST_ERR or not _LAST_ERR[-1].startswith(f"child {which}"):
        _LAST_ERR.append(
            f"child {which}: no RESULT (rc={proc.returncode}): "
            + "\n".join(lines)[-600:]
        )
    sys.stderr.write(f"[bench] {_LAST_ERR[-1]}\n")
    return None


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        _child(sys.argv[2])
        return

    # process-level backstop: whatever happens below, a JSON line is printed
    def _alarm(signum, frame):
        _fail(f"budget {BUDGET_S:.0f}s exhausted (SIGALRM backstop)")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(BUDGET_S) + 30)

    # fail-fast probe: the first child doubles as measurement #1. Liveness
    # (HEARTBEAT line, ~seconds on a healthy backend) is bounded by
    # FIRST_CHILD_TIMEOUT_S; a live child may then compile for up to 45% of
    # the budget (cold persistent cache ~8 min for the hybrid), keeping the
    # rest in reserve for the standard-baseline child.
    first = _run_child("hybrid", max(0.45 * _remaining(), 60.0),
                       heartbeat_timeout=FIRST_CHILD_TIMEOUT_S)
    if first is None and "no heartbeat" in _LAST_ERR[-1]:
        first = _run_child("hybrid", max(0.45 * _remaining(), 60.0),
                           heartbeat_timeout=FIRST_CHILD_TIMEOUT_S)
    if first is None:
        _fail("TPU backend unavailable or wedged (first hybrid child failed)")

    # the standard baseline's FIRST child gets the same long-leash treatment
    # (round-4 lesson: a cold standard compile killed at a short timeout both
    # loses the run AND forfeits the persistent-cache write, so the next try
    # is just as cold). Liveness is still heartbeat-bounded.
    std_first = _run_child("standard", max(0.9 * _remaining(), 60.0),
                           heartbeat_timeout=FIRST_CHILD_TIMEOUT_S)
    if std_first is None and "no heartbeat" in _LAST_ERR[-1]:
        std_first = _run_child("standard", max(0.9 * _remaining(), 60.0),
                               heartbeat_timeout=FIRST_CHILD_TIMEOUT_S)
    if std_first is None:
        _fail("no successful standard-baseline run within budget")

    # best-of-N per model, N adaptive to the remaining budget. Cross-process
    # variance on this host is a few percent, and host contention can starve
    # a run outright — min-time/max-ips applied symmetrically; raw runs are
    # published so round-over-round ratio moves stay attributable.
    hybrid_runs = [first]
    standard_runs: list[float] = [std_first]
    plan = ["hybrid", "standard", "hybrid", "standard"]
    for which in plan:
        if _remaining() < 120:
            sys.stderr.write("[bench] budget low; stopping early\n")
            break
        r = _run_child(which, 600)
        if r is not None:
            (hybrid_runs if which == "hybrid" else standard_runs).append(r)

    hybrid_ips = max(hybrid_runs)
    standard_ips = max(standard_runs)
    if (max(hybrid_ips, standard_ips) < 100 and _remaining() > 200
            and not os.environ.get("BENCH_SMOKE")):
        # implausible on TPU (host contention?) — one symmetric retry
        sys.stderr.write("[bench] implausible throughput; one retry each\n")
        for which in ("hybrid", "standard"):
            r = _run_child(which, 600)
            if r is not None:
                (hybrid_runs if which == "hybrid" else standard_runs).append(r)
        hybrid_ips = max(hybrid_runs)
        standard_ips = max(standard_runs)

    from octic_vits_tpu.utils.flops import ViTSpec, octic_vit_macs, standard_vit_macs

    spec = ViTSpec(img_size=IMG, patch_size=14, embed_dim=1280, depth=32,
                   num_heads=16, mlp_ratio=4.0, num_classes=1000)
    _emit(
        round(hybrid_ips, 2),
        round(hybrid_ips / standard_ips, 4),
        {
            "mfu": {
                "hybrid": round(_mfu(hybrid_ips, octic_vit_macs(spec)), 4),
                "standard": round(_mfu(standard_ips, standard_vit_macs(spec)), 4),
            },
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
        },
    )


if __name__ == "__main__":
    main()
