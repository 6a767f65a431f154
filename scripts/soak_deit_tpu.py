"""Sustained end-to-end DeiT training soak on the real TPU chip.

Round-5 target (VERDICT.md Next#1): prove the integrated host-pipeline ->
jitted-step -> EMA -> checkpoint -> preemption-resume loop at paper shapes
(hybrid ViT-H/14, B=32, bf16, scan+remat) for hundreds of steps — the
reference's core capability is exactly this loop run for 400 epochs
(reference: deit/main.py:466-525).

Phases (all driven through the REAL CLI, octic_vits_tpu.train.deit.cli):
  0. generate a synthetic JPEG ImageFolder (64 classes x 100 train / 4 val,
     ~300px sources) so the host path does real decode + 3-Augment work;
  1. `--isolated`: build the IDENTICAL model/config/train-step and time
     synthetic-batch steps — the no-host-pipeline comparator (also warms the
     persistent compile cache for the phases below);
  2. phase A: train from scratch; when epoch 1 passes global step ~300,
     SIGTERM the process -> PreemptionGuard saves a checkpoint;
  3. phase C: copy the output dir twice, resume each copy for ~14 more
     steps, and assert the two final checkpoints are BITWISE identical
     (resume determinism);
  4. phase B: resume the original run to --max-steps and verify the loss
     kept decreasing.

Writes a JSON summary (steady-state step ms, isolated step ms, ratio,
loss curve) to <out>/soak_summary.json.

Usage: python scripts/soak_deit_tpu.py [--small] [--skip-data]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SOAK = os.path.join(REPO, ".soak")
DATA = os.path.join(SOAK, "data")
OUT = os.path.join(SOAK, "out")

N_CLASSES = 64
PER_CLASS = 100
VAL_PER_CLASS = 4
BATCH = 32
MODEL = "hybrid_deit_huge_patch14"
NUM_WORKERS = 4
# 6400 imgs / B=32 -> 200 steps/epoch; preempt in epoch 1 (step ~300+),
# resume runs to 520 (total >= 300 fresh + ~190 resumed steps).
# Progress prints land on the 50-iteration grid, so the trigger fires at
# the "Epoch 1  [100..." line = global step ~301.
PREEMPT_AFTER_EPOCH1_ITER = 100
MAX_STEPS_B = 520
DETERMINISM_EXTRA_STEPS = 14


def gen_data(root: str) -> None:
    """Synthetic JPEG ImageFolder with class-dependent structure (per-class
    hue + oriented gratings + noise) so training loss can actually fall."""
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(0)
    t0 = time.time()
    for split, per in (("train", PER_CLASS), ("val", VAL_PER_CLASS)):
        for c in range(N_CLASSES):
            d = os.path.join(root, split, f"class_{c:03d}")
            os.makedirs(d, exist_ok=True)
            base = np.array(
                [(c * 37) % 256, (c * 91) % 256, (c * 151) % 256], np.float32
            )
            freq = 0.05 + 0.01 * (c % 8)
            angle = (c // 8) * np.pi / 8
            yy, xx = np.mgrid[0:288, 0:288].astype(np.float32)
            grating = np.sin(
                freq * (np.cos(angle) * xx + np.sin(angle) * yy)
            )[..., None]
            for i in range(per):
                img = (
                    base[None, None, :]
                    + 60.0 * grating
                    + rng.normal(0, 25, (288, 288, 3))
                ).clip(0, 255).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(d, f"img_{i:04d}.jpg"), quality=85
                )
    print(f"[soak] dataset generated in {time.time() - t0:.0f}s", flush=True)


def cli_args(out_dir: str, max_steps: int | None, epochs: int, small: bool):
    a = [
        "--model", MODEL if not small else "_soak_tiny",
        "--batch-size", str(BATCH),
        "--epochs", str(epochs),
        "--data-set", "IMAGEFOLDER",
        "--data-path", DATA,
        "--output_dir", out_dir,
        "--num-workers", str(NUM_WORKERS),
        "--seed", "1337",
    ]
    if max_steps is not None:
        a += ["--max-steps", str(max_steps)]
    return a


def run_isolated(small: bool, iters: int = 12) -> float:
    """Time the IDENTICAL train step on synthetic device-resident batches.

    Uses the same create_model kwargs (train() TPU defaults), the same
    DeiTConfig the CLI builds (incl. derived steps_per_epoch=200 and
    num_classes=64), the same LAMB optimizer + EMA state — so its compiled
    HLO is byte-identical to phase A's and the persistent cache carries over.
    """
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from octic_vits_tpu.models import create_model
    from octic_vits_tpu.train.common import create_train_state
    from octic_vits_tpu.train.deit.cli import get_args_parser
    from octic_vits_tpu.train.deit.engine import (
        DeiTConfig, build_optimizer, make_deit_train_step, make_eval_step,
    )

    args = get_args_parser().parse_args(cli_args(OUT, None, 3, small))
    import dataclasses

    cfg = DeiTConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        unscale_lr=args.unscale_lr, weight_decay=args.weight_decay,
        warmup_epochs=args.warmup_epochs, warmup_lr=args.warmup_lr,
        min_lr=args.min_lr, loss_type="bce" if args.bce_loss else "ce",
        smoothing=args.smoothing, cosub=args.cosub, mixup_alpha=args.mixup,
        cutmix_alpha=args.cutmix, drop_path=args.drop_path,
        ema_decay=args.model_ema_decay, clip_grad=args.clip_grad,
    )
    n_train = N_CLASSES * PER_CLASS
    cfg = dataclasses.replace(
        cfg, num_classes=N_CLASSES,
        steps_per_epoch=max(1, n_train // cfg.batch_size),
    )
    kwargs = {}
    if jax.default_backend() not in ("cpu",):
        kwargs = dict(
            use_pallas_attention=True, dtype=jnp.bfloat16, scan_blocks=True,
            remat=True,
        )
        if args.model.startswith(("hybrid", "d8", "_t")):
            kwargs.update(use_pallas_linear=True, use_pallas_std_mlp=True,
                          flat_e_carry=True)
        else:
            kwargs.update(use_pallas_mlp=True)
    model = create_model(
        args.model, img_size=args.input_size, drop_path_rate=cfg.drop_path,
        num_classes=cfg.num_classes, **kwargs,
    )
    sample = jnp.zeros((1, args.input_size, args.input_size, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(1337), sample)["params"]
    tx = build_optimizer(cfg, params)
    state = create_train_state(params, tx, ema=True)
    step = jax.jit(make_deit_train_step(model, cfg, tx), donate_argnums=(0,))

    import numpy as np

    npr = np.random.RandomState(0)
    images = jnp.asarray(
        npr.randn(BATCH, args.input_size, args.input_size, 3), jnp.float32
    )
    labels = jnp.asarray(npr.randint(0, N_CLASSES, (BATCH,)))
    rng = jax.random.PRNGKey(1337)

    t0 = time.time()
    state, metrics = step(state, images, labels, rng)
    print(f"[isolated] compile+step {time.time() - t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}", flush=True)
    # warm the eval-step compile too (phase A evaluates at epoch ends)
    ev = jax.jit(make_eval_step(model))
    jax.block_until_ready(ev(state.params, images, labels))

    state, metrics = step(state, images, labels, rng)
    jax.block_until_ready(metrics)
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, images, labels, rng)
    jax.block_until_ready(metrics)
    ms = (time.time() - t0) / iters * 1e3
    print(f"ISOLATED_STEP_MS {ms:.1f}", flush=True)
    return ms


def run_phase_d(max_steps: int = 195, n_cached: int = 2048) -> None:
    """Host-law A/B: the SAME integrated train() loop (EMA, metric flush,
    logging, async dispatch) fed by PRE-AUGMENTED arrays instead of the
    JPEG decode + 3-Augment path. steady_state(phase D) - isolated step
    isolates the loop-glue overhead; steady_state(phase A) - phase D is the
    host decode/augment cost, which is core-count-bound (this VM: 1 core).

    Prints per-image host-pipeline costs (decode-only, decode+3-Augment)
    measured on this host, then the usual Epoch progress lines, then one
    PHASED_SUMMARY json line.
    """
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from PIL import Image

    from octic_vits_tpu.data.datasets import build_deit_dataset
    from octic_vits_tpu.data.transforms import PerSampleRng, three_augment
    from octic_vits_tpu.train.deit.cli import get_args_parser
    from octic_vits_tpu.train.deit.engine import DeiTConfig
    from octic_vits_tpu.train.deit.main import train

    args = get_args_parser().parse_args(cli_args(OUT, None, 3, False))
    train_tf = PerSampleRng(
        functools.partial(
            three_augment, size=args.input_size,
            color_jitter_strength=args.color_jitter, src=args.src,
            reprob=args.reprob, remode=args.remode, recount=args.recount,
        ),
        seed=args.seed,
    )
    raw_ds, nb_classes = build_deit_dataset(
        args.data_set, args.data_path, True, transform=None)

    # --- host-cost measurement on this machine (single-threaded) ---
    n_probe = 256
    t0 = time.time()
    imgs = [Image.open(raw_ds.samples[i][0]).convert("RGB")
            for i in range(n_probe)]
    decode_ms = (time.time() - t0) / n_probe * 1e3
    t0 = time.time()
    for i, im in enumerate(imgs):
        train_tf(im, index=i)
    aug_ms = (time.time() - t0) / n_probe * 1e3
    print(f"HOST_DECODE_MS_PER_IMG {decode_ms:.2f}", flush=True)
    print(f"HOST_AUGMENT_MS_PER_IMG {aug_ms:.2f}", flush=True)
    del imgs

    # --- pre-augment a cache through the identical transform ---
    t0 = time.time()
    first, lab0 = raw_ds[0]
    first = train_tf(first, index=0)
    cache = np.empty((n_cached,) + first.shape, first.dtype)
    labels = np.empty((n_cached,), np.int64)
    cache[0], labels[0] = first, lab0
    for i in range(1, n_cached):
        img, lab = raw_ds[i % len(raw_ds)]
        cache[i] = train_tf(img, index=i)
        labels[i] = lab
    print(f"[phaseD] cached {n_cached} augmented samples in "
          f"{time.time() - t0:.0f}s", flush=True)

    class CachedDataset:
        """Serves pre-augmented arrays; len matches the real dataset so
        steps_per_epoch (and the schedule arithmetic) is identical."""

        transform = None

        def __len__(self):
            return len(raw_ds)

        def __getitem__(self, idx):
            j = idx % n_cached
            return cache[j], labels[j]

    cfg = DeiTConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        unscale_lr=args.unscale_lr, weight_decay=args.weight_decay,
        warmup_epochs=args.warmup_epochs, warmup_lr=args.warmup_lr,
        min_lr=args.min_lr, loss_type="bce" if args.bce_loss else "ce",
        smoothing=args.smoothing, cosub=args.cosub, mixup_alpha=args.mixup,
        cutmix_alpha=args.cutmix, drop_path=args.drop_path,
        ema_decay=args.model_ema_decay, clip_grad=args.clip_grad,
        num_classes=nb_classes,
    )
    out_d = os.path.join(SOAK, "out_d")
    shutil.rmtree(out_d, ignore_errors=True)
    t0 = time.time()
    train(MODEL, cfg, CachedDataset(), None, out_d,
          img_size=args.input_size, seed=args.seed,
          num_workers=NUM_WORKERS, max_steps=max_steps)
    print("PHASED_SUMMARY " + json.dumps({
        "host_decode_ms_per_img": round(decode_ms, 2),
        "host_augment_ms_per_img": round(aug_ms, 2),
        "cached_samples": n_cached,
        "max_steps": max_steps,
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


def stream_child(cmd, preempt_epoch1_iter=None, timeout=7200,
                 log_name="phaseA"):
    """Run a CLI child, streaming stdout; optionally SIGTERM when
    'Epoch 1  [<iter>' >= preempt_epoch1_iter appears. Returns (rc, lines)."""
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env,
    )
    lines = []
    sent_term = False
    pat = re.compile(r"Epoch (\d+)\s+\[(\d+)")
    logf = open(os.path.join(SOAK, f"{log_name}.log"), "w")
    t0 = time.time()
    try:
        for line in proc.stdout:
            lines.append(line.rstrip("\n"))
            logf.write(line)
            logf.flush()
            if time.time() - t0 > timeout:
                proc.send_signal(signal.SIGINT)
                break
            m = pat.search(line)
            if (preempt_epoch1_iter is not None and not sent_term and m
                    and int(m.group(1)) >= 1
                    and int(m.group(2)) >= preempt_epoch1_iter):
                print(f"[soak] sending SIGTERM at {m.group(0)!r}", flush=True)
                proc.send_signal(signal.SIGTERM)
                sent_term = True
        rc = proc.wait(timeout=600)
    finally:
        logf.close()
        if proc.poll() is None:
            proc.kill()
    return rc, lines


def latest_ckpt_step(out_dir: str) -> int:
    d = os.path.join(out_dir, "ckpt")
    steps = [int(x) for x in os.listdir(d) if x.isdigit()]
    return max(steps)


def load_ckpt_tree(out_dir: str, step: int):
    import orbax.checkpoint as ocp

    path = os.path.join(out_dir, "ckpt", str(step), "default")
    return ocp.PyTreeCheckpointer().restore(path)


def trees_bitwise_equal(a, b) -> bool:
    import jax
    import numpy as np

    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    if len(leaves_a) != len(leaves_b):
        return False
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(leaves_a, leaves_b)
    )


def parse_losses(out_dir: str):
    """(iteration, loss-median) pairs from the json-lines training log."""
    path = os.path.join(out_dir, "log.txt")
    rows = []
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "loss" in e and "iteration" in e:
                rows.append((e["iteration"], e["loss"], e.get("iter_time")))
    return rows


def steady_state_ms(lines) -> float:
    """Median of the windowed iter-time averages printed at iters >= 100."""
    vals = []
    pat = re.compile(r"Epoch \d+\s+\[(\d+)\].*time: ([\d.]+)")
    for ln in lines:
        m = pat.search(ln)
        if m and int(m.group(1)) >= 100:
            vals.append(float(m.group(2)) * 1e3)
    vals.sort()
    return vals[len(vals) // 2] if vals else float("nan")


def _cli_cmd(small: bool):
    """Real-CLI invocation; --small routes through this script's
    --cli-child wrapper so the tiny test model is registered in the
    subprocess before cli.main runs."""
    if small:
        return [sys.executable, os.path.abspath(__file__),
                "--cli-child", "--small"]
    return [sys.executable, "-m", "octic_vits_tpu.train.deit.cli"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny model smoke (CPU plumbing test)")
    ap.add_argument("--skip-data", action="store_true")
    ap.add_argument("--isolated", action="store_true",
                    help="only run the isolated comparator")
    ap.add_argument("--phase-d", action="store_true",
                    help="host-law A/B: the integrated loop fed by "
                    "pre-augmented arrays (no decode/3-Augment per step)")
    ap.add_argument("--cli-child", action="store_true",
                    help="internal: register tiny model then run cli.main")
    ap.add_argument("--from-phase", choices=["all", "C", "B"], default="all",
                    help="resume an interrupted soak: skip completed phases, "
                    "recovering phase-A numbers from .soak/*.log; B re-checks "
                    "the existing phase-C checkpoints bitwise without "
                    "re-running the resume children")
    args, rest = ap.parse_known_args()

    if args.cli_child:
        if args.small:
            # orchestration smoke: force CPU (the container sitecustomize
            # force-selects the TPU platform regardless of JAX_PLATFORMS)
            import jax

            jax.config.update("jax_platforms", "cpu")
            _register_tiny()
        from octic_vits_tpu.train.deit.cli import main as cli_main

        cli_main(rest)
        return

    os.makedirs(SOAK, exist_ok=True)
    if args.phase_d:
        run_phase_d()
        return
    if args.isolated:
        if args.small:
            import jax

            jax.config.update("jax_platforms", "cpu")
            _register_tiny()
        run_isolated(args.small)
        return

    if not args.skip_data and not os.path.isdir(
            os.path.join(DATA, "train", "class_000")):
        gen_data(DATA)

    summary = {"model": MODEL, "batch": BATCH}

    if args.from_phase == "all":
        # ---- isolated comparator (also warms the compile cache) ----
        iso_cmd = [sys.executable, os.path.abspath(__file__), "--isolated"]
        if args.small:
            iso_cmd.append("--small")
        rc, lines = stream_child(iso_cmd, log_name="isolated")
        assert rc == 0, f"isolated comparator failed rc={rc}"
        iso = [ln for ln in lines if ln.startswith("ISOLATED_STEP_MS")]
        summary["isolated_step_ms"] = \
            float(iso[-1].split()[1]) if iso else None

        # ---- phase A: fresh run, SIGTERM mid-epoch-1 ----
        shutil.rmtree(OUT, ignore_errors=True)
        cmd = _cli_cmd(args.small) + cli_args(OUT, None, 3, args.small)
        t0 = time.time()
        rc, lines = stream_child(
            cmd, preempt_epoch1_iter=PREEMPT_AFTER_EPOCH1_ITER,
            log_name="phaseA",
        )
        summary["phaseA_wall_s"] = round(time.time() - t0, 1)
        assert any("preempted; checkpoint saved" in ln for ln in lines), (
            f"phase A did not take the preemption path (rc={rc}); "
            f"tail: {lines[-5:]}"
        )
    else:
        # Recover phase-A numbers from the interrupted run's logs.
        def _log_lines(name):
            path = os.path.join(SOAK, f"{name}.log")
            with open(path) as f:
                return [ln.rstrip("\n") for ln in f]

        iso = [ln for ln in _log_lines("isolated")
               if ln.startswith("ISOLATED_STEP_MS")]
        summary["isolated_step_ms"] = \
            float(iso[-1].split()[1]) if iso else None
        lines = _log_lines("phaseA")
        assert any("preempted; checkpoint saved" in ln for ln in lines), \
            "cannot resume: phase A log has no preemption record"
        summary["phaseA_wall_s"] = None

    if args.from_phase == "B":
        # OUT may already hold later phase-B checkpoints from an interrupted
        # attempt; the phase-C copies still carry the true preemption step.
        s_preempt = min(
            int(x) for x in os.listdir(os.path.join(SOAK, "out_c1", "ckpt"))
            if x.isdigit()
        )
    else:
        s_preempt = latest_ckpt_step(OUT)
    summary["preempt_step"] = s_preempt
    summary["steady_state_ms_phaseA"] = round(steady_state_ms(lines), 1)
    print(f"[soak] phase A preempted at step {s_preempt}; steady-state "
          f"{summary['steady_state_ms_phaseA']} ms", flush=True)

    # ---- phase C: two independent resumes must agree bitwise ----
    if args.from_phase != "B":
        for tag in ("c1", "c2"):
            dst = os.path.join(SOAK, f"out_{tag}")
            if not (args.from_phase != "all" and os.path.isdir(dst)):
                shutil.rmtree(dst, ignore_errors=True)
                shutil.copytree(OUT, dst)
        for tag in ("c1", "c2"):
            d = os.path.join(SOAK, f"out_{tag}")
            cmd = _cli_cmd(args.small) + \
                cli_args(d, s_preempt + DETERMINISM_EXTRA_STEPS, 3, args.small)
            rc, lines = stream_child(cmd, log_name=f"phaseC_{tag}")
            assert rc == 0, f"phase C ({tag}) failed rc={rc}: {lines[-5:]}"
    sc = s_preempt + DETERMINISM_EXTRA_STEPS
    t1 = load_ckpt_tree(os.path.join(SOAK, "out_c1"), sc)
    t2 = load_ckpt_tree(os.path.join(SOAK, "out_c2"), sc)
    assert trees_bitwise_equal(t1, t2), (
        "resume determinism FAILED: two resumes from the same checkpoint "
        "diverged"
    )
    del t1, t2
    summary["resume_determinism"] = "bitwise-identical after "\
        f"{DETERMINISM_EXTRA_STEPS} resumed steps (params+EMA+opt state)"
    print("[soak] resume determinism OK", flush=True)

    # ---- phase B: resume the original run to completion ----
    # drop any half-written save from an interrupted earlier phase-B attempt
    ckpt_dir = os.path.join(OUT, "ckpt")
    for name in os.listdir(ckpt_dir):
        if name.endswith(".orbax-checkpoint-tmp"):
            shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)
    cmd = _cli_cmd(args.small) + cli_args(OUT, MAX_STEPS_B, 3, args.small)
    t0 = time.time()
    rc, lines = stream_child(cmd, log_name="phaseB")
    assert rc == 0, f"phase B failed rc={rc}: {lines[-5:]}"
    summary["phaseB_wall_s"] = round(time.time() - t0, 1)
    summary["steady_state_ms_phaseB"] = round(steady_state_ms(lines), 1)
    summary["final_step"] = latest_ckpt_step(OUT)

    losses = parse_losses(OUT)
    summary["loss_curve"] = [(i, round(l, 4)) for i, l, _ in losses]
    first = [l for _, l, _ in losses[:3]]
    last = [l for _, l, _ in losses[-3:]]
    summary["loss_first3"] = [round(x, 4) for x in first]
    summary["loss_last3"] = [round(x, 4) for x in last]
    assert min(last) < min(first), (
        f"loss did not decrease: first {first} last {last}"
    )
    iso_ms = summary.get("isolated_step_ms")
    ss = min(x for x in (summary["steady_state_ms_phaseA"],
                         summary["steady_state_ms_phaseB"])
             if x == x)
    if iso_ms:
        summary["host_overhead_pct"] = round(100 * (ss / iso_ms - 1), 2)
    with open(os.path.join(SOAK, "soak_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("SOAK_SUMMARY " + json.dumps(summary), flush=True)


def _register_tiny():
    from octic_vits_tpu.models import OcticVisionTransformer
    from octic_vits_tpu.models.registry import register_model

    @register_model
    def _soak_tiny(img_size=224, **kw):
        kw.pop("drop_path_rate", None)
        kw.pop("use_pallas_attention", None)
        kw.pop("use_pallas_linear", None)
        kw.pop("use_pallas_std_mlp", None)
        kw.pop("flat_e_carry", None)
        kw.pop("dtype", None)
        return OcticVisionTransformer(
            img_size=img_size, patch_size=28, embed_dim=32, depth=2,
            num_heads=2, mlp_ratio=2.0, drop_path_rate=0.0, **kw,
        )


if __name__ == "__main__":
    main()
