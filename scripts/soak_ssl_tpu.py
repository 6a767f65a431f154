"""Sustained DINOv2 SSL training soak on the real TPU chip.

Round-5 target (VERDICT.md Next#1, SSL half): >= 100 steps of the REAL SSL
host loop — multicrop augmentation + iBOT masking + collate on the host,
the sharded DINO+iBOT+KoLeo step on the device, rotating orbax checkpoints,
and a restore-and-continue leg — at paper scale (hybrid ViT-H/16, B=8,
2x224 global + 8x96 local crops). Mirrors the reference's core loop
(reference: dinov2/train/train.py:253-332).

Phases:
  1. `--isolated`: the identical jitted SSL step on one synthetic
     device-resident batch (no host pipeline) — comparator + cache warm;
  2. run A: fresh 120 iterations through octic_vits_tpu.train.dinov2.cli
     with checkpoints every 50 iterations;
  3. run B: re-invoke with --max-iter 140 — restores the iter-100
     checkpoint and continues (restore path at H/16 scale).

Steady-state step time is measured from the arrival times of the CLI's
every-10-iter progress lines (the metric sync drains the device queue, so
inter-print wall time / 10 is the true per-step cadence).

Writes <repo>/.soak/ssl_summary.json.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SOAK = os.path.join(REPO, ".soak")
DATA = os.path.join(SOAK, "data")
OUT = os.path.join(SOAK, "out_ssl")
CFG_FILE = os.path.join(
    REPO, "octic_vits_tpu", "configs", "train", "hybrid_vith16.yaml"
)
B = 8  # per-chip batch at H/16 (BENCH.md: 288-296 ms/step, hybrid only)
ITERS_A = 120
ITERS_B = 140
CKPT_EVERY = 50


def dotlist(small: bool):
    d = [
        f"train.dataset_path=ImageFolder:root={os.path.join(DATA, 'train')}",
        f"train.batch_size_per_gpu={B}",
        f"train.saveckp_freq_iterations={CKPT_EVERY}",
    ]
    if small:
        d += [
            "student.arch=_ssl_soak_tiny",
            "crops.global_crops_size=32",
            "crops.local_crops_size=16",
            "student.patch_size=8",
            "dino.head_n_prototypes=64",
            "dino.head_hidden_dim=32",
            "dino.head_bottleneck_dim=16",
            "ibot.head_n_prototypes=64",
            "compute_precision.compute_dtype=float32",
        ]
    return d


def build_cfg_and_arch(small: bool):
    """Exactly the CLI's construction path (cli.setup + SSLConfig)."""
    import jax.numpy as jnp

    from octic_vits_tpu.train.dinov2.cli import get_args_parser, setup
    from octic_vits_tpu.train.dinov2.ssl_meta_arch import SSLConfig, SSLMetaArch

    args = get_args_parser().parse_args(
        ["--config-file", CFG_FILE, "--output-dir", OUT] + dotlist(small)
    )
    cfg = setup(args)
    arch = SSLMetaArch(
        SSLConfig(
            arch=cfg.student.arch,
            img_size=cfg.crops.global_crops_size,
            local_crop_size=cfg.crops.local_crops_size,
            patch_size=cfg.student.patch_size,
            drop_path_rate=cfg.student.drop_path_rate,
            dino_out_dim=cfg.dino.head_n_prototypes,
            dino_head_hidden_dim=cfg.dino.head_hidden_dim,
            dino_head_bottleneck_dim=cfg.dino.head_bottleneck_dim,
            dino_head_nlayers=cfg.dino.head_nlayers,
            dino_loss_weight=cfg.dino.loss_weight,
            koleo_loss_weight=cfg.dino.koleo_loss_weight,
            ibot_out_dim=cfg.ibot.head_n_prototypes,
            ibot_separate_head=cfg.ibot.separate_head,
            ibot_loss_weight=cfg.ibot.loss_weight,
            centering=cfg.train.centering,
            n_local_crops=cfg.crops.local_crops_number,
            clip_grad=cfg.optim.clip_grad,
            layerwise_decay=cfg.optim.layerwise_decay,
            patch_embed_lr_mult=cfg.optim.patch_embed_lr_mult,
            compute_dtype=jnp.bfloat16
            if cfg.compute_precision.compute_dtype == "bfloat16"
            else jnp.float32,
            backbone_scan=bool(getattr(cfg.student, "scan_blocks", True)),
            backbone_remat=bool(getattr(cfg.student, "remat", True)),
        )
    )
    return arch, cfg


def run_isolated(small: bool, iters: int = 8) -> float:
    import random as pyrandom

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from octic_vits_tpu.train.dinov2.masking import (
        MaskingGenerator, collate_crops_and_masks,
    )

    arch, cfg = build_cfg_and_arch(small)
    state = arch.init(jax.random.PRNGKey(cfg.train.seed))
    step = jax.jit(arch.make_train_step(), donate_argnums=(0,))

    gsz = cfg.crops.global_crops_size
    lsz = cfg.crops.local_crops_size
    n_local = cfg.crops.local_crops_number
    n_tokens = (gsz // cfg.student.patch_size) ** 2
    gen = MaskingGenerator(gsz // cfg.student.patch_size,
                           num_masking_patches=n_tokens // 2)
    npr = np.random.RandomState(0)
    raw = collate_crops_and_masks(
        npr.randn(2 * B, gsz, gsz, 3).astype(np.float32),
        npr.randn(n_local * B, lsz, lsz, 3).astype(np.float32),
        n_tokens, gen,
        mask_probability=cfg.ibot.mask_sample_probability,
        mask_ratio_tuple=tuple(cfg.ibot.mask_ratio_min_max),
        rng=pyrandom.Random(0),
    )
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    sched = {"lr": 1e-4, "wd": 0.04, "momentum": 0.992,
             "teacher_temp": 0.04, "last_layer_lr": 0.0}
    rng = jax.random.PRNGKey(1)

    t0 = time.time()
    state, metrics = step(state, batch, sched, rng)
    print(f"[isolated] compile+step {time.time() - t0:.1f}s "
          f"loss={float(metrics['total_loss']):.4f}", flush=True)
    state, metrics = step(state, batch, sched, rng)
    jax.block_until_ready(metrics)
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, batch, sched, rng)
    jax.block_until_ready(metrics)
    ms = (time.time() - t0) / iters * 1e3
    print(f"ISOLATED_SSL_STEP_MS {ms:.1f}", flush=True)
    return ms


def stream_cli(max_iter: int, small: bool, log_name: str):
    """Run the dinov2 CLI; returns (rc, [(arrival_t, line)])."""
    cmd = _cli_cmd(small) + [
        "--config-file", CFG_FILE, "--output-dir", OUT,
        "--max-iter", str(max_iter),
    ] + dotlist(small)
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env,
    )
    rows = []
    with open(os.path.join(SOAK, f"{log_name}.log"), "w") as logf:
        for line in proc.stdout:
            rows.append((time.time(), line.rstrip("\n")))
            logf.write(line)
            logf.flush()
    rc = proc.wait(timeout=600)
    return rc, rows


def _cli_cmd(small: bool):
    if small:
        return [sys.executable, os.path.abspath(__file__),
                "--cli-child", "--small"]
    return [sys.executable, "-m", "octic_vits_tpu.train.dinov2.cli"]


def steady_state_ms(rows, lo: int = 30, hi: int = 110) -> float:
    """Wall time between the iter-`lo` and iter-`hi` progress prints / n."""
    pat = re.compile(r"^iter (\d+):")
    t_at = {}
    for t, ln in rows:
        m = pat.match(ln)
        if m:
            t_at[int(m.group(1))] = t
    marks = sorted(k for k in t_at if lo <= k <= hi)
    if len(marks) < 2:
        return float("nan")
    a, b = marks[0], marks[-1]
    return (t_at[b] - t_at[a]) / (b - a) * 1e3


def parse_metrics(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            rows.append(e)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--isolated", action="store_true")
    ap.add_argument("--cli-child", action="store_true")
    args, rest = ap.parse_known_args()

    if args.cli_child:
        if args.small:
            import jax

            jax.config.update("jax_platforms", "cpu")
            _register_tiny()
        from octic_vits_tpu.train.dinov2.cli import main as cli_main

        cli_main(rest)
        return

    os.makedirs(SOAK, exist_ok=True)
    if args.isolated:
        if args.small:
            import jax

            jax.config.update("jax_platforms", "cpu")
            _register_tiny()
        run_isolated(args.small)
        return

    assert os.path.isdir(os.path.join(DATA, "train")), (
        "run scripts/soak_deit_tpu.py first (or its gen_data) to create "
        f"{DATA}"
    )
    summary = {"arch": "hybrid_dinov2_vit_huge_patch16", "batch": B}

    iso_cmd = [sys.executable, os.path.abspath(__file__), "--isolated"]
    if args.small:
        iso_cmd.append("--small")
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    proc = subprocess.run(iso_cmd, cwd=REPO, env=env, text=True,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    sys.stdout.write(proc.stdout)
    assert proc.returncode == 0, "isolated SSL comparator failed"
    iso = [l for l in proc.stdout.splitlines()
           if l.startswith("ISOLATED_SSL_STEP_MS")]
    summary["isolated_step_ms"] = float(iso[-1].split()[1]) if iso else None

    import shutil

    shutil.rmtree(OUT, ignore_errors=True)
    t0 = time.time()
    rc, rows = stream_cli(ITERS_A, args.small, "ssl_runA")
    summary["runA_wall_s"] = round(time.time() - t0, 1)
    assert rc == 0, f"SSL run A failed rc={rc}: {[r[1] for r in rows[-5:]]}"
    summary["steady_state_ms"] = round(steady_state_ms(rows), 1)

    ckdir = os.path.join(OUT, "ckpt")
    saved = sorted(int(x) for x in os.listdir(ckdir) if x.isdigit())
    assert saved and max(saved) >= 100, f"missing interval ckpts: {saved}"
    summary["checkpoints"] = saved

    mets = parse_metrics(os.path.join(OUT, "training_metrics.json"))
    losses = [(e["iteration"], e.get("total_loss")) for e in mets
              if "total_loss" in e]
    summary["loss_curve"] = [(i, round(l, 4)) for i, l in losses]

    # run B: restore + continue (exercises H/16-scale orbax restore on-chip)
    t0 = time.time()
    rc, rows = stream_cli(ITERS_B, args.small, "ssl_runB")
    assert rc == 0, f"SSL run B failed rc={rc}: {[r[1] for r in rows[-5:]]}"
    resumed_from = None
    for _, ln in rows:
        m = re.match(r"^iter (\d+):", ln)
        if m:
            resumed_from = int(m.group(1))
            break
    summary["runB_wall_s"] = round(time.time() - t0, 1)
    summary["resume_first_logged_iter"] = resumed_from
    assert resumed_from is not None and resumed_from >= max(
        s for s in saved if s <= ITERS_A
    ), f"run B did not resume from the latest checkpoint (first iter "\
       f"{resumed_from}, saved {saved})"

    iso_ms = summary.get("isolated_step_ms")
    if iso_ms and summary["steady_state_ms"] == summary["steady_state_ms"]:
        summary["host_overhead_pct"] = round(
            100 * (summary["steady_state_ms"] / iso_ms - 1), 2
        )
    with open(os.path.join(SOAK, "ssl_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("SSL_SOAK_SUMMARY " + json.dumps(summary), flush=True)


def _register_tiny():
    from octic_vits_tpu.models import OcticDinoVisionTransformer
    from octic_vits_tpu.models.registry import register_model

    @register_model
    def _ssl_soak_tiny(img_size=32, **kw):
        kw.pop("drop_path_rate", None)
        return OcticDinoVisionTransformer(
            img_size=img_size, patch_size=8, embed_dim=32, depth=2,
            num_heads=2, mlp_ratio=2.0, init_scale=1e-5,
            drop_path_rate=0.0, **kw,
        )


if __name__ == "__main__":
    main()
