"""DeiT III supervised training entrypoint.

Host loop mirroring the reference main (reference: deit/main.py:207-534):
dataset + RASampler, sharded train step (mixup inside), per-epoch val
eval, rotating + best checkpoints, json-lines log. Distillation/finetune
pos-embed interpolation hooks exist in the utils; attn-only finetuning is
a param-freeze mask.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from octic_vits_tpu.data.loaders import DataLoader
from octic_vits_tpu.data.samplers import EpochSampler, RASampler
from octic_vits_tpu.models import create_model
from octic_vits_tpu.parallel import batch_sharding, create_mesh
from octic_vits_tpu.train.common import TrainState, create_train_state
from octic_vits_tpu.train.deit.engine import (
    DeiTConfig,
    build_optimizer,
    make_deit_train_step,
    make_eval_step,
)
from octic_vits_tpu.utils.checkpoint import CheckpointManager, PreemptionGuard
from octic_vits_tpu.utils.logging import (
    MetricLogger, maybe_wandb_init, maybe_wandb_log,
)


def evaluate(model, params, loader, eval_step=None, log_every: int = 50):
    """Top-1/top-5/loss over a finite loader
    (reference: deit/engine.py:99-128)."""
    eval_step = eval_step or jax.jit(make_eval_step(model))
    tot = {"top1": 0, "top5": 0, "n": 0, "loss_sum": 0.0}
    for images, labels in loader:
        out = eval_step(params, jnp.asarray(images), jnp.asarray(labels))
        for k in tot:
            tot[k] += float(out[k])
    n = max(tot["n"], 1)
    return {
        "acc1": 100.0 * tot["top1"] / n,
        "acc5": 100.0 * tot["top5"] / n,
        "loss": tot["loss_sum"] / n,
    }


def train(
    model_name: str,
    cfg: DeiTConfig,
    train_dataset,
    val_dataset,
    output_dir: str,
    img_size: int = 224,
    seed: int = 0,
    model_kwargs: Optional[dict] = None,
    num_workers: int = 8,
    max_steps: Optional[int] = None,
    finetune: str = "",
    teacher: Optional[tuple] = None,
    metric_flush_every: int = 20,
):
    """`finetune` loads a pretrained checkpoint (orbax dir or torch .pth)
    with head-drop + pos-embed interpolation (reference: deit/main.py:
    282-338); `teacher=(model, params)` enables cfg.distillation_type
    (reference: deit/main.py:383-407)."""
    os.makedirs(output_dir, exist_ok=True)
    kwargs = dict(model_kwargs or {})
    if jax.default_backend() not in ("cpu",):
        # production TPU defaults = the measured train-step configuration
        # (BENCH.md round-4 sweep): bf16 compute, lax.scan trunk with
        # selective remat, Pallas kernels; flat-E carry on octic models
        kwargs.setdefault("use_pallas_attention", True)
        kwargs.setdefault("dtype", jnp.bfloat16)
        kwargs.setdefault("scan_blocks", True)
        kwargs.setdefault("remat", True)
        if model_name.startswith(("hybrid", "d8", "_t")):
            kwargs.setdefault("use_pallas_linear", True)
            kwargs.setdefault("use_pallas_std_mlp", True)
            kwargs.setdefault("flat_e_carry", True)
        else:
            kwargs.setdefault("use_pallas_mlp", True)
    if cfg.drop:
        kwargs.setdefault("drop_rate", cfg.drop)
    model = create_model(
        model_name,
        img_size=img_size,
        drop_path_rate=cfg.drop_path,
        num_classes=cfg.num_classes,
        **kwargs,
    )
    # schedules are defined in epochs (reference: deit/main.py:368 uses
    # len(data_loader)); derive steps/epoch from the actual dataset so
    # warmup/cosine and the resume epoch arithmetic agree with the data
    spe = max(1, len(train_dataset) // max(cfg.batch_size, 1))
    if cfg.steps_per_epoch != spe:
        cfg = dataclasses.replace(cfg, steps_per_epoch=spe)
    rng = jax.random.PRNGKey(seed)
    sample = jnp.zeros((1, img_size, img_size, 3))
    params = jax.jit(model.init)(rng, sample)["params"]
    if finetune:
        from octic_vits_tpu.utils.finetune import load_pretrained_for_finetune

        params = load_pretrained_for_finetune(finetune, params)
    trainable_mask = None
    if cfg.attn_only:
        from octic_vits_tpu.utils.finetune import attn_only_trainable_mask

        trainable_mask = attn_only_trainable_mask(params)
    teacher_apply = None
    if teacher is not None:
        t_model, t_params = teacher
        teacher_apply = lambda x: t_model.apply({"params": t_params}, x)
    tx = build_optimizer(cfg, params)
    state = create_train_state(params, tx, ema=cfg.model_ema)

    # mesh size must divide the local batch (tiny test runs use few samples)
    n_dev = len(jax.devices())
    local_batch = max(cfg.batch_size // jax.process_count(), 1)
    while local_batch % n_dev:
        n_dev -= 1
    mesh = create_mesh(devices=jax.devices()[:n_dev])
    from octic_vits_tpu.train.common import state_shardings

    state_sh = state_shardings(state, mesh)
    state = jax.device_put(state, state_sh)
    step = jax.jit(
        make_deit_train_step(
            model, cfg, tx, teacher_apply=teacher_apply,
            trainable_mask=trainable_mask,
        ),
        donate_argnums=(0,),
    )
    eval_step = jax.jit(make_eval_step(model))

    ckpt = CheckpointManager(os.path.join(output_dir, "ckpt"), max_to_keep=2)
    restored = ckpt.restore(jax.device_get(state))
    if restored is not None:
        state = jax.device_put(restored, state_sh)
    guard = PreemptionGuard()
    logger = MetricLogger(output_file=os.path.join(output_dir, "log.txt"))
    maybe_wandb_init("octic-vits-deit", config=dataclasses.asdict(cfg))

    n_hosts = jax.process_count()
    sampler = RASampler(
        len(train_dataset), shard=jax.process_index(), num_shards=n_hosts,
        seed=seed, repetitions=3 if cfg.repeated_aug else 1,
    )
    local_bs = cfg.batch_size // n_hosts
    best_acc = 0.0
    host_step = int(state.step)
    start_epoch = host_step // max(cfg.steps_per_epoch, 1)
    data_sh = batch_sharding(mesh)

    # Deferred metric sync: float()ing a jitted scalar blocks the host on
    # that step's completion (~50 ms of relay per sync on remote-TPU hosts),
    # so metrics are flushed in windows — dispatch stays async (the device
    # pipeline is the pacer) and the in-flight batch queue stays bounded.
    pending: list = []

    def _flush():
        for m in pending:
            vals = {k: float(v) for k, v in m.items()}
            if not np.isfinite(vals["loss"]):
                raise RuntimeError(f"NaN/Inf loss at step {host_step}: {vals}")
            logger.update(**vals)
        pending.clear()

    for epoch in range(start_epoch, cfg.epochs):
        sampler.set_epoch(epoch)
        tf = getattr(train_dataset, "transform", None)
        if hasattr(tf, "set_epoch"):
            tf.set_epoch(epoch)  # fresh per-sample augment stream per epoch
        loader = DataLoader(
            train_dataset, sampler, batch_size=local_bs,
            num_workers=num_workers,
        )
        for images, labels in logger.log_every(loader, 50, f"Epoch {epoch}"):
            images = jax.device_put(jnp.asarray(images), data_sh)
            labels = jax.device_put(jnp.asarray(labels), data_sh)
            state, metrics = step(state, images, labels, rng)
            host_step += 1
            pending.append(metrics)
            if len(pending) >= metric_flush_every:
                _flush()
            if max_steps and host_step >= max_steps:
                break
            if guard.preempted:
                break
        _flush()

        ckpt.save(host_step, jax.device_get(state), force=guard.preempted)
        if guard.preempted:
            ckpt.wait()
            print("preempted; checkpoint saved", flush=True)
            return state

        if val_dataset is not None:
            val_loader = DataLoader(
                val_dataset, EpochSampler(len(val_dataset)),
                batch_size=local_bs, num_workers=num_workers, drop_last=False,
            )
            stats = evaluate(model, state.params, val_loader, eval_step)
            line = {"epoch": epoch, **stats}
            # the paper's reported accuracy is the EMA model's — evaluate it
            # every epoch and select "best" on it, like the reference
            # (reference: deit/main.py:344-351,482-511)
            select_acc = stats["acc1"]
            if state.ema_params is not None:
                val_loader = DataLoader(
                    val_dataset, EpochSampler(len(val_dataset)),
                    batch_size=local_bs, num_workers=num_workers,
                    drop_last=False,
                )
                ema_stats = evaluate(
                    model, state.ema_params, val_loader, eval_step
                )
                line.update({f"ema_{k}": v for k, v in ema_stats.items()})
                select_acc = ema_stats["acc1"]
                print(
                    f"* EMA Acc@1 {ema_stats['acc1']:.3f} "
                    f"Acc@5 {ema_stats['acc5']:.3f} "
                    f"loss {ema_stats['loss']:.3f}", flush=True,
                )
            print(
                f"* Acc@1 {stats['acc1']:.3f} Acc@5 {stats['acc5']:.3f} "
                f"loss {stats['loss']:.3f}", flush=True,
            )
            with open(os.path.join(output_dir, "log.txt"), "a") as f:
                f.write(json.dumps(line) + "\n")
            maybe_wandb_log(line, step=host_step)
            if select_acc > best_acc:
                best_acc = select_acc
                import orbax.checkpoint as ocp

                # full state: both raw and EMA params travel in the export
                best_path = os.path.abspath(os.path.join(output_dir, "best"))
                bk = ocp.StandardCheckpointer()
                bk.save(best_path, jax.device_get(state), force=True)
                bk.wait_until_finished()
        if max_steps and host_step >= max_steps:
            break

    ckpt.wait()
    return state
