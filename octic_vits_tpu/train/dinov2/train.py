"""DINOv2 SSL training loop (reference: dinov2/train/train.py:140-361).

Host loop: schedules -> sharded SSL step -> metrics -> periodic
teacher-export + rotating checkpoints; deterministic resume via the
sampler `advance` + orbax restore. The per-iter schedule scalars are fed
into the jitted step (no recompiles — they are traced inputs).
"""

from __future__ import annotations

import os
import random
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from octic_vits_tpu.train.dinov2.masking import (
    MaskingGenerator,
    collate_crops_and_masks,
)
from octic_vits_tpu.train.dinov2.schedules import build_ssl_schedules
from octic_vits_tpu.train.dinov2.ssl_meta_arch import SSLMetaArch, SSLState
from octic_vits_tpu.utils.checkpoint import (
    CheckpointManager,
    PreemptionGuard,
    save_teacher,
)
from octic_vits_tpu.utils.logging import (
    MetricLogger, maybe_wandb_init, maybe_wandb_log,
)


def ssl_batch_iterator(
    dataset,
    sampler_iter: Iterator[int],
    augmenter,
    batch_size: int,
    n_tokens: int,
    mask_generator: MaskingGenerator,
    mask_probability: float = 0.5,
    mask_ratio_tuple=(0.1, 0.5),
    rng: Optional[random.Random] = None,
):
    """Yields static-shape SSL batches: multicrop augment + collate."""
    rng = rng or random.Random(0)
    while True:
        crops = []
        for _ in range(batch_size):
            idx = next(sampler_iter)
            image, _ = dataset[idx]
            crops.append(augmenter(image, rng=rng))
        n_g = len(crops[0]["global_crops"])
        n_l = len(crops[0]["local_crops"])
        gc = np.stack(
            [c["global_crops"][i] for i in range(n_g) for c in crops]
        )
        lc = np.stack(
            [c["local_crops"][i] for i in range(n_l) for c in crops]
        )
        yield collate_crops_and_masks(
            gc, lc, n_tokens, mask_generator,
            mask_probability=mask_probability,
            mask_ratio_tuple=mask_ratio_tuple,
            rng=rng,
        )


def do_train(
    arch: SSLMetaArch,
    cfg,  # ConfigNode with train/optim/teacher/ibot sections
    batch_iter: Optional[Iterator],
    output_dir: str,
    max_iter: Optional[int] = None,
    state: Optional[SSLState] = None,
    device_put: Callable = lambda b: b,
    log_every: int = 10,
    seed: int = 0,
    make_batch_iter: Optional[Callable[[int], Iterator]] = None,
    resume: bool = True,
    eval_only: bool = False,
):
    """Returns the final SSLState. `batch_iter` yields collated numpy
    batches (see `ssl_batch_iterator`).

    `make_batch_iter(start_iter)`, when given, supersedes `batch_iter` and is
    called AFTER checkpoint restore so the data stream can be advanced to
    where the restored run left off (deterministic resume — the reference
    consumes `sampler_advance` the same way, dinov2/data/samplers.py:174-182).
    `resume=False` skips checkpoint restore (reference train.py:30-64
    `--no-resume`); `eval_only=True` restores, exports the teacher for the
    eval stack, and returns without training (reference train.py:60-64)."""
    lr_s, wd_s, mom_s, temp_s, last_lr_s = build_ssl_schedules(cfg)
    max_iter = max_iter or cfg.optim.epochs * cfg.train.OFFICIAL_EPOCH_LENGTH

    ckpt = CheckpointManager(
        os.path.join(output_dir, "ckpt"),
        max_to_keep=3,
        save_interval_steps=cfg.train.get("saveckp_freq_iterations", 3 * 1250),
    )
    guard = PreemptionGuard()
    logger = MetricLogger(
        output_file=os.path.join(output_dir, "training_metrics.json")
    )
    maybe_wandb_init("octic-vits-dinov2")

    if state is None:
        state = arch.init(jax.random.PRNGKey(seed))
        if resume:
            restored = ckpt.restore(state)
            if restored is not None:
                state = restored
    start_iter = int(state.step)

    if eval_only:
        save_teacher(output_dir, start_iter, jax.device_get(state.teacher))
        ckpt.close()
        return state

    if make_batch_iter is not None:
        batch_iter = make_batch_iter(start_iter)

    # size the mesh to divide the per-step crop batches (peek one batch)
    import itertools
    import math as _math

    first = next(batch_iter)
    batch_iter = itertools.chain([first], batch_iter)
    rows = _math.gcd(first["global_crops"].shape[0], first["local_crops"].shape[0])
    n_dev = len(jax.devices())
    while rows % n_dev:
        n_dev -= 1
    if n_dev > 1:
        from octic_vits_tpu.parallel import create_mesh

        mesh = create_mesh(devices=jax.devices()[:n_dev])
        state_sh = arch.state_shardings(state, mesh)
        state = jax.device_put(state, state_sh)
        step = arch.make_train_step(mesh=mesh, state_sh=state_sh)
        batch_sh = arch.batch_shardings(mesh)
        device_put_batch = lambda b: jax.device_put(b, batch_sh)
    else:
        step = jax.jit(arch.make_train_step(), donate_argnums=(0,))
        device_put_batch = device_put
    rng = jax.random.PRNGKey(seed + 1)

    eval_period = cfg.get("evaluation", {}).get("eval_period_iterations", 12500)
    t_end = time.time()
    for it in range(start_iter, max_iter):
        batch = next(batch_iter)
        data_time = time.time() - t_end
        batch = device_put_batch({k: jnp.asarray(v) for k, v in batch.items()})
        sched = {
            "lr": lr_s[it],
            "wd": wd_s[it],
            "momentum": mom_s[it],
            "teacher_temp": temp_s[it],
            "last_layer_lr": last_lr_s[it],
        }
        state, metrics = step(state, batch, sched, rng)

        if it % log_every == 0:
            host_metrics = {k: float(v) for k, v in metrics.items()}
            if not np.isfinite(host_metrics["total_loss"]):
                raise RuntimeError(f"NaN/Inf loss at iter {it}: {host_metrics}")
            maybe_wandb_log(host_metrics, step=it)
            logger.update(lr=sched["lr"], wd=sched["wd"],
                          mom=sched["momentum"], **host_metrics)
            logger.dump_in_output_file(it, time.time() - t_end, data_time)
            print(f"iter {it}: {logger}", flush=True)

        if (it + 1) % eval_period == 0:
            save_teacher(output_dir, it + 1, jax.device_get(state.teacher))
        # ask the interval gate BEFORE device_get: pulling the full train
        # state to host is a multi-GB transfer at ViT-H scale and must not
        # run on the ~every-step fast path
        if ckpt.should_save(it + 1):
            ckpt.save(it + 1, jax.device_get(state))

        if guard.preempted:
            ckpt.save(it + 1, jax.device_get(state), force=True)
            ckpt.wait()
            print(f"preempted at iter {it + 1}; checkpoint saved", flush=True)
            break
        t_end = time.time()

    ckpt.wait()
    return state
