"""DeiT III supervised training engine.

TPU re-design of the reference engine (reference: deit/engine.py:19-128,
deit/main.py:207-534): one jitted SPMD train step does mixup/cutmix, the
forward/backward, LAMB update, and EMA — the DDP all-reduce is implicit in
the sharded grads. Loss options mirror the reference: BCE against mixed
multi-label targets (the paper recipe), CE with label smoothing, soft-target
CE, and the optional cosub 4-term BCE (reference: deit/engine.py:50-65).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from octic_vits_tpu.data.mixup import mixup_cutmix, one_hot_smooth
from octic_vits_tpu.train.common import (
    TrainState,
    bce_target_loss,
    create_train_state,
    cross_entropy_loss,
)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DeiTConfig:
    """Paper hparams (reference: experiments/train_deit.py:31-66)."""

    num_classes: int = 1000
    epochs: int = 400
    batch_size: int = 2048          # effective/global
    lr: float = 3e-3                # scaled by batch/512 at build time? no:
    # the reference launcher passes absolute lr 3e-3 with unscale... see
    # deit/main.py:362-364: linear scaling lr * eff_batch / 512.
    unscale_lr: bool = True         # launcher passes lr already tuned
    weight_decay: float = 0.02
    warmup_epochs: int = 5
    warmup_lr: float = 1e-6
    min_lr: float = 1e-5
    loss_type: str = "bce"          # bce | ce | soft_ce
    smoothing: float = 0.0
    cosub: bool = False
    # optimizer selection (reference --opt via timm create_optimizer;
    # recipes use fusedlamb for pretraining, adamw for finetuning)
    opt: str = "lamb"               # lamb | adamw
    opt_betas: Optional[tuple] = None
    # --no-model-ema analog (reference: deit/main.py:56-58)
    model_ema: bool = True
    # backbone dropout rate (reference --drop; recipes use 0.0)
    drop: float = 0.0
    # RASampler on/off (reference --repeated-aug/--no-repeated-aug)
    repeated_aug: bool = True
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    mixup_prob: float = 1.0
    mixup_switch_prob: float = 0.5
    drop_path: float = 0.45
    ema_decay: float = 0.99996
    # apex FusedLAMB clips the global grad norm at max_grad_norm=1.0 by
    # default, which the reference recipe inherits via timm
    # create_optimizer('fusedlamb') (reference: experiments/train_deit.py:42)
    clip_grad: Optional[float] = 1.0
    steps_per_epoch: int = 625
    opt_eps: float = 1e-8
    # attention-only finetuning: freeze everything but attn/norm1/cls/pos
    # (reference: deit/main.py:318-338)
    attn_only: bool = False
    # optional distillation against a frozen teacher
    # (reference: deit/losses.py:10-70, unused by the paper recipe)
    distillation_type: str = "none"  # none | soft | hard
    distillation_alpha: float = 0.5
    distillation_tau: float = 1.0
    # gradient accumulation: split the per-step batch into `accum_steps`
    # microbatches scanned sequentially before ONE optimizer update. The
    # reference gets its effective batch 2048 from 32 GPUs (README.md:240);
    # on small TPU slices the same recipe needs accumulation to fit HBM.
    accum_steps: int = 1


def lr_schedule(cfg: DeiTConfig) -> Callable[[int], float]:
    """Cosine with linear warmup (timm `cosine` scheduler semantics used by
    the reference, deit/main.py:368)."""
    warmup = cfg.warmup_epochs * cfg.steps_per_epoch
    total = cfg.epochs * cfg.steps_per_epoch
    base = cfg.lr if cfg.unscale_lr else cfg.lr * cfg.batch_size / 512.0

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = cfg.warmup_lr + (base - cfg.warmup_lr) * step / max(warmup, 1)
        t = jnp.clip((step - warmup) / max(total - warmup, 1), 0.0, 1.0)
        cos = cfg.min_lr + 0.5 * (base - cfg.min_lr) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup, warm, cos)

    return fn


def no_weight_decay_mask(params, extra_names: tuple = ("pos_embed", "cls_token")):
    """timm rule: no decay for 1-d params and the model's no_weight_decay
    names (reference: deit/main.py via timm create_optimizer)."""

    def leaf(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if any(n in name for n in extra_names):
            return False
        return np.ndim(x) > 1

    return jax.tree_util.tree_map_with_path(leaf, params)


def build_optimizer(cfg: DeiTConfig, params) -> optax.GradientTransformation:
    """cfg.opt selects LAMB (paper pretraining optimizer, apex fusedlamb
    analog; reference: experiments/train_deit.py:42) or AdamW (the DeiT III
    finetuning recipes' choice via --opt, deit/main.py:66)."""
    mask = no_weight_decay_mask(params)
    b1, b2 = cfg.opt_betas or (0.9, 0.999)
    if cfg.opt == "adamw":
        return optax.adamw(
            learning_rate=lr_schedule(cfg), b1=b1, b2=b2, eps=cfg.opt_eps,
            weight_decay=cfg.weight_decay, mask=mask,
        )
    if cfg.opt != "lamb":
        raise ValueError(f"unknown optimizer {cfg.opt!r} (lamb|adamw)")
    return optax.lamb(
        learning_rate=lr_schedule(cfg),
        b1=b1,
        b2=b2,
        eps=cfg.opt_eps,
        weight_decay=cfg.weight_decay,
        mask=mask,
    )


def make_deit_train_step(model, cfg: DeiTConfig, tx, teacher_apply=None,
                         trainable_mask=None):
    """step(state, images, labels, rng) -> (state, metrics); donate state.

    `teacher_apply(images) -> logits` enables distillation
    (reference: deit/losses.py:10-70 + main.py:383-407); `trainable_mask`
    (bool pytree, True = trainable) freezes the rest — both grads (so the
    LAMB moments stay zero) and updates (so weight decay cannot leak into
    frozen params) are masked (reference: deit/main.py:318-338
    requires_grad=False semantics)."""
    if cfg.distillation_type != "none" and teacher_apply is None:
        raise ValueError(
            f"distillation_type={cfg.distillation_type!r} needs teacher_apply"
        )

    def loss_of(logits, targets):
        if cfg.loss_type == "bce":
            return bce_target_loss(logits, targets)
        return cross_entropy_loss(logits, targets)

    def step_fn(state: TrainState, images, labels, rng):
        k_mix, k_drop, k_cosub = jax.random.split(
            jax.random.fold_in(rng, state.step), 3
        )
        if cfg.mixup_alpha > 0 or cfg.cutmix_alpha > 0:
            images, targets = mixup_cutmix(
                k_mix, images, labels, cfg.num_classes,
                cfg.mixup_alpha, cfg.cutmix_alpha,
                cfg.mixup_prob, cfg.mixup_switch_prob, cfg.smoothing,
            )
        else:
            targets = one_hot_smooth(labels, cfg.num_classes, cfg.smoothing)
        if cfg.loss_type == "bce":
            targets = jnp.clip(targets, 0.0, 1.0)

        def compute(params, images, targets, k_drop):
            rngs = {"dropout": k_drop}
            if cfg.cosub:
                # cosub: two submodel passes, 4-term BCE
                # (reference: deit/engine.py:50-65)
                logits1 = model.apply(
                    {"params": params}, images, deterministic=False,
                    rngs={"dropout": k_drop},
                )
                logits2 = model.apply(
                    {"params": params}, images, deterministic=False,
                    rngs={"dropout": k_cosub},
                )
                t = targets
                loss = 0.25 * (
                    loss_of(logits1, t)
                    + loss_of(logits2, t)
                    + loss_of(logits1, jax.lax.stop_gradient(jax.nn.sigmoid(logits2)))
                    + loss_of(logits2, jax.lax.stop_gradient(jax.nn.sigmoid(logits1)))
                )
                return loss, logits1
            logits = model.apply(
                {"params": params}, images, deterministic=False, rngs=rngs
            )
            loss = loss_of(logits, targets)
            if cfg.distillation_type != "none":
                from octic_vits_tpu.train.deit.losses import distillation_loss

                loss = distillation_loss(
                    loss, logits, teacher_apply(images),
                    distillation_type=cfg.distillation_type,
                    alpha=cfg.distillation_alpha, tau=cfg.distillation_tau,
                )
            return loss, logits

        if cfg.accum_steps > 1:
            # microbatch scan: grads averaged across chunks, ONE update.
            # Mixup ran on the FULL batch above, so accum=k reproduces the
            # one-big-batch step up to fp summation order.
            k = cfg.accum_steps
            b = images.shape[0]
            assert b % k == 0, f"batch {b} not divisible by accum_steps {k}"
            im = images.reshape(k, b // k, *images.shape[1:])
            tg = targets.reshape(k, b // k, *targets.shape[1:])

            def micro(carry, xs):
                i, x, t = xs
                (l, _), g = jax.value_and_grad(compute, has_aux=True)(
                    state.params, x, t, jax.random.fold_in(k_drop, i)
                )
                gsum, lsum = carry
                return (jax.tree.map(jnp.add, gsum, g), lsum + l), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (gsum, lsum), _ = jax.lax.scan(
                micro, (zeros, jnp.zeros((), jnp.float32)),
                (jnp.arange(k), im, tg),
            )
            grads = jax.tree.map(lambda g: g / k, gsum)
            loss = lsum / k
        else:
            (loss, _), grads = jax.value_and_grad(compute, has_aux=True)(
                state.params, images, targets, k_drop
            )
        if trainable_mask is not None:
            grads = jax.tree.map(
                lambda g, t: g if t else jnp.zeros_like(g),
                grads, trainable_mask,
            )
        gnorm = optax.global_norm(grads)
        if cfg.clip_grad is not None:
            scale = jnp.minimum(1.0, cfg.clip_grad / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if trainable_mask is not None:
            # zero grads alone are not enough: LAMB's decoupled weight decay
            # would still move frozen params, so mask the updates too
            updates = jax.tree.map(
                lambda u, t: u if t else jnp.zeros_like(u),
                updates, trainable_mask,
            )
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None:
            d = cfg.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1 - d) * p, state.ema_params, new_params
            )
        new_state = TrainState(state.step + 1, new_params, new_opt, new_ema)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return step_fn


def make_eval_step(model, use_ema: bool = False):
    """Returns step(params, images, labels) -> dict(top1_cnt, top5_cnt, n,
    loss_sum) partial sums — accumulate host-side, all-reduce-free under
    pjit (reference: deit/engine.py:99-128)."""

    def eval_fn(params, images, labels):
        logits = model.apply({"params": params}, images)
        loss = cross_entropy_loss(logits, labels)
        k = min(5, logits.shape[-1])
        top5 = jax.lax.top_k(logits, k)[1]
        correct1 = (top5[:, 0] == labels).sum()
        correct5 = (top5 == labels[:, None]).any(-1).sum()
        n = labels.shape[0]
        return {
            "top1": correct1,
            "top5": correct5,
            "n": jnp.asarray(n),
            "loss_sum": loss * n,
        }

    return eval_fn
