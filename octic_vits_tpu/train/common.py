"""Shared training-step machinery (all recipes).

A minimal TrainState plus a sharded train-step factory. Parallelism is
declared, not hand-coded: the batch is sharded over the whole mesh, the
optimizer state over the `fsdp` axis (ZeRO-2, the analog of the reference's
FSDP SHARD_GRAD_OP; dinov2/fsdp/__init__.py:22-54), and XLA inserts the
gradient all-reduce (DDP analog; deit/main.py:355-358) plus the
reduce-scatter/all-gather pairs around the optimizer update.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from octic_vits_tpu.parallel.mesh import batch_sharding
from octic_vits_tpu.parallel.sharding import replicated_tree, tree_shardings


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def create_train_state(
    params, tx: optax.GradientTransformation, ema: bool = False
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def state_shardings(state: TrainState, mesh: Mesh, shard_params: bool = False):
    """Sharding tree for TrainState: opt state over fsdp; params replicated
    (ZeRO-2) or fsdp-sharded (ZeRO-3) with `shard_params`."""
    params_sh = (
        tree_shardings(state.params, mesh)
        if shard_params
        else replicated_tree(state.params, mesh)
    )
    return TrainState(
        step=NamedSharding(mesh, P()),
        params=params_sh,
        opt_state=tree_shardings(state.opt_state, mesh),
        ema_params=None if state.ema_params is None else params_sh,
    )


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    mesh: Optional[Mesh] = None,
    state_sh: Optional[TrainState] = None,
    ema_decay: Optional[float] = None,
    grad_clip: Optional[float] = None,
):
    """Build a jitted sharded supervised train step.

    `apply_fn(params, images, rngs)` -> logits; `loss_fn(logits, labels)` ->
    scalar. Returns (step_fn, metrics keys). If `mesh` is given the step is
    jitted with explicit in/out shardings and donated state.
    """

    def step_fn(state: TrainState, images, labels, rng):
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}

        def compute_loss(params):
            logits = apply_fn(params, images, rngs)
            return loss_fn(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        gnorm = optax.global_norm(grads)
        if grad_clip is not None:
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if state.ema_params is not None and ema_decay is not None:
            new_ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params,
                new_params,
            )
        new_state = TrainState(state.step + 1, new_params, new_opt, new_ema)
        metrics = {"loss": loss, "grad_norm": gnorm}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    assert state_sh is not None
    data_sh = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(state_sh, data_sh, data_sh, NamedSharding(mesh, P())),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
    )


def cross_entropy_loss(logits, labels, label_smoothing: float = 0.0):
    """labels: int class ids or soft targets [B, K]."""
    if labels.ndim == logits.ndim:
        targets = labels
    else:
        targets = jax.nn.one_hot(labels, logits.shape[-1])
        if label_smoothing:
            k = logits.shape[-1]
            targets = targets * (1.0 - label_smoothing) + label_smoothing / k
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def bce_target_loss(logits, targets):
    """Binary cross entropy against (possibly mixed) multi-label targets —
    the DeiT III default loss (reference: deit/main.py:370-381)."""
    logits = logits.astype(jnp.float32)
    # torch BCEWithLogitsLoss(reduction="mean") averages over every element
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, targets))
