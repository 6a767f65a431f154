"""DeiT distillation loss (reference: deit/losses.py:10-70).

Wraps a base criterion with optional soft-KL / hard-CE distillation against
a frozen teacher's logits. The reference asserts distillation is unused in
the paper recipe (distillation_type='none'); kept for API completeness.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def distillation_loss(
    base_loss: Array,
    student_logits: Array,
    teacher_logits: Optional[Array],
    distillation_type: str = "none",
    alpha: float = 0.5,
    tau: float = 1.0,
) -> Array:
    if distillation_type == "none" or teacher_logits is None:
        return base_loss
    t = jax.lax.stop_gradient(teacher_logits.astype(jnp.float32))
    s = student_logits.astype(jnp.float32)
    if distillation_type == "soft":
        # KL(teacher || student) * tau^2 (batchmean), reference :55-63
        log_p_s = jax.nn.log_softmax(s / tau, axis=-1)
        log_p_t = jax.nn.log_softmax(t / tau, axis=-1)
        kl = jnp.sum(jnp.exp(log_p_t) * (log_p_t - log_p_s), axis=-1)
        distill = jnp.mean(kl) * tau * tau
    elif distillation_type == "hard":
        hard = jnp.argmax(t, axis=-1)
        logp = jax.nn.log_softmax(s, axis=-1)
        distill = -jnp.mean(jnp.take_along_axis(logp, hard[:, None], -1))
    else:
        raise ValueError(distillation_type)
    return base_loss * (1.0 - alpha) + distill * alpha
