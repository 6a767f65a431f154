"""Attention-pooling classification probe on frozen patch features.

Parity with the reference capi-style eval_classification probes (reference:
dinov2/eval/segmentation/eval_classification.py — linear + attention-pooling
heads trained on frozen features): a single learned query attends over the
patch tokens, followed by a linear classifier. Trained with AdamW + cosine.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jnp.ndarray


class AttnPoolProbe(nn.Module):
    num_classes: int
    num_heads: int = 8
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patch_tokens: Array) -> Array:
        b, n, d = patch_tokens.shape
        q = self.param(
            "query", nn.initializers.truncated_normal(0.02),
            (1, 1, d), self.param_dtype,
        )
        q = jnp.broadcast_to(q, (b, 1, d))
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, param_dtype=self.param_dtype,
            name="attn",
        )
        pooled = attn(q, patch_tokens)[:, 0]
        pooled = nn.LayerNorm(param_dtype=self.param_dtype)(pooled)
        return nn.Dense(self.num_classes, param_dtype=self.param_dtype)(pooled)


def train_attnpool_probe(
    feature_fn,
    train_iter_factory,
    eval_iter,
    num_classes: int,
    iters: int = 2000,
    lr: float = 1e-4,
    num_heads: int = 8,
    seed: int = 0,
) -> Dict[str, float]:
    """feature_fn(images) -> patch tokens [B, N, D]."""
    probe: Optional[AttnPoolProbe] = None
    params = None
    tx = optax.adamw(
        optax.cosine_decay_schedule(lr, iters), weight_decay=1e-4
    )
    opt_state = None

    @jax.jit
    def step(params, opt_state, feats, labels):
        def loss_fn(p):
            logits = probe.apply({"params": p}, feats)
            onehot = jax.nn.one_hot(labels, num_classes)
            return -jnp.mean(
                jnp.sum(onehot * jax.nn.log_softmax(logits, -1), -1)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    it = 0
    src = iter(train_iter_factory())
    while it < iters:
        try:
            images, labels = next(src)
        except StopIteration:
            src = iter(train_iter_factory())
            continue
        feats = jnp.asarray(feature_fn(images))
        if probe is None:
            probe = AttnPoolProbe(num_classes=num_classes, num_heads=num_heads)
            params = probe.init(jax.random.PRNGKey(seed), feats)["params"]
            opt_state = tx.init(params)
        params, opt_state, loss = step(params, opt_state, feats,
                                       jnp.asarray(labels))
        it += 1

    hits = total = 0
    infer = jax.jit(lambda p, f: probe.apply({"params": p}, f))
    for images, labels in eval_iter:
        logits = np.asarray(infer(params, jnp.asarray(feature_fn(images))))
        hits += int((logits.argmax(-1) == np.asarray(labels)).sum())
        total += len(labels)
    return {"attnpool_top1": hits / max(total, 1), "final_loss": float(loss)}
