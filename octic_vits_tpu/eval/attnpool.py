"""capi-style classification probes on frozen features: the reference's
eval_classification suite (reference:
dinov2/eval/segmentation/eval_classification.py:195-545).

Parity points reproduced here:
* representations: "cls" [B,D] and "avg_patch" [B,D] -> LinearClassifier;
  "patch" [B,N,D] -> AttnPoolClassifier (query-token parameter, KV-only
  projection, D//64 heads, no out-proj/LayerNorm — :200-231).
* the full hparam grid (10 learning rates x 3 weight decays, :326-327)
  trained JOINTLY as one vmapped classifier bank per representation — the
  TPU analog of the reference's AllClassifiers ModuleList (:407-416),
  with per-member lr via a vectorized inline AdamW.
* base_lr scaling lr * batch/256 (:412), AdamW betas (0.9, 0.95) (:428),
  cosine schedule with linear warmup (:497-501), best-on-val selection.
"""

from __future__ import annotations

import itertools
import math
from typing import Dict, Iterable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# reference grid (eval_classification.py:326-327)
LEARNING_RATES = (1e-5, 2e-5, 5e-5, 1e-4, 2e-4, 5e-4, 1e-3, 2e-3, 5e-3, 1e-2)
WEIGHT_DECAYS = (5e-4, 1e-3, 5e-2)


class LinearClassifier(nn.Module):
    num_classes: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Array) -> Array:
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.truncated_normal(0.02),
            param_dtype=self.param_dtype,
        )(feats)


class AttnPoolClassifier(nn.Module):
    """Reference AttnPoolClassifier (eval_classification.py:200-231):
    a trainable query token attends over patch tokens through a KV-only
    projection with D//64 heads; linear classifier on the pooled vector."""

    num_classes: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patch_tokens: Array) -> Array:
        b, n, d = patch_tokens.shape
        # reference: heads = D//64 (eval_classification.py:205); for tiny
        # test dims fall back to one head
        heads = d // 64 if d % 64 == 0 and d >= 64 else 1
        dh = d // heads
        q = self.param(
            "query_token", nn.initializers.truncated_normal(0.02),
            (d,), self.param_dtype,
        )
        kv = nn.Dense(
            2 * d, kernel_init=nn.initializers.truncated_normal(0.02),
            param_dtype=self.param_dtype, name="kv",
        )(patch_tokens)
        kv = kv.reshape(b, n, 2, heads, dh)
        k = kv[:, :, 0]                      # [B, N, H, dh]
        v = kv[:, :, 1]
        qh = q.reshape(heads, dh).astype(k.dtype)
        logits = jnp.einsum("hd,bnhd->bhn", qh, k) / math.sqrt(dh)
        probs = jax.nn.softmax(logits, axis=-1)
        pooled = jnp.einsum("bhn,bnhd->bhd", probs, v).reshape(b, d)
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.truncated_normal(0.02),
            param_dtype=self.param_dtype,
        )(pooled)


def _cosine_warmup(it, n_iters, warmup):
    warm = jnp.minimum(1.0, (it + 1) / max(warmup, 1))
    prog = jnp.clip((it - warmup) / max(n_iters - warmup, 1), 0.0, 1.0)
    return warm * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))


def _bank_init(module, rng, feats, n_members):
    keys = jax.random.split(rng, n_members)
    return jax.vmap(lambda k: module.init(k, feats)["params"])(keys)


def train_probe_grid(
    feature_fn,
    train_iter_factory,
    eval_iter,
    num_classes: int,
    representations: Sequence[str] = ("cls", "avg_patch", "patch"),
    learning_rates: Sequence[float] = LEARNING_RATES,
    weight_decays: Sequence[float] = WEIGHT_DECAYS,
    n_iters: int = 12_500,
    warmup_iters: int = 1_250,
    batch_size: int = 128,
    val_iter: Optional[Iterable] = None,
    seed: int = 0,
) -> Dict[str, float]:
    """feature_fn(images) -> {"cls": [B,D], "avg_patch": [B,D],
    "patch": [B,N,D]} (any subset matching `representations`).

    Trains, per representation, a vmapped bank of len(lrs)*len(wds)
    classifiers jointly (one frozen-backbone forward feeds every member),
    evaluates all members, and reports the best — the reference protocol
    (eval_classification.py:407-530) with the DDP/AllClassifiers machinery
    replaced by vmap."""
    grid = list(itertools.product(learning_rates, weight_decays))
    n_members = len(grid)
    base_lrs = jnp.asarray([lr * batch_size / 256.0 for lr, _ in grid])
    wds = jnp.asarray([wd for _, wd in grid])

    banks = {}   # rep -> (module, params, mu, nu)

    def make_step(module):
        def one_loss(p, feats, onehot):
            logits = module.apply({"params": p}, feats)
            return -jnp.mean(
                jnp.sum(onehot * jax.nn.log_softmax(logits, -1), -1)
            )

        @jax.jit
        def step(params, mu, nu, it, feats, labels):
            onehot = jax.nn.one_hot(labels, num_classes)
            losses, grads = jax.vmap(
                jax.value_and_grad(one_loss), in_axes=(0, None, None)
            )(params, feats, onehot)
            sched = _cosine_warmup(it, n_iters, warmup_iters)
            t = it + 1
            b1, b2, eps = 0.9, 0.95, 1e-8
            c1 = 1.0 - b1 ** t
            c2 = 1.0 - b2 ** t

            def upd(p, g, m, v, lr_vec, wd_vec):
                bshape = (-1,) + (1,) * (p.ndim - 1)
                lr = (sched * lr_vec).reshape(bshape)
                wd = wd_vec.reshape(bshape)
                m = b1 * m + (1 - b1) * g
                v = b2 * v + (1 - b2) * g * g
                mh = m / c1
                vh = v / c2
                new_p = p - lr * (mh / (jnp.sqrt(vh) + eps) + wd * p)
                return new_p, m, v

            out = jax.tree.map(
                lambda p, g, m, v: upd(p, g, m, v, base_lrs, wds),
                params, grads, mu, nu,
            )
            params = jax.tree.map(lambda o: o[0], out,
                                  is_leaf=lambda x: isinstance(x, tuple))
            mu = jax.tree.map(lambda o: o[1], out,
                              is_leaf=lambda x: isinstance(x, tuple))
            nu = jax.tree.map(lambda o: o[2], out,
                              is_leaf=lambda x: isinstance(x, tuple))
            return params, mu, nu, losses

        return step

    steps = {}
    it = 0
    src = iter(train_iter_factory())
    last_losses = {}
    while it < n_iters:
        try:
            images, labels = next(src)
        except StopIteration:
            src = iter(train_iter_factory())
            continue
        feats_all = feature_fn(images)
        labels = jnp.asarray(labels)
        for rep in representations:
            feats = jnp.asarray(feats_all[rep])
            if rep not in banks:
                module = (
                    AttnPoolClassifier(num_classes=num_classes)
                    if feats.ndim == 3
                    else LinearClassifier(num_classes=num_classes)
                )
                params = _bank_init(
                    module, jax.random.PRNGKey(seed), feats, n_members
                )
                zeros = jax.tree.map(jnp.zeros_like, params)
                banks[rep] = [module, params, zeros,
                              jax.tree.map(jnp.zeros_like, params)]
                steps[rep] = make_step(module)
            bank = banks[rep]
            bank[1], bank[2], bank[3], losses = steps[rep](
                bank[1], bank[2], bank[3], jnp.asarray(it), feats, labels
            )
            last_losses[rep] = losses
        it += 1

    # evaluate every member on (val or eval) data; report the best per rep
    results: Dict[str, float] = {}
    eval_batches = list(val_iter if val_iter is not None else eval_iter)
    for rep, (module, params, _, _) in banks.items():
        infer = jax.jit(
            jax.vmap(lambda p, f: module.apply({"params": p}, f),
                     in_axes=(0, None))
        )
        hits = np.zeros((n_members,), np.int64)
        total = 0
        for images, labels in eval_batches:
            feats = jnp.asarray(feature_fn(images)[rep])
            logits = np.asarray(infer(params, feats))   # [M, B, K]
            hits += (logits.argmax(-1) == np.asarray(labels)[None]).sum(-1)
            total += len(labels)
        accs = hits / max(total, 1)
        best = int(accs.argmax())
        lr, wd = grid[best]
        results[f"{rep}_top1"] = float(accs[best])
        results[f"{rep}_best_lr"] = lr
        results[f"{rep}_best_wd"] = wd
    if last_losses:
        results["final_loss"] = float(
            np.mean([np.asarray(v).mean() for v in last_losses.values()])
        )
    return results


# ---------------------------------------------------------------------------
# backward-compatible single-config entry point (round-2 API)
# ---------------------------------------------------------------------------


def train_attnpool_probe(
    feature_fn,
    train_iter_factory,
    eval_iter,
    num_classes: int,
    iters: int = 2000,
    lr: float = 1e-4,
    num_heads: int = 8,   # kept for API compat; the probe uses D//64 heads
    seed: int = 0,
) -> Dict[str, float]:
    """Single attnpool probe on patch tokens (feature_fn -> [B, N, D])."""
    del num_heads
    res = train_probe_grid(
        lambda images: {"patch": feature_fn(images)},
        train_iter_factory,
        eval_iter,
        num_classes,
        representations=("patch",),
        learning_rates=(lr,),
        weight_decays=(1e-4,),
        n_iters=iters,
        warmup_iters=max(iters // 10, 1),
        seed=seed,
    )
    return {"attnpool_top1": res["patch_top1"],
            "final_loss": res.get("final_loss", 0.0)}
