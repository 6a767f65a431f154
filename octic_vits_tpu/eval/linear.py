"""Joint grid-search linear probe.

TPU re-design of the reference linear eval (reference:
dinov2/eval/linear.py:173-628): the |blocks in {1,4}| x |avgpool| x |13 lr|
classifier grid trains simultaneously — but instead of a ModuleDict of 52
separate Linears inside one DDP module, each (blocks, avgpool) feature
variant owns a VMAPPED bank of 13 classifiers: one batched matmul per
variant per step on the MXU.

Protocol parity: SGD momentum 0.9, no weight decay, cosine lr over
`iters` (12500 = 10 ep x 1250 it), feature = concat of cls tokens of the
last n blocks, optionally + mean-pooled patch tokens of the last block;
best classifier selected by top-1.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# The reference's 13-lr grid, verbatim (dinov2/eval/linear.py:147):
# (1,2,5) x decades 1e-5..5e-2, plus 1e-1.
DEFAULT_LRS = (
    1e-5, 2e-5, 5e-5, 1e-4, 2e-4, 5e-4,
    1e-3, 2e-3, 5e-3, 1e-2, 2e-2, 5e-2, 1e-1,
)


def scale_lr(lr: float, batch_size: int, world_size: int = 1) -> float:
    """Linear lr scaling by global batch (dinov2/eval/linear.py:233-234)."""
    return lr * (batch_size * world_size) / 256.0


@dataclasses.dataclass
class ProbeVariant:
    name: str
    use_n_blocks: int
    use_avgpool: bool


DEFAULT_VARIANTS = (
    ProbeVariant("1_blocks_noavg", 1, False),
    ProbeVariant("1_blocks_avg", 1, True),
    ProbeVariant("4_blocks_noavg", 4, False),
    ProbeVariant("4_blocks_avg", 4, True),
)


def build_probe_features(
    intermediate_outputs: Sequence[Tuple[Array, Array]],
    variant: ProbeVariant,
) -> Array:
    """intermediate_outputs: list over blocks of (patch_tokens [B,N,D],
    cls [B,D]), last block last (reference create_linear_input,
    dinov2/eval/linear.py:80-92)."""
    picked = intermediate_outputs[-variant.use_n_blocks :]
    feats = jnp.concatenate([cls for _, cls in picked], axis=-1)
    if variant.use_avgpool:
        avg = jnp.mean(picked[-1][0], axis=1)
        feats = jnp.concatenate([feats, avg], axis=-1)
    return feats.astype(jnp.float32)


class LinearProbeBank:
    """A vmapped bank of linear classifiers with per-classifier lr.

    With `mesh` the step is data-parallel over the feature batch
    (classifier weights replicated, feats/labels sharded over the mesh;
    XLA all-reduces the gradients) — the SPMD analog of the reference's
    DDP-wrapped AllClassifiers module (dinov2/eval/linear.py:254-258)."""

    def __init__(self, dim: int, num_classes: int, lrs: Sequence[float],
                 momentum: float = 0.9, iters: int = 12500, mesh=None):
        self.dim = dim
        self.num_classes = num_classes
        self.lrs = jnp.asarray(lrs, jnp.float32)
        self.momentum = momentum
        self.iters = iters
        n = len(lrs)
        self.w = jnp.zeros((n, dim, num_classes), jnp.float32)
        self.b = jnp.zeros((n, num_classes), jnp.float32)
        self.mw = jnp.zeros_like(self.w)
        self.mb = jnp.zeros_like(self.b)
        self.mesh = mesh

        def step(w, b, mw, mb, feats, labels, lr_scale):
            def loss_fn(w, b):
                logits = jnp.einsum("bd,ndc->nbc", feats, w) + b[:, None, :]
                logp = jax.nn.log_softmax(logits, axis=-1)
                onehot = jax.nn.one_hot(labels, logits.shape[-1])
                per_clf = -jnp.mean(jnp.sum(onehot * logp, axis=-1), axis=-1)
                return jnp.sum(per_clf), per_clf

            (_, per_clf), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                     has_aux=True)(w, b)
            gw, gb = grads
            lr = (self.lrs * lr_scale)[:, None, None]
            mw = self.momentum * mw + gw
            mb = self.momentum * mb + gb
            w = w - lr * mw
            b = b - lr[:, :, 0] * mb
            return w, b, mw, mb, per_clf

        if mesh is None:
            self._step = jax.jit(step)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            batch = NamedSharding(mesh, P(tuple(mesh.axis_names)))
            self._step = jax.jit(
                step,
                in_shardings=(rep, rep, rep, rep, batch, batch, None),
                out_shardings=(rep, rep, rep, rep, rep),
            )

    def lr_scale(self, it: int) -> float:
        return 0.5 * (1 + np.cos(np.pi * it / max(self.iters, 1)))

    def train_step(self, feats: Array, labels: Array, it: int):
        self.w, self.b, self.mw, self.mb, per_clf = self._step(
            self.w, self.b, self.mw, self.mb, feats, labels,
            jnp.float32(self.lr_scale(it)),
        )
        return per_clf

    def predict(self, feats: Array) -> Array:
        return jnp.einsum("bd,ndc->nbc", feats.astype(jnp.float32), self.w) + self.b[:, None, :]


def train_and_eval_linear_probes(
    train_feature_fn,
    train_iter_factory,
    eval_iter,
    num_classes: int,
    iters: int = 12500,
    lrs: Sequence[float] = DEFAULT_LRS,
    variants: Sequence[ProbeVariant] = DEFAULT_VARIANTS,
    batch_size: int = 256,
    mesh=None,
) -> Dict[str, float]:
    """Full grid training + best-classifier selection
    (reference: dinov2/eval/linear.py:465-628).

    train_feature_fn(images) -> list of (patch_tokens, cls) per block;
    train_iter_factory() -> iterator of (images, labels) (repeats as
    needed); eval_iter -> finite iterator for the val set. Grid lrs are
    scaled by global batch / 256 (reference :233-243)."""
    lrs = tuple(scale_lr(lr, batch_size) for lr in lrs)
    banks: Dict[str, LinearProbeBank] = {}
    it = 0
    src = iter(train_iter_factory())
    while it < iters:
        try:
            images, labels = next(src)
        except StopIteration:
            src = iter(train_iter_factory())
            continue
        outs = train_feature_fn(images)
        labels = jnp.asarray(labels)
        for v in variants:
            feats = build_probe_features(outs, v)
            if v.name not in banks:
                banks[v.name] = LinearProbeBank(
                    feats.shape[-1], num_classes, lrs, iters=iters, mesh=mesh
                )
            banks[v.name].train_step(feats, labels, it)
        it += 1

    # evaluation: accumulate top-1 per classifier
    correct = {v.name: None for v in variants}
    total = 0
    for images, labels in eval_iter:
        outs = train_feature_fn(images)
        labels = np.asarray(labels)
        total += len(labels)
        for v in variants:
            feats = build_probe_features(outs, v)
            logits = np.asarray(banks[v.name].predict(feats))
            hits = (logits.argmax(-1) == labels[None, :]).sum(-1)
            correct[v.name] = hits if correct[v.name] is None else correct[v.name] + hits

    results = {}
    best_name, best_acc = None, -1.0
    for v in variants:
        for i, lr in enumerate(lrs):
            acc = float(correct[v.name][i]) / max(total, 1)
            results[f"{v.name}_lr{lr:g}_top1"] = acc
            if acc > best_acc:
                best_acc, best_name = acc, f"{v.name}_lr{lr:g}"
    results["best_classifier"] = best_name
    results["best_top1"] = best_acc
    return results
