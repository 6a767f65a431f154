"""DINOv2 SSL losses (functional, SPMD-friendly).

JAX re-design of the reference losses (reference: dinov2/loss/*): the
centering buffers become explicit state threaded through the jitted step,
and every distributed all_reduce disappears — reductions over the globally
sharded batch axis compile to the right collectives under pjit. The
reference's async center all_reduce (dino_clstoken_loss.py:76-99) is
subsumed: XLA overlaps the psum inside the step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


class CenterState(NamedTuple):
    """EMA center for teacher logits (DINO cls / iBOT patch)."""

    center: Array  # [D]

    @staticmethod
    def create(dim: int) -> "CenterState":
        return CenterState(center=jnp.zeros((dim,), jnp.float32))


def softmax_center_teacher(
    teacher_logits: Array, center: Array, teacher_temp: float
) -> Array:
    """softmax((t - center)/temp) (reference: dino_clstoken_loss.py:28-32)."""
    t = teacher_logits.astype(jnp.float32)
    return jax.nn.softmax((t - center) / teacher_temp, axis=-1)


def update_center(
    state: CenterState,
    teacher_logits: Array,
    momentum: float = 0.9,
    weights: Optional[Array] = None,
) -> CenterState:
    """EMA center update over the global batch (collective under pjit).

    `weights` (0/1) supports the iBOT padded-masked-token buffer where only
    the first n_masked rows are valid."""
    t = teacher_logits.astype(jnp.float32).reshape(-1, teacher_logits.shape[-1])
    if weights is None:
        batch_center = jnp.mean(t, axis=0)
    else:
        w = weights.astype(jnp.float32).reshape(-1, 1)
        batch_center = jnp.sum(t * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    return CenterState(center=state.center * momentum + batch_center * (1.0 - momentum))


def sinkhorn_knopp_teacher(
    teacher_logits: Array,
    teacher_temp: float,
    n_iterations: int = 3,
    sample_mask: Optional[Array] = None,
) -> Array:
    """Sinkhorn-Knopp assignment (reference: dino_clstoken_loss.py:34-61).

    `sample_mask` zeroes padded rows (iBOT masked-patch buffer) so they get
    no assignment mass. Runs in fp32; loops are unrolled (3 iters, static).
    """
    t = teacher_logits.astype(jnp.float32)
    q = jnp.exp(t / teacher_temp).T  # [K, B]
    k, b = q.shape
    if sample_mask is not None:
        q = q * sample_mask.astype(jnp.float32)[None, :]
        n_samples = jnp.maximum(jnp.sum(sample_mask.astype(jnp.float32)), 1.0)
    else:
        n_samples = jnp.asarray(float(b), jnp.float32)
    q = q / jnp.sum(q)
    for _ in range(n_iterations):
        q = q / jnp.sum(q, axis=1, keepdims=True)
        q = q / k
        q = q / jnp.maximum(jnp.sum(q, axis=0, keepdims=True), 1e-30)
        q = q / n_samples
    q = q * n_samples
    return q.T


def dino_loss(
    student_logits_list: Sequence[Array],
    teacher_probs_list: Sequence[Array],
    student_temp: float = 0.1,
) -> Array:
    """Sum of CE over all (student, teacher) pairs
    (reference: dino_clstoken_loss.py:63-74)."""
    total = 0.0
    for s in student_logits_list:
        lsm = jax.nn.log_softmax(s.astype(jnp.float32) / student_temp, axis=-1)
        for t in teacher_probs_list:
            total = total - jnp.mean(jnp.sum(t * lsm, axis=-1))
    return total


def ibot_patch_loss_masked(
    student_logits: Array,  # [M, D] padded masked-token buffer
    teacher_probs: Array,   # [M, D]
    masks_weight: Array,    # [M] per-token weight (0 on padding)
    n_samples: int,         # global batch of masked images (B * n_masked_crops)
    student_temp: float = 0.1,
) -> Array:
    """iBOT CE over the padded masked-patch buffer
    (reference: ibot_patch_loss.py:105-126)."""
    lsm = jax.nn.log_softmax(student_logits.astype(jnp.float32) / student_temp, -1)
    per_token = jnp.sum(teacher_probs * lsm, axis=-1) * masks_weight
    return -jnp.sum(per_token) / n_samples


def ibot_patch_loss_dense(
    student_logits: Array,  # [B, N, D]
    teacher_probs: Array,   # [B, N, D]
    masks: Array,           # [B, N] bool
    student_temp: float = 0.1,
) -> Array:
    """Dense variant (reference: ibot_patch_loss.py:92-103)."""
    lsm = jax.nn.log_softmax(student_logits.astype(jnp.float32) / student_temp, -1)
    per_token = jnp.sum(teacher_probs * lsm, axis=-1)
    m = masks.astype(jnp.float32)
    per_img = jnp.sum(per_token * m, axis=-1) / jnp.maximum(m.sum(-1), 1.0)
    return -jnp.mean(per_img)


def koleo_loss(student_cls: Array, eps: float = 1e-8) -> Array:
    """Kozachenko-Leonenko nearest-neighbor entropy regularizer, fp32
    (reference: koleo_loss.py:18-48).

    Computes nearest neighbors over the WHOLE array it is given. Under pjit
    that is the global batch; for the reference's per-GPU semantics use
    :func:`koleo_loss_per_device`."""
    x = student_cls.astype(jnp.float32)
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)
    dots = x @ x.T
    n = x.shape[0]
    dots = dots - 2.0 * jnp.eye(n, dtype=jnp.float32)  # exclude self (max dot 1)
    nn_idx = jnp.argmax(dots, axis=1)
    diffs = x - x[nn_idx]
    dists = jnp.sqrt(jnp.sum(diffs * diffs, axis=-1) + eps * eps)
    return -jnp.mean(jnp.log(dists + eps))


def koleo_loss_per_device(student_cls: Array, mesh, eps: float = 1e-8) -> Array:
    """KoLeo with the reference's per-GPU batch scope (koleo_loss.py:38-48):
    nearest neighbors are searched within each device's LOCAL batch shard
    (no gather), and the per-device losses are averaged — exactly what the
    reference's unsynchronized per-rank loss contributes to the gradient.

    `student_cls` must be shardable over the leading batch axis across every
    mesh axis; when batch % mesh.size != 0 (tiny debug batches) this falls
    back to the global scope."""
    from jax.sharding import PartitionSpec as P

    if student_cls.shape[0] % mesh.size != 0:
        return koleo_loss(student_cls, eps)
    axes = tuple(mesh.axis_names)

    def _local(x):
        return jax.lax.pmean(koleo_loss(x, eps), axes)

    return jax.shard_map(
        _local, mesh=mesh, in_specs=P(axes), out_specs=P()
    )(student_cls)
