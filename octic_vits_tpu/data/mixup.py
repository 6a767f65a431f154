"""On-device Mixup / CutMix (timm-Mixup semantics, batch mode).

The reference uses timm's host-side Mixup (reference: deit/main.py:266-273);
on TPU we run it inside the jitted train step: static shapes via iota masks
for the CutMix box, `lam` corrected to the realized box area like timm.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def one_hot_smooth(labels: Array, num_classes: int, smoothing: float = 0.0) -> Array:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(rng, h: int, w: int, lam: Array):
    """CutMix box for mix ratio lam (timm rand_bbox): cut a sqrt(1-lam)
    fraction per side, centered uniformly."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    yl = jnp.clip(cy - cut_h // 2, 0, h)
    yh = jnp.clip(cy + cut_h // 2, 0, h)
    xl = jnp.clip(cx - cut_w // 2, 0, w)
    xh = jnp.clip(cx + cut_w // 2, 0, w)
    return yl, yh, xl, xh


def mixup_cutmix(
    rng: jax.Array,
    images: Array,            # [B, H, W, C]
    labels: Array,            # [B] int
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.0,
) -> Tuple[Array, Array]:
    """Returns (mixed_images, soft_targets). Batch mode: pairs each sample
    with its reversed-batch partner (timm 'batch' mode)."""
    b, h, w, _ = images.shape
    k_apply, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(rng, 5)

    y1 = one_hot_smooth(labels, num_classes, label_smoothing)
    y2 = y1[::-1]

    use_cutmix = jax.random.bernoulli(k_switch, switch_prob)
    lam_mix = jax.random.beta(k_lam_m, mixup_alpha, mixup_alpha) if mixup_alpha > 0 else jnp.float32(1)
    lam_cut = jax.random.beta(k_lam_c, cutmix_alpha, cutmix_alpha) if cutmix_alpha > 0 else jnp.float32(1)

    # mixup branch
    lam_m = lam_mix.astype(images.dtype)
    mixed_mix = images * lam_m + images[::-1] * (1.0 - lam_m)

    # cutmix branch (lam corrected to the realized box area, timm-style)
    yl, yh, xl, xh = _rand_bbox(k_box, h, w, lam_cut)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = ((iy >= yl) & (iy < yh) & (ix >= xl) & (ix < xh))[None, :, :, None]
    mixed_cut = jnp.where(box, images[::-1], images)
    area = ((yh - yl) * (xh - xl)).astype(jnp.float32)
    lam_c = 1.0 - area / float(h * w)

    mixed = jnp.where(use_cutmix, mixed_cut, mixed_mix)
    lam = jnp.where(use_cutmix, lam_c, lam_mix).astype(jnp.float32)

    apply = jax.random.bernoulli(k_apply, prob)
    mixed = jnp.where(apply, mixed, images)
    lam = jnp.where(apply, lam, 1.0)

    targets = y1 * lam + y2 * (1.0 - lam)
    return mixed, targets
