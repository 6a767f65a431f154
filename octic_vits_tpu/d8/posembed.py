"""Equivariant positional-embedding utilities.

The octic ViT stores learnable pos-embed parameters only on the top-left
quadrant of the patch grid (6 tensors `[H/2, W/2, C/8]`, one per irrep slot
with a single shared tensor per E column). `unfold_quadrant` expands the
quadrant to the full `[H, W, C/8]` grid by (anti-)symmetrizing under rot90 /
flip per irrep, which makes the pos-embed itself exactly D8-equivariant
(reference: octic_vits/d8_utils.py:388-451).

`resize_grid` is a bicubic spatial resize matching torch's
``F.interpolate(mode="bicubic", antialias=False, align_corners=False)``
(Keys kernel a=-0.75, half-pixel centers, edge clamping) so converted
reference checkpoints evaluate identically at non-train resolutions
(reference: octic_vits/d8_utils.py:453-499).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _rot90(x: jnp.ndarray, k: int, dim: int) -> jnp.ndarray:
    return jnp.rot90(x, k=k, axes=(dim, dim + 1))


def _flip(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.flip(x, axis=axis)


def unfold_quadrant(xs: Sequence[jnp.ndarray], dim: int = 0) -> tuple:
    """Expand 6 quadrant tensors into a full-grid isotypic 8-tuple.

    Args:
      xs: 6 arrays `[..., H/2, W/2, C]` (A1, A2, B1, B2, E-left, E-right)
        with the two spatial axes at positions `(dim, dim+1)`.
      dim: index of the first spatial axis.

    Returns:
      8-tuple of `[..., H, W, C]` arrays in isotypic slot order.
    """
    d = dim

    def four_fold(x, rot_sign):
        top = jnp.concatenate((x, rot_sign * _rot90(x, 1, d)), axis=d)
        bot = jnp.concatenate((rot_sign * _rot90(x, 3, d), _rot90(x, 2, d)), axis=d)
        return jnp.concatenate((top, bot), axis=d + 1)

    a1 = four_fold(xs[0], 1.0)
    a1 = a1 + _flip(a1, d + 1)
    a2 = four_fold(xs[1], 1.0)
    a2 = a2 - _flip(a2, d + 1)
    b1 = four_fold(xs[2], -1.0)
    b1 = b1 + _flip(b1, d + 1)
    b2 = four_fold(xs[3], -1.0)
    b2 = b2 - _flip(b2, d + 1)

    def e_fold(x):
        col = jnp.concatenate((x, _flip(x, d)), axis=d)
        return jnp.concatenate((col, -_flip(col, d + 1)), axis=d + 1)

    e_left = e_fold(xs[4])
    e_right = e_fold(xs[5])
    return (
        a1, a2, b1, b2,
        e_left, _rot90(e_left, 1, d),
        e_right, _rot90(e_right, 1, d),
    )


@functools.lru_cache(maxsize=64)
def _cubic_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] bicubic (a=-0.75) interpolation matrix."""
    a = -0.75

    def kernel(x):
        x = abs(x)
        if x <= 1.0:
            return (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0
        if x < 2.0:
            return a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a
        return 0.0

    scale = in_size / out_size
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        coord = (i + 0.5) * scale - 0.5
        base = int(np.floor(coord))
        t = coord - base
        for tap in range(-1, 3):
            w = kernel(tap - t)
            src = min(max(base + tap, 0), in_size - 1)
            mat[i, src] += w
    return mat.astype(np.float32)


def resize_grid(x: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """Bicubic resize of `[..., H, W, C]` to `[..., h0, w0, C]` (torch parity)."""
    h0, w0 = out_hw
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (h0, w0):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    wh = jnp.asarray(_cubic_resize_matrix(h, h0))
    ww = jnp.asarray(_cubic_resize_matrix(w, w0))
    out = jnp.einsum("oh,...hwc->...owc", wh, xf)
    out = jnp.einsum("ow,...hwc->...hoc", ww, out)
    return out.astype(dtype)


def resize_posembed(pos: Sequence[jnp.ndarray], grid_hw: tuple) -> tuple:
    """Resize each full-grid pos-embed tensor `[H, W, C]` to `grid_hw`.

    Matches the reference's DINOv2-style interpolation path, which is a
    no-op when the token grid equals the train-time grid
    (reference: octic_vits/d8_utils.py:453-499).
    """
    return tuple(resize_grid(p, grid_hw) for p in pos)
