"""D8 (dihedral group of order 8) group algebra for octic-equivariant ViTs.

TPU-native re-design of the reference D8 utilities
(reference: octic_vits/d8_utils.py:12-385).

The dihedral group D8 = <r, m | r^4 = m^2 = e, m r m = r^-1> acts on images by
90-degree rotations (r) and horizontal flips (m). Features of an octic network
live in the *isotypic* decomposition of the regular representation:

  regular rep (8-dim, permutations)  =  A1 + A2 + B1 + B2 + 2E

with irreps
  A1: trivial                         (invariant under everything)
  A2: sign under mirror               (rotation +1, mirror -1)
  B1: sign under rotation             (rotation -1, mirror +1)
  B2: sign under both                 (rotation -1, mirror -1)
  E : 2-dimensional; rotation acts by [[0,-1],[1,0]], mirror by [[-1,0],[0,1]]

Feature containers used throughout this package:

* 8-tuple ("isotypic 8-tuple"): `(A1, A2, B1, B2, E11, E21, E12, E22)`, each
  entry an array of identical shape `[..., C/8]`. The four E slots form the
  2x2 matrix  [[E11, E12], [E21, E22]]  whose *columns* transform as E.
* 5-tuple: `(A1, A2, B1, B2, E)` where `E` has shape `[..., 2, C/4]` with
  row 0 = concat(E11, E12) and row 1 = concat(E21, E22). This is the packed
  layout all equivariant layers operate on.

All functions here are pure jnp and shape-polymorphic; they trace into a
handful of elementwise ops which XLA fuses away.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)
SQRT2_OVER_2 = SQRT2 / 2.0
SQRT2_OVER_4 = SQRT2 / 4.0

#: Group element names. `r` = rot90, `m` = horizontal flip; `mr` means
#: "apply r, then m" (matrix product rho(m) rho(r)).
GROUP_ELEMENTS: Tuple[str, ...] = ("e", "r", "rr", "rrr", "m", "mr", "mrr", "mrrr")

#: Irrep slot names of the isotypic 8-tuple.
IRREPS: Tuple[str, ...] = ("A1", "A2", "B1", "B2", "E11", "E21", "E12", "E22")

#: (rot90 count, mirror?) decomposition of each group element acting on images.
_IMAGE_ACTION = {
    "e": (0, False), "r": (1, False), "rr": (2, False), "rrr": (3, False),
    "m": (0, True), "mr": (1, True), "mrr": (2, True), "mrrr": (3, True),
}


def _compose(g1: str, g2: str) -> str:
    """Group multiplication g1 * g2 via the (k, mirror) normal form."""
    k1, m1 = _IMAGE_ACTION[g1]
    k2, m2 = _IMAGE_ACTION[g2]
    # rho(g) = M^{m} R^{k} with R^k M = M R^{-k}
    if m2:
        k, m = (k2 - k1) % 4, not m1
    else:
        k, m = (k1 + k2) % 4, m1
    for name, (kk, mm) in _IMAGE_ACTION.items():
        if (kk, mm) == (k, m):
            return name
    raise AssertionError


#: 49-entry multiplication table (g1, g2, g1*g2), non-identity pairs; used by
#: the property tests (reference: octic_vits/d8_utils.py:18-74 hardcodes this;
#: we derive it from the normal form instead).
MULT_TABLE: Tuple[Tuple[str, str, str], ...] = tuple(
    (g1, g2, _compose(g1, g2))
    for g1 in GROUP_ELEMENTS
    for g2 in GROUP_ELEMENTS
    if not (g1 == "e" or g2 == "e")
)

# --------------------------------------------------------------------------
# Group actions
# --------------------------------------------------------------------------

#: Regular-representation action: out[i] = xs[perm[i]]. The regular rep
#: permutes the 8 "group-element channels"; rotation cycles 0..3 and 4..7,
#: mirror swaps the halves (reference: octic_vits/d8_utils.py:96-177).
_REG_PERM_R = (1, 2, 3, 0, 7, 4, 5, 6)
_REG_PERM_M = (4, 5, 6, 7, 0, 1, 2, 3)

#: Isotypic action = signed permutation per element. Derived from the irrep
#: matrices: A1 fixed; A2 flips under m; B1 flips under r; B2 flips under
#: both; E columns (E11,E21) and (E12,E22) rotate/reflect as the 2-dim irrep
#: (reference: octic_vits/d8_utils.py:179-260).
def _signed_perm_compose(p1, s1, p2, s2):
    """(p1,s1) after (p2,s2):  z[i] = s1[i]*y[p1[i]], y[j] = s2[j]*x[p2[j]]."""
    perm = tuple(p2[p1[i]] for i in range(8))
    sign = tuple(s1[i] * s2[p1[i]] for i in range(8))
    return perm, sign


def _build_signed_perms(gen_r, gen_m):
    perms = {"e": (tuple(range(8)), (1,) * 8), "r": gen_r, "m": gen_m}
    perms["rr"] = _signed_perm_compose(*gen_r, *gen_r)
    perms["rrr"] = _signed_perm_compose(*perms["rr"], *gen_r)
    for k, src in (("mr", "r"), ("mrr", "rr"), ("mrrr", "rrr")):
        perms[k] = _signed_perm_compose(*gen_m, *perms[src])
    return perms


# isotypic rotation: (A1, A2, -B1, -B2, -E21, E11, -E22, E12)
_ISO_SIGNED = _build_signed_perms(
    gen_r=((0, 1, 2, 3, 5, 4, 7, 6), (1, 1, -1, -1, -1, 1, -1, 1)),
    gen_m=((0, 1, 2, 3, 4, 5, 6, 7), (1, -1, 1, -1, -1, 1, -1, 1)),
)

_REG_SIGNED = _build_signed_perms(
    gen_r=(_REG_PERM_R, (1,) * 8),
    gen_m=(_REG_PERM_M, (1,) * 8),
)


def regular_group_action(g: str, xs: Sequence) -> tuple:
    """Apply g to an 8-tuple in regular-representation coordinates."""
    perm, _ = _REG_SIGNED[g]
    return tuple(xs[perm[i]] for i in range(8))


def isotypic_group_action(g: str, xs: Sequence) -> tuple:
    """Apply g to an 8-tuple in isotypic coordinates (signed permutation)."""
    perm, sign = _ISO_SIGNED[g]
    return tuple(xs[perm[i]] if sign[i] > 0 else -xs[perm[i]] for i in range(8))


def image_space_group_action(g: str, img: jnp.ndarray) -> jnp.ndarray:
    """Apply g to an image-like array over its last two axes (H, W)."""
    k, mirror = _IMAGE_ACTION[g]
    out = jnp.rot90(img, k=k, axes=(-2, -1)) if k else img
    if mirror:
        out = jnp.flip(out, axis=-1)
    return out


def spatial_and_isotypic_group_action(g: str, xs: Sequence) -> tuple:
    """Apply g simultaneously to token-grid positions and isotypic channels.

    Each entry of `xs` is `[B, L, C]` with L = H*W a square token grid
    (reference: octic_vits/d8_utils.py:262-274).
    """
    b, l, c = xs[0].shape
    h = w = int(math.isqrt(l))
    assert h * w == l, "token count must be a square grid"

    def spatial(x):
        grid = x.reshape(b, h, w, c)
        grid = image_space_group_action(g, jnp.moveaxis(grid, -1, 1))
        return jnp.moveaxis(grid, 1, -1).reshape(b, l, c)

    return isotypic_group_action(g, tuple(spatial(x) for x in xs))


# --------------------------------------------------------------------------
# D8 Fourier transforms (regular <-> isotypic change of basis)
# --------------------------------------------------------------------------
# The orthogonal change of basis between regular and isotypic coordinates is
# an 8x8 matrix of +-1 entries scaled by sqrt(2)/4. Like a length-8 FFT it
# factors into a butterfly: 16 additions + 8 scalings instead of a dense
# 8x8 apply (reference: octic_vits/d8_utils.py:276-356). These run inside
# every octic GELU so the butterfly form matters; XLA fuses it into one
# elementwise kernel (and the Pallas fused-GELU kernel inlines it).


def isotypic_to_regular(xs: Sequence) -> tuple:
    """Isotypic 8-tuple -> regular-representation 8-tuple (butterfly form)."""
    a1, a2, b1, b2, e11, e21, e12, e22 = xs
    s0, d0 = a1 + a2, a1 - a2
    s1, d1 = b1 + b2, b1 - b2
    s2, d2 = e11 + e21, e11 - e21
    s3, d3 = e12 + e22, e12 - e22
    u0, v0 = s0 + s1, s0 - s1
    u1, v1 = d0 + d1, d0 - d1
    u2, v2 = s2 + d3, s2 - d3
    u3, v3 = d2 + s3, d2 - s3
    c = SQRT2_OVER_4
    return (
        c * (u0 + u2),
        c * (v0 + v3),
        c * (u0 - u2),
        c * (v0 - v3),
        c * (u1 - u3),
        c * (v1 - v2),
        c * (u1 + u3),
        c * (v1 + v2),
    )


def regular_to_isotypic(xs: Sequence) -> tuple:
    """Regular-representation 8-tuple -> isotypic 8-tuple (butterfly form)."""
    x0, x1, x2, x3, x4, x5, x6, x7 = xs
    s0, d0 = x0 + x1, x0 - x1
    s1, d1 = x2 + x3, x2 - x3
    s2, d2 = x4 + x5, x4 - x5
    s3, d3 = x6 + x7, x6 - x7
    u0, v0 = s0 + s1, s1 - s0          # v0 = c - a in reference terms
    u1, w1 = d0 + d1, d0 - d1
    u2, v2 = s2 + s3, s3 - s2
    u3, w3 = d2 + d3, d2 - d3
    c = SQRT2_OVER_4
    return (
        c * (u0 + u2),
        c * (u0 - u2),
        c * (u1 + u3),
        c * (u1 - u3),
        c * (v2 - v0),
        c * (w1 + w3),
        c * (w1 - w3),
        c * (v2 + v0),
    )


# Dense (matrix) forms, mainly for tests and for building fused kernels.


def _iso_to_reg_matrix() -> jnp.ndarray:
    import numpy as np

    basis = np.eye(8)
    cols = [isotypic_to_regular(tuple(np.asarray(b) for b in basis[i])) for i in range(8)]
    return jnp.asarray(np.stack([np.stack(c) for c in cols], axis=1))


def isotypic_to_regular_dense(xs: Sequence) -> tuple:
    """Naive dense-matrix variant (parity oracle for the butterfly form)."""
    mat = _iso_to_reg_matrix()
    stacked = jnp.stack(list(xs), axis=0)
    out = jnp.tensordot(mat, stacked, axes=((1,), (0,)))
    return tuple(out[i] for i in range(8))


def regular_to_isotypic_dense(xs: Sequence) -> tuple:
    """Naive dense-matrix variant (the basis change is orthogonal: M^-1 = M^T)."""
    mat = _iso_to_reg_matrix().T
    stacked = jnp.stack(list(xs), axis=0)
    out = jnp.tensordot(mat, stacked, axes=((1,), (0,)))
    return tuple(out[i] for i in range(8))


# --------------------------------------------------------------------------
# 8-tuple <-> 5-tuple packing
# --------------------------------------------------------------------------


def pack_8_to_5(xs: Sequence) -> tuple:
    """(A1,A2,B1,B2,E11,E21,E12,E22) -> (A1,A2,B1,B2,E[..,2,C/4]).

    E row 0 = concat(E11, E12), row 1 = concat(E21, E22)
    (reference: octic_vits/d8_utils.py:358-368).
    """
    e_col0 = jnp.stack((xs[4], xs[5]), axis=-2)
    e_col1 = jnp.stack((xs[6], xs[7]), axis=-2)
    return (xs[0], xs[1], xs[2], xs[3], jnp.concatenate((e_col0, e_col1), axis=-1))


def unpack_5_to_8(xs: Sequence) -> tuple:
    """Inverse of :func:`pack_8_to_5` (reference: octic_vits/d8_utils.py:370-385)."""
    e = xs[4]
    half = e.shape[-1] // 2
    return (
        xs[0], xs[1], xs[2], xs[3],
        e[..., 0, :half], e[..., 1, :half],
        e[..., 0, half:], e[..., 1, half:],
    )


# --------------------------------------------------------------------------
# flat packed activation container (TPU layout, not in the reference)
#
# The octic residual stream as ONE [..., C] array with column layout
#   [ A1 | A2 | B1 | B2 | E row 0 (C/4) | E row 1 (C/4) ]
# so elementwise ops (norm stats, LayerScale, droppath, residual adds) run
# as single full-width VPU passes instead of 5 padded small-array ops
# (C/8-wide arrays waste ~1.6x of each 128-lane tile). The E rows stay
# contiguous, so the 5-tuple view needed by the matmul kernels is slices +
# a free trailing reshape.
# --------------------------------------------------------------------------


def pack_5_to_flat(xs: Sequence):
    """5-tuple -> flat [..., C] (layout above). E reshape is row-major
    contiguous, so this costs one concatenate."""
    e = xs[4]
    e_flat = e.reshape(e.shape[:-2] + (e.shape[-2] * e.shape[-1],))
    return jnp.concatenate((xs[0], xs[1], xs[2], xs[3], e_flat), axis=-1)


def unpack_flat_to_5(x) -> tuple:
    """Flat [..., C] -> 5-tuple of views (4 slices + a free reshape)."""
    c8 = x.shape[-1] // 8
    parts = tuple(x[..., g * c8:(g + 1) * c8] for g in range(4))
    e = x[..., 4 * c8:].reshape(x.shape[:-1] + (2, 2 * c8))
    return parts + (e,)


def unpack_5f_to_8(xs) -> tuple:
    """Flat-E 5-tuple (E as one [..., C/2] array [row0|row1]) -> 8-tuple.
    Row 0 = [E11|E12], row 1 = [E21|E22]; 8-slot order is
    (A1,A2,B1,B2,E11,E21,E12,E22) like :func:`unpack_5_to_8`."""
    ef = xs[4]
    h = ef.shape[-1] // 4
    return (
        xs[0], xs[1], xs[2], xs[3],
        ef[..., :h], ef[..., 2 * h: 3 * h],
        ef[..., h: 2 * h], ef[..., 3 * h:],
    )


def pack_8_to_5f(xs: Sequence) -> tuple:
    """8-tuple -> flat-E 5-tuple (inverse of :func:`unpack_5f_to_8`)."""
    ef = jnp.concatenate((xs[4], xs[6], xs[5], xs[7]), axis=-1)
    return (xs[0], xs[1], xs[2], xs[3], ef)


def flat_to_break(x):
    """Flat packed layout -> the reference's equivariance-break column
    order cat(convert_5tuple_to_8tuple(xs)) =
    [A1|A2|B1|B2| E[0,:C/8] | E[1,:C/8] | E[0,C/8:] | E[1,C/8:] ]
    (reference: octic_vits/model.py:200, d8_utils.py:370-385)."""
    c8 = x.shape[-1] // 8
    return jnp.concatenate(
        (
            x[..., : 4 * c8],
            x[..., 4 * c8: 5 * c8],
            x[..., 6 * c8: 7 * c8],
            x[..., 5 * c8: 6 * c8],
            x[..., 7 * c8: 8 * c8],
        ),
        axis=-1,
    )
