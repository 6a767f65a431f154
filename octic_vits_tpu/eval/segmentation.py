"""Segmentation probing (capi-style): per-patch features -> kNN / logistic
regression probes -> mIoU.

TPU re-design of the reference segmentation eval (reference:
dinov2/eval/segmentation/eval_segmentation.py:50-446): patch features are
extracted at 224^2, labels are majority-downsampled per patch, probes are a
chunked-similarity kNN (majority vote, cosine or L2 — KNNClassifier,
:172-278) and a logistic regression (sklearn L-BFGS replacing cuML,
:281-337). The hyper-parameter grids default to the REFERENCE protocol
grids — knn: num_neighbors (1,3,10,30) x distance (cosine, L2); logreg:
C = 10**linspace(-6,5,8) — and are evaluated sequentially, distributable
across hosts by slicing the grid round-robin (:104-133). `ignore_labels`
follows :363: (0, 255) for ADE20K raw labels, (255,) otherwise.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Callable, Dict, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from octic_vits_tpu.eval.metrics import confusion_matrix, miou_from_confusion

Array = jnp.ndarray

# the reference protocol grids (eval_segmentation.py:184-187 knn ctor
# defaults; :292-296 logreg ctor defaults), expanded itertools.product-style
DEFAULT_KNN_GRID: Tuple[Dict, ...] = tuple(
    {"k": n, "distance": d}
    for n, d in itertools.product((1, 3, 10, 30), ("cosine", "L2"))
)
DEFAULT_LOGREG_GRID: Tuple[Dict, ...] = tuple(
    {"C": float(c), "max_iter": 1000, "tol": 1e-12}
    for c in 10 ** np.linspace(-6, 5, 8)
)


def downsample_labels(
    label_map: np.ndarray, patch_size: int, num_classes: int,
    ignore_labels: Sequence[int] = (255,),
) -> np.ndarray:
    """[H, W] pixel labels -> [h, w] per-patch majority label
    (ignoring `ignore_labels`; patch fully ignored -> 255 sentinel)."""
    h, w = label_map.shape
    gh, gw = h // patch_size, w // patch_size
    crop = label_map[: gh * patch_size, : gw * patch_size]
    patches = crop.reshape(gh, patch_size, gw, patch_size).transpose(0, 2, 1, 3)
    patches = patches.reshape(gh, gw, -1)
    out = np.full((gh, gw), 255, np.int32)
    ignore = np.asarray(ignore_labels)
    for i in range(gh):
        for j in range(gw):
            vals = patches[i, j]
            vals = vals[~np.isin(vals, ignore)]
            if len(vals):
                out[i, j] = np.bincount(vals, minlength=num_classes).argmax()
    return out


def extract_patch_features(
    feature_fn: Callable[[np.ndarray], np.ndarray],
    images: Iterable[Tuple[np.ndarray, np.ndarray]],
    patch_size: int,
    num_classes: int,
    ignore_labels: Sequence[int] = (255,),
) -> Tuple[np.ndarray, np.ndarray]:
    """feature_fn(batch NHWC) -> [B, N, D] patch features; images yields
    (image [H,W,3] normalized, label_map [H,W]). Patches whose majority
    label is ignored are dropped (reference Classifier.fit isin-mask,
    eval_segmentation.py:78-85)."""
    feats, labels = [], []
    drop = set(ignore_labels) | {255}
    for img, lab in images:
        f = np.asarray(feature_fn(img[None]))[0]
        pl = downsample_labels(
            lab, patch_size, num_classes, ignore_labels
        ).flatten()
        keep = ~np.isin(pl, list(drop))
        feats.append(f.reshape(-1, f.shape[-1])[keep])
        labels.append(pl[keep])
    return np.concatenate(feats), np.concatenate(labels)


class KNNSegProbe:
    """Chunked-similarity kNN over patch features; majority vote of the k
    nearest neighbors under cosine or L2 distance
    (reference: eval_segmentation.py:172-278 KNNClassifier)."""

    def __init__(self, k: int = 10, distance: str = "cosine",
                 num_classes: int = 150, chunk: int = 4096):
        if distance not in ("cosine", "L2"):
            raise ValueError(f"unsupported distance {distance!r}")
        self.k = k
        self.distance = distance
        self.num_classes = num_classes
        self.chunk = chunk

    def fit(self, feats: np.ndarray, labels: np.ndarray):
        f = np.asarray(feats, np.float32)
        if self.distance == "cosine":
            f = f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)
        self.train_feats = jnp.asarray(f)
        self.train_labels = jnp.asarray(labels)
        return self

    def predict(self, feats: np.ndarray) -> np.ndarray:
        f = np.asarray(feats, np.float32)
        if self.distance == "cosine":
            f = f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)
        out = []
        k = min(self.k, self.train_feats.shape[0])
        use_l2 = self.distance == "L2"

        @jax.jit
        def _votes(chunk_feats):
            if use_l2:
                # -||q-t||^2 = 2 q.t - ||t||^2 (+const in q): top_k of this
                # orders like smallest L2 distance
                sims = 2.0 * (chunk_feats @ self.train_feats.T) - jnp.sum(
                    self.train_feats**2, axis=-1
                )
            else:
                sims = chunk_feats @ self.train_feats.T
            _, top_i = jax.lax.top_k(sims, k)
            onehot = jax.nn.one_hot(self.train_labels[top_i], self.num_classes)
            return jnp.sum(onehot, axis=1)  # majority vote (reference mode)

        for s in range(0, len(f), self.chunk):
            out.append(np.asarray(_votes(jnp.asarray(f[s : s + self.chunk]))))
        return np.concatenate(out).argmax(-1)


class LogregSegProbe:
    """Multinomial logistic regression probe.

    Two backends for the reference's cuML GPU L-BFGS
    (reference: eval_segmentation.py:281-337; grid C, max_iter=1000,
    tol=1e-12):
      * "sklearn": scipy L-BFGS on the host — exact protocol, but CPU-bound
        (hours at ADE20K scale, ~4M patch features);
      * "jax": full-batch `optax.lbfgs` ON DEVICE, same objective as
        sklearn/cuML — min_W 0.5||W||^2 + C * sum_i CE_i (intercept
        unregularized) — inside one `lax.while_loop` (no per-iteration host
        sync), bf16 feature matmuls with f32 logits/accumulation. This is
        the TPU path for reference-scale feature sets.
    Backend "auto" picks jax when a non-CPU JAX backend is present.
    """

    def __init__(self, C: float = 1.0, max_iter: int = 1000,
                 tol: float = 1e-12, num_classes: int = 150,
                 backend: str = "auto", chunk_size: int = 262144):
        if backend == "auto":
            backend = "jax" if jax.default_backend() != "cpu" else "sklearn"
        self.backend = backend
        self.C = float(C)
        self.max_iter = int(max_iter)
        self.tol = float(tol)
        self.num_classes = num_classes
        self.chunk_size = int(chunk_size)
        if backend == "sklearn":
            from sklearn.linear_model import LogisticRegression

            self.clf = LogisticRegression(C=C, max_iter=max_iter, tol=tol)
        else:
            self.clf = None
            self._w = None
            self._b = None
            self._classes = None

    def fit(self, feats: np.ndarray, labels: np.ndarray):
        if self.backend == "sklearn":
            self.clf.fit(feats, labels)
            return self
        import optax

        # remap labels to a dense class range like sklearn does
        classes, dense = np.unique(np.asarray(labels), return_inverse=True)
        self._classes = classes
        n, d = feats.shape
        c = len(classes)
        # no host roundtrip when feats already live on device
        x = jnp.asarray(feats).astype(jnp.bfloat16)
        y = jnp.asarray(dense, jnp.int32)
        C = self.C

        # Chunk the CE sum so the [n, c] f32 logits (and the softmax
        # residuals reverse-mode saves) never materialize at full n: at
        # ADE20K scale (4M x 150) they are ~2.3 GiB EACH, which on top of
        # the 8 GiB bf16 feature matrix overflows a 16 GiB chip during
        # backward. A rematerialized scan keeps peak extra memory to one
        # chunk's logits; the pad rows are masked out of the sum.
        chunk = min(self.chunk_size, n)
        n_pad = (-n) % chunk
        if n_pad:
            x = jnp.concatenate([x, jnp.zeros((n_pad, d), x.dtype)])
            y = jnp.concatenate([y, jnp.zeros((n_pad,), y.dtype)])
        mask = (jnp.arange(n + n_pad) < n).astype(jnp.float32)
        xc = x.reshape(-1, chunk, d)
        yc = y.reshape(-1, chunk)
        mc = mask.reshape(-1, chunk)

        opt = optax.lbfgs()
        p0 = (jnp.zeros((d, c), jnp.float32), jnp.zeros((c,), jnp.float32))
        s0 = opt.init(p0)
        max_iter, tol = self.max_iter, self.tol

        def gnorm_inf(g):
            return jnp.maximum(
                jnp.max(jnp.abs(g[0])), jnp.max(jnp.abs(g[1]))
            )

        @jax.jit
        def run(xc, yc, mc, p0, s0):
            # xc/yc enter as jit ARGUMENTS: closing over an ADE20K-scale
            # feature matrix lowers it as an 8+ GiB captured constant
            def loss_fn(params):
                w, b = params
                wb = w.astype(jnp.bfloat16)

                @jax.checkpoint
                def body(acc, args):
                    xb, yb, mb = args
                    logits = (
                        jax.lax.dot_general(
                            xb, wb, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        + b[None, :]
                    )
                    ce = optax.softmax_cross_entropy_with_integer_labels(
                        logits, yb)
                    return acc + jnp.sum(ce * mb), None

                total, _ = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32), (xc, yc, mc))
                return 0.5 * jnp.sum(w * w) + C * total

            value_and_grad = optax.value_and_grad_from_state(loss_fn)

            def cond(carry):
                _, _, it, gmax = carry
                return jnp.logical_and(it < max_iter, gmax > tol)

            def body(carry):
                params, state, it, _ = carry
                value, grad = value_and_grad(params, state=state)
                updates, state = opt.update(
                    grad, state, params, value=value, grad=grad,
                    value_fn=loss_fn,
                )
                params = optax.apply_updates(params, updates)
                return params, state, it + 1, gnorm_inf(grad)

            return jax.lax.while_loop(
                cond, body, (p0, s0, jnp.zeros((), jnp.int32),
                             jnp.full((), jnp.inf, jnp.float32))
            )

        (w, b), _, iters, gmax = run(xc, yc, mc, p0, s0)
        self._w = np.asarray(w)
        self._b = np.asarray(b)
        self.n_iter_ = int(iters)
        return self

    def predict(self, feats: np.ndarray) -> np.ndarray:
        if self.backend == "sklearn":
            return self.clf.predict(feats)

        @jax.jit
        def _logits(x):
            return jax.lax.dot_general(
                x.astype(jnp.bfloat16), jnp.asarray(self._w, jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jnp.asarray(self._b)[None, :]

        out = []
        f = np.asarray(feats, np.float32)
        for s in range(0, len(f), 262144):
            out.append(np.asarray(_logits(jnp.asarray(f[s:s + 262144]))))
        dense = np.concatenate(out).argmax(-1)
        return self._classes[dense]


@dataclasses.dataclass
class SegEvalResult:
    probe: str
    params: Dict
    miou: float
    acc: float


def evaluate_seg_probes(
    train_feats: np.ndarray,
    train_labels: np.ndarray,
    val_feats: np.ndarray,
    val_labels: np.ndarray,
    num_classes: int,
    knn_grid: Sequence[Dict] = DEFAULT_KNN_GRID,
    logreg_grid: Sequence[Dict] = DEFAULT_LOGREG_GRID,
    grid_slice: Tuple[int, int] = (0, 1),  # (index, total) for multi-host split
    ignore_labels: Sequence[int] = (255,),
) -> List[SegEvalResult]:
    """Run the probe grid; `grid_slice` reproduces the reference's
    round-robin split of hyper-parameters across workers
    (reference: eval_segmentation.py:104-133). Val patches whose label is
    in `ignore_labels` are excluded from the metrics (:50-62)."""
    keep = ~np.isin(np.asarray(val_labels), np.asarray(ignore_labels))
    val_feats = np.asarray(val_feats)[keep]
    val_labels = np.asarray(val_labels)[keep]
    jobs: List[Tuple[str, Dict]] = [("knn", g) for g in knn_grid] + [
        ("logreg", g) for g in logreg_grid
    ]
    idx, total = grid_slice
    results = []
    for j, (kind, g) in enumerate(jobs):
        if j % total != idx:
            continue
        if kind == "knn":
            probe = KNNSegProbe(num_classes=num_classes, **g)
        else:
            probe = LogregSegProbe(num_classes=num_classes, **g)
        probe.fit(train_feats, train_labels)
        pred = probe.predict(val_feats)
        cm = confusion_matrix(pred, val_labels, num_classes)
        m = miou_from_confusion(cm, exclude=ignore_labels)
        results.append(SegEvalResult(kind, g, m["miou"], m["acc"]))
    return results
