"""Evaluation suites: k-NN, linear-probe grid, attention-pool probe,
segmentation probing, metrics.

Thin functional analogs of the reference wrapper modules
(reference: dinov2/eval/utils.py:21-45): `with_normalize(fn)` L2-normalizes
features; `with_intermediate_layers(model, params, n)` returns the frozen
n-last-blocks feature extractor used by the linear probe.
"""

from octic_vits_tpu.eval.attnpool import (
    AttnPoolClassifier,
    LinearClassifier,
    train_attnpool_probe,
    train_probe_grid,
)
from octic_vits_tpu.eval.distributed import (
    extract_features_sharded,
    gather_features_across_processes,
)
from octic_vits_tpu.eval.knn import (
    evaluate_knn,
    extract_features,
    knn_classify,
    knn_classify_sharded,
)
from octic_vits_tpu.eval.linear import (
    LinearProbeBank,
    ProbeVariant,
    build_probe_features,
    train_and_eval_linear_probes,
)
from octic_vits_tpu.eval.metrics import (
    confusion_matrix,
    miou_from_confusion,
    real_labels_accuracy,
    topk_accuracy,
)
from octic_vits_tpu.eval.segmentation import (
    KNNSegProbe,
    LogregSegProbe,
    evaluate_seg_probes,
    extract_patch_features,
)


def with_normalize(feature_fn):
    """L2-normalize extracted features (reference: eval/utils.py:21-27)."""
    import jax.numpy as jnp

    def fn(x):
        f = feature_fn(x)
        return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)

    return fn


def with_intermediate_layers(model, params, n: int = 4):
    """Frozen get_intermediate_layers extractor
    (reference: eval/utils.py:30-45)."""
    import jax

    @jax.jit
    def fn(variables, x):
        return model.apply(
            variables, x, n, False, True,
            method=model.get_intermediate_layers,
        )

    return lambda x: fn({"params": params}, x)
