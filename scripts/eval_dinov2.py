"""DINOv2 classification eval driver: k-NN + linear probe on a frozen
backbone (analog of experiments/eval_dinov2_classification.py +
dinov2/eval/{knn,linear}.py CLIs).

Usage:
  python scripts/eval_dinov2.py knn --model hybrid_dinov2_vit_large_patch16 \
      --checkpoint <orbax-dir|pth> --train-data /data/in1k/train --val-data /data/in1k/val
"""

from __future__ import annotations

import argparse
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from octic_vits_tpu.data.datasets import ImageFolder
from octic_vits_tpu.data.loaders import DataLoader
from octic_vits_tpu.data.samplers import EpochSampler
from octic_vits_tpu.data.transforms import eval_transform
from octic_vits_tpu.eval.knn import evaluate_knn, extract_features
from octic_vits_tpu.hub import load_backbone


def feature_loader(path, batch, workers):
    ds = ImageFolder(path, transform=lambda im: eval_transform(im, 224))
    return DataLoader(
        ds, EpochSampler(len(ds)), batch_size=batch,
        num_workers=workers, drop_last=False,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["knn", "linear"])
    ap.add_argument("--model", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--train-data", required=True)
    ap.add_argument("--val-data", required=True)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--n-per-class", type=int, default=None)
    ap.add_argument("--num-classes", type=int, default=1000)
    args = ap.parse_args()

    model, params = load_backbone(args.model, checkpoint=args.checkpoint)
    if params is None:
        raise SystemExit("--checkpoint required (random weights are pointless here)")

    if args.mode == "knn":
        fwd_jit = jax.jit(lambda v, x: model.apply(v, x))
        fwd = lambda x: fwd_jit({"params": params}, jnp.asarray(x))
        if jax.process_count() > 1:
            # each host extracts its dataset shard, then the shards are
            # merged on every host (reference: dinov2/eval/utils.py:86-146)
            from octic_vits_tpu.eval.distributed import (
                extract_features_sharded,
            )

            def ds(path):
                return ImageFolder(
                    path, transform=lambda im: eval_transform(im, 224)
                )

            tr_f, tr_y = extract_features_sharded(
                fwd, ds(args.train_data), batch_size=args.batch,
                num_workers=args.workers,
            )
            va_f, va_y = extract_features_sharded(
                fwd, ds(args.val_data), batch_size=args.batch,
                num_workers=args.workers,
            )
        else:
            tr_f, tr_y = extract_features(fwd, feature_loader(args.train_data, args.batch, args.workers))
            va_f, va_y = extract_features(fwd, feature_loader(args.val_data, args.batch, args.workers))
        res = evaluate_knn(
            tr_f, tr_y, va_f, va_y, num_classes=args.num_classes,
            n_per_class=args.n_per_class,
        )
    else:
        from octic_vits_tpu.eval.linear import train_and_eval_linear_probes

        n_last = 4

        @jax.jit
        def _feats(v, x):
            return model.apply(
                v, x, n_last, True, True,
                method=model.get_intermediate_layers,
            )

        def feats_fn(x):
            return _feats({"params": params}, jnp.asarray(x))

        res = train_and_eval_linear_probes(
            lambda x: list(feats_fn(x)),
            lambda: feature_loader(args.train_data, args.batch, args.workers),
            feature_loader(args.val_data, args.batch, args.workers),
            num_classes=args.num_classes,
            batch_size=args.batch,
        )
    print(json.dumps(res, indent=2, default=str))


if __name__ == "__main__":
    main()
