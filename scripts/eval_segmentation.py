"""Segmentation probing driver (analog of
experiments/eval_dinov2_segmentation.py + eval_segmentation.py CLI):
patch features at 224^2 -> kNN + logreg probes -> mIoU table.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from octic_vits_tpu.data.seg_datasets import make_seg_dataset
from octic_vits_tpu.eval.segmentation import (
    evaluate_seg_probes,
    extract_patch_features,
)
from octic_vits_tpu.hub import load_backbone


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--dataset", choices=["ade20k", "voc2012"], default="ade20k")
    ap.add_argument("--root", required=True)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--train-split", default="train",
                    help="'trainaug' selects the VOC mmseg SBD-augmented set")
    ap.add_argument("--grid-index", type=int, default=0)
    ap.add_argument("--grid-total", type=int, default=1)
    args = ap.parse_args()

    model, params = load_backbone(args.model, checkpoint=args.checkpoint)
    if params is None:
        raise SystemExit("--checkpoint required")
    patch = model.patch_size

    @jax.jit
    def _feats(v, x):
        ret = model.apply(v, x, None, True, method=model.forward_features)
        return ret["x_norm_patchtokens"]

    def patch_feats(x):
        return _feats({"params": params}, jnp.asarray(x))

    train_ds = make_seg_dataset(args.dataset, args.root, args.train_split,
                                args.image_size)
    val_ds = make_seg_dataset(args.dataset, args.root, "val", args.image_size)
    nc = train_ds.num_classes
    ignore = tuple(train_ds.ignore_labels)

    def pairs(ds):
        for i in range(len(ds)):
            yield ds[i]

    tr_f, tr_y = extract_patch_features(
        patch_feats, pairs(train_ds), patch, nc, ignore_labels=ignore
    )
    va_f, va_y = extract_patch_features(
        patch_feats, pairs(val_ds), patch, nc, ignore_labels=ignore
    )
    results = evaluate_seg_probes(
        tr_f, tr_y, va_f, va_y, num_classes=nc,
        grid_slice=(args.grid_index, args.grid_total),
        ignore_labels=ignore,
    )
    for r in results:
        print(json.dumps(dict(probe=r.probe, params=r.params,
                              miou=r.miou, acc=r.acc)))


if __name__ == "__main__":
    main()
