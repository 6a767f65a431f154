"""Segmentation probing datasets: ADE20K and PASCAL VOC2012.

Loader parity with the reference's auto-downloading dataset factory
(reference: dinov2/eval/segmentation/data.py:240-292) minus the network
fetch (zero-egress: `root` must already contain the extracted archives in
the standard layouts below). Yields (image [H,W,3] normalized, labels
[H,W] int with 255 = ignore) resized so the model sees `image_size`^2.

ADE20K layout:   root/images/{training,validation}/*.jpg
                 root/annotations/{training,validation}/*.png  (1..150; 0=bg->ignore)
VOC2012 layout:  root/JPEGImages/*.jpg, root/SegmentationClass/*.png,
                 root/ImageSets/Segmentation/{train,val}.txt
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np
from PIL import Image

from octic_vits_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def _load_pair(img_path: str, lab_path: str, image_size: int):
    with Image.open(img_path) as im:
        im = im.convert("RGB").resize((image_size, image_size), Image.BICUBIC)
        img = np.asarray(im, np.float32) / 255.0
    img = (img - IMAGENET_MEAN) / IMAGENET_STD
    with Image.open(lab_path) as lm:
        lab = np.asarray(
            lm.resize((image_size, image_size), Image.NEAREST)
        ).astype(np.int32)
    return img, lab


class ADE20K:
    """150 classes; label png stores 0=background (ignored), 1..150."""

    num_classes = 150
    ignore_index = 255

    def __init__(self, root: str, split: str = "training", image_size: int = 224):
        sub = "training" if split in ("train", "training", "TRAIN") else "validation"
        img_dir = os.path.join(root, "images", sub)
        ann_dir = os.path.join(root, "annotations", sub)
        names = sorted(f[:-4] for f in os.listdir(img_dir) if f.endswith(".jpg"))
        self.items = [
            (os.path.join(img_dir, n + ".jpg"), os.path.join(ann_dir, n + ".png"))
            for n in names
        ]
        self.image_size = image_size

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i: int):
        img, lab = _load_pair(*self.items[i], self.image_size)
        lab = lab - 1  # 0 background -> -1
        lab[lab < 0] = self.ignore_index
        return img, lab


class VOC2012:
    """21 classes (incl. background=0); 255 = void/ignore."""

    num_classes = 21
    ignore_index = 255

    def __init__(self, root: str, split: str = "train", image_size: int = 224):
        split = {"TRAIN": "train", "VAL": "val"}.get(split, split)
        list_file = os.path.join(root, "ImageSets", "Segmentation", f"{split}.txt")
        with open(list_file) as f:
            names = [l.strip() for l in f if l.strip()]
        self.items = [
            (
                os.path.join(root, "JPEGImages", n + ".jpg"),
                os.path.join(root, "SegmentationClass", n + ".png"),
            )
            for n in names
        ]
        self.image_size = image_size

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i: int):
        return _load_pair(*self.items[i], self.image_size)


def make_seg_dataset(name: str, root: str, split: str, image_size: int = 224):
    """'ade20k' | 'voc2012' factory (reference URL-scheme factory analog)."""
    name = name.lower()
    if name in ("ade20k", "ade"):
        return ADE20K(root, split, image_size)
    if name in ("voc2012", "voc"):
        return VOC2012(root, split, image_size)
    raise ValueError(f"unknown segmentation dataset {name}")
