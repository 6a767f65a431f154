"""Datasets: ImageFolder + the reference's precomputed-metadata ImageNet.

The reference ImageNet dataset reads "extra" numpy metadata (entries array
with per-sample class ids, mmap'd) so no directory walk happens at startup
(reference: dinov2/data/datasets/image_net.py:55-291). We support both:
`ImageFolder` walks class subdirectories; `ImageNetExtra` consumes the same
`{split}_entries.npy` / class-ids format and can `dump_extra()` it.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ImageFolder:
    """Minimal torchvision-ImageFolder analog: root/<class>/<image>."""

    def __init__(self, root: str, transform: Optional[Callable] = None):
        self.root = root
        self.transform = transform
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.classes = classes
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append((os.path.join(cdir, fname), self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def get_target(self, index: int) -> int:
        return self.samples[index][1]

    def __getitem__(self, index: int):
        path, target = self.samples[index]
        with Image.open(path) as img:
            img = img.convert("RGB")
            out = self.transform(img) if self.transform else img
        return out, target


class ImageNetExtra:
    """ImageNet with precomputed entries metadata.

    Layout: `extra/{split}_entries.npy` — structured array with fields
    (`path` utf8, `class_id` int) or a 2-column object array; images under
    `root`. `dump_extra` generates the metadata from an ImageFolder walk
    (reference: dinov2/data/datasets/image_net.py:200-291)."""

    def __init__(self, root: str, extra: str, split: str = "TRAIN",
                 transform: Optional[Callable] = None):
        self.root = root
        self.split = split
        self.transform = transform
        entries_path = os.path.join(extra, f"{split.lower()}_entries.npy")
        self.entries = np.load(entries_path, allow_pickle=True)

    @staticmethod
    def dump_extra(root: str, extra: str, split: str = "TRAIN") -> str:
        ds = ImageFolder(root)
        rel = [(os.path.relpath(p, root), t) for p, t in ds.samples]
        arr = np.array(rel, dtype=object)
        os.makedirs(extra, exist_ok=True)
        out = os.path.join(extra, f"{split.lower()}_entries.npy")
        np.save(out, arr)
        return out

    def __len__(self):
        return len(self.entries)

    def get_target(self, index: int) -> int:
        return int(self.entries[index][1])

    def __getitem__(self, index: int):
        relpath, target = self.entries[index]
        with Image.open(os.path.join(self.root, str(relpath))) as img:
            img = img.convert("RGB")
            out = self.transform(img) if self.transform else img
        return out, int(target)


class ImageNet22k(ImageNetExtra):
    """IN22k with the same precomputed-entries metadata format
    (reference: dinov2/data/datasets/image_net_22k.py). The reference's
    22k-specific machinery (tarball block reads) is storage-layout specific;
    here both 1k and 22k consume `{split}_entries.npy` + an image root."""

    def __init__(self, root: str, extra: str, transform: Optional[Callable] = None):
        super().__init__(root, extra, split="ALL", transform=transform)


class DatasetWithEnumeratedTargets:
    """(image, (index, target)) wrapper for order-independent distributed
    feature extraction (reference: dinov2/data/adapters.py:11-28)."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, index: int):
        image, target = self._dataset[index]
        return image, (index, target)
