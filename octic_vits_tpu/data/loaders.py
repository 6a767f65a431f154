"""Dataset DSL + prefetching data loader.

`make_dataset` parses the reference's string DSL
("ImageNet:split=TRAIN:root=...:extra=...", reference:
dinov2/data/loaders.py:44-97). `DataLoader` is a process-pool loader with
background prefetch — the host-side producer feeding the device; heavy
decode/augment runs in workers while TPU steps overlap.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from enum import Enum
from typing import Any, Callable, Iterable, Iterator, Optional

import numpy as np

from octic_vits_tpu.data.datasets import ImageFolder, ImageNet22k, ImageNetExtra


class SamplerType(Enum):
    DISTRIBUTED = 0
    EPOCH = 1
    INFINITE = 2
    SHARDED_INFINITE = 3
    RA = 4


def _parse_dsl(spec: str):
    name, _, rest = spec.partition(":")
    kwargs = {}
    for tok in rest.split(":"):
        if tok:
            k, _, v = tok.partition("=")
            kwargs[k] = v
    return name, kwargs


def make_dataset(spec: str, transform: Optional[Callable] = None):
    """e.g. "ImageNet:split=TRAIN:root=/data/in1k:extra=/data/extra" or
    "ImageFolder:root=/data/train"."""
    name, kw = _parse_dsl(spec)
    if name == "ImageNet":
        return ImageNetExtra(
            root=kw["root"], extra=kw["extra"], split=kw.get("split", "TRAIN"),
            transform=transform,
        )
    if name == "ImageNet22k":
        return ImageNet22k(
            root=kw["root"], extra=kw["extra"], transform=transform
        )
    if name == "ImageFolder":
        return ImageFolder(root=kw["root"], transform=transform)
    raise ValueError(f"unknown dataset '{name}'")


def default_collate(samples):
    """Stack (array, target) pairs into batch arrays."""
    xs = np.stack([s[0] for s in samples])
    ys = np.asarray([s[1] for s in samples])
    return xs, ys


class DataLoader:
    """Threaded prefetching loader.

    Decode/augment is GIL-releasing (PIL, numpy), so threads give real
    parallelism without fork overhead; `prefetch` batches are staged ahead.
    """

    def __init__(
        self,
        dataset,
        sampler: Iterable[int],
        batch_size: int,
        collate_fn: Callable = default_collate,
        num_workers: int = 8,
        drop_last: bool = True,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __iter__(self) -> Iterator[Any]:
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            batch_idx = []
            try:
                for idx in self.sampler:
                    if stop.is_set():
                        return
                    batch_idx.append(idx)
                    if len(batch_idx) == self.batch_size:
                        samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                        out_q.put(self.collate_fn(samples))
                        batch_idx = []
                if batch_idx and not self.drop_last:
                    samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                    out_q.put(self.collate_fn(samples))
            finally:
                out_q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)
