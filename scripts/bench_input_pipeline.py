"""Input-pipeline throughput: is the host loader faster than the chip?

Measures images/sec of (a) the DINOv2 multi-crop pipeline (2 global + N
local crops + iBOT masking collate — the heaviest host path, reference:
dinov2/data/augmentations.py:19-118, collate.py:10-49) and (b) the DeiT
3-Augment pipeline, over a synthetic on-disk JPEG ImageFolder, through the
threaded prefetching DataLoader.

Compare the printed loader img/s against the device demand (training
throughput from BENCH.md / bench.py): loader >= device demand means the
input pipeline is not the bottleneck at this host:chip ratio.

Usage: python scripts/bench_input_pipeline.py [--n 512] [--batch 32]
                                              [--workers 8] [--local-crops 8]
"""

import argparse
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def make_folder(root: str, n: int, size: int = 500) -> None:
    """Synthetic JPEGs roughly IN1K-sized (~500px, quality 75)."""
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "c0"), exist_ok=True)
    # a handful of distinct images re-referenced n times would let PIL
    # cache nothing anyway (decode happens per open); still, write n files
    # so the file-system path is realistic.
    base = rng.randint(0, 255, (8, size, size, 3), np.uint8)
    for i in range(n):
        Image.fromarray(base[i % 8]).save(
            os.path.join(root, "c0", f"{i}.jpg"), quality=75
        )


def bench_dinov2(root, n, batch, workers, n_local, use_processes=False):
    from octic_vits_tpu.data.datasets import ImageFolder
    from octic_vits_tpu.data.loaders import DataLoader
    from octic_vits_tpu.data.samplers import EpochSampler
    from octic_vits_tpu.data.transforms import DataAugmentationDINO
    from octic_vits_tpu.train.dinov2.masking import (
        MaskingGenerator, collate_crops_and_masks,
    )

    from octic_vits_tpu.data import native

    aug = DataAugmentationDINO(
        global_crops_scale=(0.32, 1.0), local_crops_scale=(0.05, 0.32),
        local_crops_number=n_local, global_crops_size=224, local_crops_size=96,
    )
    # uint8 through the workers (4x cheaper transport), one batch
    # normalization pass in collate (native C++ kernel when built)
    aug.normalize = False
    ds = ImageFolder(root, transform=aug)
    n_tokens = (224 // 16) ** 2
    gen = MaskingGenerator(224 // 16, num_masking_patches=n_tokens // 2)
    rng = random.Random(0)

    def collate(samples):
        # samples: list of (crop dict, target); stack crop-major like the
        # reference collate (dinov2/data/collate.py:10-18)
        gc = np.stack(
            [s["global_crops"][j] for j in range(2) for s, _ in samples]
        )
        lc = np.stack(
            [s["local_crops"][j] for j in range(n_local) for s, _ in samples]
        )
        if gc.dtype == np.uint8:
            gc = native.normalize_batch(gc)
            lc = native.normalize_batch(lc)
        return collate_crops_and_masks(gc, lc, n_tokens, gen, rng=rng)

    loader = DataLoader(ds, EpochSampler(len(ds)), batch_size=batch,
                        collate_fn=collate, num_workers=workers,
                        use_processes=use_processes)
    # warmup one batch (thread spin-up)
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    seen = 0
    for b in it:
        seen += batch
    dt = time.perf_counter() - t0
    return seen / dt


def bench_deit(root, n, batch, workers):
    import functools

    from octic_vits_tpu.data.datasets import ImageFolder
    from octic_vits_tpu.data.loaders import DataLoader
    from octic_vits_tpu.data.samplers import EpochSampler
    from octic_vits_tpu.data.transforms import three_augment

    rng = random.Random(0)
    tf = functools.partial(three_augment, size=224, rng=rng)
    ds = ImageFolder(root, transform=tf)
    loader = DataLoader(ds, EpochSampler(len(ds)), batch_size=batch,
                        num_workers=workers)
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    seen = 0
    for b in it:
        seen += batch
    dt = time.perf_counter() - t0
    return seen / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--local-crops", type=int, default=8)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        make_folder(root, args.n)
        deit_ips = bench_deit(root, args.n, args.batch, args.workers)
        dino_ips = bench_dinov2(root, args.n, args.batch, args.workers,
                                args.local_crops)
        dino_proc = bench_dinov2(root, args.n, args.batch, args.workers,
                                 args.local_crops, use_processes=True)
    print(f"deit 3-augment loader: {deit_ips:.1f} img/s "
          f"({args.workers} workers)")
    print(f"dinov2 multi-crop loader (2g+{args.local_crops}l + masking): "
          f"{dino_ips:.1f} img/s threads, {dino_proc:.1f} img/s processes "
          f"({args.workers} workers)")


if __name__ == "__main__":
    main()
