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


def bench_stages(root, n_imgs=64, n_local=8):
    """Per-stage single-core CPU accounting for ONE DINOv2 multi-crop
    sample (2x224 global + n_local x96 local): decode / RRC+flip /
    color / blur+solarize / normalize, ms per SOURCE IMAGE. This is the
    number that scales with host vCPUs (VERDICT round-2 item 6)."""
    from octic_vits_tpu.data import native
    from octic_vits_tpu.data.transforms import (
        color_jitter, gaussian_blur, random_resized_crop, to_uint8_array,
    )
    from PIL import Image as PILImage, ImageOps

    files = [os.path.join(root, "c0", f"{i}.jpg") for i in range(n_imgs)]
    rng = random.Random(0)
    t = {}

    def clock(key, fn, items):
        t0 = time.perf_counter()
        out = [fn(x) for x in items]
        t[key] = (time.perf_counter() - t0) / n_imgs * 1e3
        return out

    imgs = clock("decode", lambda p: PILImage.open(p).convert("RGB"), files)

    crop_plan = [(224, (0.32, 1.0))] * 2 + [(96, (0.05, 0.32))] * n_local

    def rrc_all(img):
        outs = []
        for size, scale in crop_plan:
            c = random_resized_crop(img, size, scale, rng)
            if rng.random() < 0.5:
                c = c.transpose(PILImage.FLIP_LEFT_RIGHT)
            outs.append(c)
        return outs

    crops = clock("rrc+flip (10 crops)", rrc_all, imgs)

    def color_all(cs):
        outs = []
        for c in cs:
            if rng.random() < 0.8:
                c = color_jitter(c, rng, 0.4, 0.4, 0.2, 0.1)
            if rng.random() < 0.2:
                c = ImageOps.grayscale(c).convert("RGB")
            outs.append(c)
        return outs

    crops = clock("color (10 crops)", color_all, crops)

    def blur_all(cs):
        outs = []
        for i, c in enumerate(cs):
            p = 1.0 if i == 0 else (0.1 if i == 1 else 0.5)
            if rng.random() < p:
                c = gaussian_blur(c, rng)
            if i == 1 and rng.random() < 0.2:
                c = ImageOps.solarize(c, threshold=128)
            outs.append(c)
        return outs

    crops = clock("blur+solarize (10 crops)", blur_all, crops)

    arrs = clock("to-uint8 (10 crops)", lambda cs: [to_uint8_array(c) for c in cs],
                 crops)

    def norm_sample(cs):
        g = native.normalize_batch(np.stack(cs[:2]))
        l = native.normalize_batch(np.stack(cs[2:]))
        return g, l

    clock("normalize (native batch)", norm_sample, arrs)

    total = sum(t.values())
    print("\nDINOv2 per-stage CPU accounting, PIL path (1 core, ms per"
          f" source image, 2x224+{n_local}x96 crops):")
    for k, v in t.items():
        print(f"  {k:28s} {v:7.2f} ms  ({100*v/total:4.1f}%)")
    print(f"  {'TOTAL':28s} {total:7.2f} ms -> {1e3/total:.1f} img/s/core")

    # end-to-end per-sample: PIL path vs native-C++ path
    from octic_vits_tpu.data.transforms import DataAugmentationDINO

    rng2 = random.Random(1)
    for use_native in (False, True):
        aug = DataAugmentationDINO(local_crops_number=n_local)
        aug.normalize = False
        aug.use_native = use_native
        imgs2 = [PILImage.open(p).convert("RGB") for p in files]
        t0 = time.perf_counter()
        for im in imgs2:
            aug(im, rng2)
        dt = (time.perf_counter() - t0) / n_imgs * 1e3
        label = "native-C++" if use_native else "PIL"
        print(f"  end-to-end aug/sample ({label:10s}): {dt:6.2f} ms "
              f"-> {1e3/(dt + t['decode']):.1f} img/s/core incl decode")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--local-crops", type=int, default=8)
    ap.add_argument("--stages", action="store_true",
                    help="per-stage CPU accounting only")
    args = ap.parse_args()

    if args.stages:
        with tempfile.TemporaryDirectory() as root:
            make_folder(root, 64)
            bench_stages(root, 64, args.local_crops)
        return

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
