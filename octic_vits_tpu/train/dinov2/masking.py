"""iBOT block-wise masking + static-shape collate (host side, numpy).

`MaskingGenerator` reproduces the reference block-random masking
(reference: dinov2/data/masking.py:11-86). `collate_crops_and_masks`
reproduces the reference collate (reference: dinov2/data/collate.py:10-49)
with one TPU-critical change: the masked-token index list is padded to the
deterministic `upperbound` (which depends only on the config, not the
sample), so every training batch has identical shapes and the SPMD step
compiles exactly once.
"""

from __future__ import annotations

import math
import random
from typing import Dict, List, Sequence, Tuple

import numpy as np


class MaskingGenerator:
    def __init__(
        self,
        input_size,
        num_masking_patches=None,
        min_num_patches=4,
        max_num_patches=None,
        min_aspect=0.3,
        max_aspect=None,
    ):
        if not isinstance(input_size, tuple):
            input_size = (input_size,) * 2
        self.height, self.width = input_size
        self.num_patches = self.height * self.width
        self.min_num_patches = min_num_patches
        self.max_num_patches = (
            num_masking_patches if max_num_patches is None else max_num_patches
        )
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))

    def _place_block(self, mask, max_mask_patches, rng: random.Random):
        delta = 0
        for _ in range(10):
            target_area = rng.uniform(self.min_num_patches, max_mask_patches)
            aspect = math.exp(rng.uniform(*self.log_aspect_ratio))
            h = int(round(math.sqrt(target_area * aspect)))
            w = int(round(math.sqrt(target_area / aspect)))
            if w < self.width and h < self.height:
                top = rng.randint(0, self.height - h)
                left = rng.randint(0, self.width - w)
                region = mask[top : top + h, left : left + w]
                num_masked = int(region.sum())
                if 0 < h * w - num_masked <= max_mask_patches:
                    delta = int((~region).sum())
                    region[:] = True
                if delta > 0:
                    break
        return delta

    def __call__(self, num_masking_patches=0, rng: random.Random = random):
        mask = np.zeros((self.height, self.width), dtype=bool)
        count = 0
        while count < num_masking_patches:
            max_mask = min(num_masking_patches - count, self.max_num_patches or 1e9)
            delta = self._place_block(mask, max_mask, rng)
            if delta == 0:
                break
            count += delta
        return mask


def mask_upperbound(
    batch_size: int, n_tokens: int, mask_probability: float,
    mask_ratio_tuple: Tuple[float, float],
) -> int:
    """Deterministic padding bound — same arithmetic as the reference's
    per-batch `upperbound` (dinov2/data/collate.py:24-30), which depends
    only on the linspace of max ratios, never on the random draw."""
    n_masked = int(batch_size * mask_probability)
    probs = np.linspace(*mask_ratio_tuple, n_masked + 1)
    return int(sum(int(n_tokens * probs[i + 1]) for i in range(n_masked)))


def collate_crops_and_masks(
    global_crops: np.ndarray,   # [2B, S, S, 3] crop-major
    local_crops: np.ndarray,    # [nl*B, s, s, 3] crop-major
    n_tokens: int,
    mask_generator: MaskingGenerator,
    mask_probability: float = 0.5,
    mask_ratio_tuple: Tuple[float, float] = (0.1, 0.5),
    rng: random.Random = random,
    dtype=np.float32,
) -> Dict[str, np.ndarray]:
    b = len(global_crops)
    n_samples_masked = int(b * mask_probability)
    probs = np.linspace(*mask_ratio_tuple, n_samples_masked + 1)
    upperbound = mask_upperbound(b, n_tokens, mask_probability, mask_ratio_tuple)

    masks_list: List[np.ndarray] = []
    for i in range(n_samples_masked):
        target = int(n_tokens * rng.uniform(probs[i], probs[i + 1]))
        masks_list.append(mask_generator(target, rng=rng).flatten())
    for _ in range(n_samples_masked, b):
        masks_list.append(np.zeros(n_tokens, dtype=bool))
    rng.shuffle(masks_list)

    masks = np.stack(masks_list)  # [2B, N]
    flat_idx = np.nonzero(masks.flatten())[0].astype(np.int32)
    n_masked = len(flat_idx)
    assert n_masked <= upperbound, (n_masked, upperbound)

    mask_indices = np.zeros(upperbound, dtype=np.int32)
    mask_indices[:n_masked] = flat_idx

    per_img_weight = 1.0 / np.clip(masks.sum(-1), 1.0, None)  # [2B]
    weights = np.repeat(per_img_weight, masks.sum(-1).astype(np.int64))
    masks_weight = np.zeros(upperbound, dtype=np.float32)
    masks_weight[:n_masked] = weights

    return {
        "global_crops": global_crops.astype(dtype),
        "local_crops": local_crops.astype(dtype),
        "masks": masks,
        "mask_indices": mask_indices,
        "masks_weight": masks_weight,
        "n_masked_patches": np.asarray(n_masked, np.int32),
    }
