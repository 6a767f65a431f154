"""DINOv2 SSL training CLI (reference: dinov2/train/train.py:30-64 +
utils/config.py setup): --config-file + dotlist opts over the default YAML.
"""

from __future__ import annotations

import argparse
import os
import random
from typing import List, Optional

import jax.numpy as jnp

_DEFAULT_CFG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    "configs", "ssl_default_config.yaml",
)


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("DINOv2 SSL training", add_help=False)
    p.add_argument("--config-file", default="")
    p.add_argument("--output-dir", default="./out_ssl")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--max-iter", type=int, default=None)
    p.add_argument("opts", nargs="*", default=[])
    return p


def setup(args):
    """default <- yaml <- dotlist merge + sqrt lr scaling
    (reference: dinov2/utils/config.py:21-73)."""
    from octic_vits_tpu.utils.config import build_config, load_yaml, write_config
    from octic_vits_tpu.train.dinov2.schedules import sqrt_lr_scaling

    cfg = build_config(load_yaml(_DEFAULT_CFG), args.config_file or None, args.opts)
    import jax

    global_batch = cfg.train.batch_size_per_gpu * jax.device_count()
    if not cfg.optim.lr:
        cfg.optim.lr = sqrt_lr_scaling(cfg.optim.base_lr, global_batch)
    os.makedirs(args.output_dir, exist_ok=True)
    write_config(cfg, args.output_dir)
    return cfg


def main(argv: Optional[List[str]] = None):
    import jax

    from octic_vits_tpu.data.loaders import make_dataset
    from octic_vits_tpu.data.samplers import ShardedInfiniteSampler
    from octic_vits_tpu.data.transforms import DataAugmentationDINO
    from octic_vits_tpu.train.dinov2.masking import MaskingGenerator
    from octic_vits_tpu.train.dinov2.ssl_meta_arch import SSLConfig, SSLMetaArch
    from octic_vits_tpu.train.dinov2.train import do_train, ssl_batch_iterator

    # get_args_parser() is add_help=False so it can be used as a parent
    # parser (reference: dinov2/train/train.py:335 wraps it the same way).
    parser = argparse.ArgumentParser(
        "DINOv2 SSL training", parents=[get_args_parser()]
    )
    args = parser.parse_args(argv)
    cfg = setup(args)

    arch = SSLMetaArch(
        SSLConfig(
            arch=cfg.student.arch,
            img_size=cfg.crops.global_crops_size,
            local_crop_size=cfg.crops.local_crops_size,
            patch_size=cfg.student.patch_size,
            drop_path_rate=cfg.student.drop_path_rate,
            dino_out_dim=cfg.dino.head_n_prototypes,
            dino_head_hidden_dim=cfg.dino.head_hidden_dim,
            dino_head_bottleneck_dim=cfg.dino.head_bottleneck_dim,
            dino_head_nlayers=cfg.dino.head_nlayers,
            dino_loss_weight=cfg.dino.loss_weight,
            koleo_loss_weight=cfg.dino.koleo_loss_weight,
            ibot_out_dim=cfg.ibot.head_n_prototypes,
            ibot_separate_head=cfg.ibot.separate_head,
            ibot_loss_weight=cfg.ibot.loss_weight,
            centering=cfg.train.centering,
            n_local_crops=cfg.crops.local_crops_number,
            clip_grad=cfg.optim.clip_grad,
            layerwise_decay=cfg.optim.layerwise_decay,
            patch_embed_lr_mult=cfg.optim.patch_embed_lr_mult,
            compute_dtype=jnp.bfloat16
            if cfg.compute_precision.compute_dtype == "bfloat16"
            else jnp.float32,
            backbone_scan=bool(getattr(cfg.student, "scan_blocks", True)),
            backbone_remat=bool(getattr(cfg.student, "remat", True)),
        )
    )

    augmenter = DataAugmentationDINO(
        global_crops_scale=tuple(cfg.crops.global_crops_scale),
        local_crops_scale=tuple(cfg.crops.local_crops_scale),
        local_crops_number=cfg.crops.local_crops_number,
        global_crops_size=cfg.crops.global_crops_size,
        local_crops_size=cfg.crops.local_crops_size,
    )
    dataset = make_dataset(cfg.train.dataset_path)
    n_tokens = (cfg.crops.global_crops_size // cfg.student.patch_size) ** 2
    gen = MaskingGenerator(
        cfg.crops.global_crops_size // cfg.student.patch_size,
        num_masking_patches=n_tokens // 2,
    )
    host_batch = cfg.train.batch_size_per_gpu * jax.local_device_count()

    def make_batch_iter(start_iter: int):
        # deterministic resume: this host's stream has consumed exactly
        # host_batch indices per completed iteration, so advance the sampler
        # past them (reference: dinov2/data/samplers.py:174-182 + the
        # sampler_advance plumbing in dinov2/data/loaders.py)
        sampler = iter(
            ShardedInfiniteSampler(
                len(dataset), shard=jax.process_index(),
                num_shards=jax.process_count(), seed=cfg.train.seed,
                advance=start_iter * host_batch,
            )
        )
        return ssl_batch_iterator(
            dataset, sampler, augmenter,
            batch_size=host_batch,
            n_tokens=n_tokens, mask_generator=gen,
            mask_probability=cfg.ibot.mask_sample_probability,
            mask_ratio_tuple=tuple(cfg.ibot.mask_ratio_min_max),
            rng=random.Random(cfg.train.seed + jax.process_index()),
        )

    return do_train(
        arch, cfg, None, args.output_dir,
        max_iter=args.max_iter, seed=cfg.train.seed,
        make_batch_iter=make_batch_iter,
        resume=not args.no_resume, eval_only=args.eval_only,
    )


if __name__ == "__main__":
    main()
