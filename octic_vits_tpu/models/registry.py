"""Named model registry (timm-registry analog).

Covers every named config the reference registers:
DeiT III octic models (reference: octic_vits/deit_models.py:11-73),
DINOv2 octic models (reference: octic_vits/dinov2_models.py:269-329),
DeiT III LS baselines (reference: deit/vit.py:397-683), and DINOv2
standard backbones (reference: dinov2/models/vision_transformer.py:343-384).
"""

from __future__ import annotations

from typing import Callable, Dict

from octic_vits_tpu.models.dinov2_vit import (
    DinoVisionTransformer,
    OcticDinoVisionTransformer,
)
from octic_vits_tpu.models.octic_vit import OcticVisionTransformer
from octic_vits_tpu.models.vit import VisionTransformer

_REGISTRY: Dict[str, Callable] = {}


def register_model(fn: Callable) -> Callable:
    _REGISTRY[fn.__name__] = fn
    return fn


def create_model(name: str, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def list_models():
    return sorted(_REGISTRY)


# --------------------------------------------------------------------------
# DeiT III octic models (supervised recipe; layerscale init 1e-4)
# --------------------------------------------------------------------------


@register_model
def hybrid_deit_large_patch16(img_size=224, **kwargs):
    return OcticVisionTransformer(
        img_size=img_size, patch_size=16, embed_dim=1024, depth=24, num_heads=16,
        mlp_ratio=4.0, qkv_bias=True, **kwargs,
    )


@register_model
def hybrid_deit_huge_patch14(img_size=224, **kwargs):
    return OcticVisionTransformer(
        img_size=img_size, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, qkv_bias=True, **kwargs,
    )


@register_model
def d8_inv_early_deit_large_patch16(img_size=224, **kwargs):
    return OcticVisionTransformer(
        img_size=img_size, patch_size=16, embed_dim=1024, depth=24, num_heads=16,
        mlp_ratio=4.0, qkv_bias=True, invariant=True, **kwargs,
    )


@register_model
def d8_inv_early_deit_huge_patch14(img_size=224, **kwargs):
    return OcticVisionTransformer(
        img_size=img_size, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, qkv_bias=True, invariant=True, **kwargs,
    )


# --------------------------------------------------------------------------
# DINOv2 octic models (SSL recipe; layerscale init 1e-5, biases on)
# --------------------------------------------------------------------------


@register_model
def hybrid_dinov2_vit_large_patch16(img_size=224, **kwargs):
    return OcticDinoVisionTransformer(
        img_size=img_size, patch_size=16, embed_dim=1024, depth=24, num_heads=16,
        mlp_ratio=4.0, init_scale=1e-5, **kwargs,
    )


@register_model
def hybrid_dinov2_vit_huge_patch16(img_size=224, **kwargs):
    return OcticDinoVisionTransformer(
        img_size=img_size, patch_size=16, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, init_scale=1e-5, **kwargs,
    )


@register_model
def d8_inv_early_dinov2_vit_large_patch16(img_size=224, **kwargs):
    return OcticDinoVisionTransformer(
        img_size=img_size, patch_size=16, embed_dim=1024, depth=24, num_heads=16,
        mlp_ratio=4.0, init_scale=1e-5, invariant=True, **kwargs,
    )


@register_model
def d8_inv_early_dinov2_vit_huge_patch16(img_size=224, **kwargs):
    return OcticDinoVisionTransformer(
        img_size=img_size, patch_size=16, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, init_scale=1e-5, invariant=True, **kwargs,
    )


# --------------------------------------------------------------------------
# DeiT III LS baselines (standard ViTs; reference: deit/vit.py:397-683)
# --------------------------------------------------------------------------

_DEIT_DIMS = {
    "tiny": (192, 12, 3),
    "small": (384, 12, 6),
    "medium": (512, 12, 8),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
    "huge": (1280, 32, 16),
}


def _deit_ls(size: str, patch: int, img_size=224, **kwargs):
    d, depth, heads = _DEIT_DIMS[size]
    # every named reference DeiT factory passes partial(nn.LayerNorm, eps=1e-6)
    # (reference: deit/vit.py:410-683); the bare-class default stays 1e-5
    kwargs.setdefault("norm_eps", 1e-6)
    return VisionTransformer(
        img_size=img_size, patch_size=patch, embed_dim=d, depth=depth,
        num_heads=heads, mlp_ratio=4.0, qkv_bias=True, **kwargs,
    )


for _size in _DEIT_DIMS:
    for _patch in (14, 16):
        _name = f"deit_{_size}_patch{_patch}_LS"

        def _factory(img_size=224, _size=_size, _patch=_patch, **kwargs):
            return _deit_ls(_size, _patch, img_size=img_size, **kwargs)

        _factory.__name__ = _name
        register_model(_factory)


# --------------------------------------------------------------------------
# DINOv2 standard backbones
# --------------------------------------------------------------------------


@register_model
def dinov2_vit_large_patch16(img_size=224, **kwargs):
    return DinoVisionTransformer(
        img_size=img_size, patch_size=16, embed_dim=1024, depth=24, num_heads=16,
        mlp_ratio=4.0, layerscale_init=1e-5, **kwargs,
    )


@register_model
def dinov2_vit_huge_patch16(img_size=224, **kwargs):
    return DinoVisionTransformer(
        img_size=img_size, patch_size=16, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, layerscale_init=1e-5, **kwargs,
    )


# upstream DINOv2 hub backbones (reference: dinov2/hub/backbones.py:64-156):
# ViT-S/B/L/g2 at patch 14, layerscale init 1.0, optional 4 registers;
# giant2 uses the fused-SwiGLU FFN.
_UPSTREAM_DINOV2 = {
    "dinov2_vits14": dict(embed_dim=384, depth=12, num_heads=6),
    "dinov2_vitb14": dict(embed_dim=768, depth=12, num_heads=12),
    "dinov2_vitl14": dict(embed_dim=1024, depth=24, num_heads=16),
    "dinov2_vitg14": dict(
        embed_dim=1536, depth=40, num_heads=24, ffn_layer="swiglu"
    ),
}


def _register_upstream_dinov2():
    for tag, arch_kw in _UPSTREAM_DINOV2.items():
        for n_reg in (0, 4):
            name = tag + ("_reg" if n_reg else "")

            def _factory(img_size=518, _arch_kw=dict(arch_kw),
                         _n_reg=n_reg, **kwargs):
                merged = dict(
                    patch_size=14, mlp_ratio=4.0, layerscale_init=1.0,
                    num_register_tokens=_n_reg, **_arch_kw,
                )
                merged.update(kwargs)
                return DinoVisionTransformer(img_size=img_size, **merged)

            _factory.__name__ = name
            register_model(_factory)


_register_upstream_dinov2()


# small test-size configs (not in the reference; used by unit tests/benches)


@register_model
def hybrid_vit_small_test(img_size=64, **kwargs):
    return OcticVisionTransformer(
        img_size=img_size, patch_size=8, embed_dim=64, depth=4, num_heads=2,
        mlp_ratio=2.0, qkv_bias=True, num_classes=10, **kwargs,
    )
