"""Load the reference PyTorch implementation (/root/reference) on CPU.

The reference imports `timm` and `triton`, neither of which is installed
here; both are stubbed with the minimal surface the reference actually
touches (reference: octic_vits/d8_layers.py:12, octic_vits/d8_gelu.py:7-8,
deit/vit.py:9-12, octic_vits/model.py:18,21). The Triton GELU module is
monkeypatched to the reference's own eager `GeluD8`
(octic_vits/d8_layers.py:98-102) since there is no GPU to run the kernel.

This module is import-cached: `load_reference()` installs the stubs once
and returns the imported reference packages.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

_cache = {}


def _make_triton_stub():
    triton = types.ModuleType("triton")
    tl = types.ModuleType("triton.language")

    def _identity_decorator(fn=None, **kwargs):
        if fn is None:
            return lambda f: f
        return fn

    triton.jit = _identity_decorator
    triton.autotune = lambda *a, **k: (lambda f: f)
    triton.Config = lambda *a, **k: types.SimpleNamespace(args=a, kwargs=k)
    triton.cdiv = lambda a, b: (a + b - 1) // b
    triton.language = tl
    tl.constexpr = int  # only used as an annotation
    return triton, tl


def _make_timm_stub(torch):
    nn = torch.nn

    class Mlp(nn.Module):
        """timm.layers.Mlp surface used by deit/vit.py blocks."""

        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, bias=True,
                     drop=0.0, **kwargs):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True,
                     bias=True, **kwargs):
            super().__init__()
            self.patch_size = (patch_size, patch_size)
            self.grid_size = (img_size // patch_size, img_size // patch_size)
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size, bias=bias)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return self.norm(x)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob
            self.scale_by_keep = scale_by_keep

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            if self.scale_by_keep:
                mask = mask / keep
            return x * mask

    class LayerScale(nn.Module):
        def __init__(self, dim, init_values=1e-5, inplace=False):
            super().__init__()
            self.gamma = nn.Parameter(init_values * torch.ones(dim))

        def forward(self, x):
            return x * self.gamma

    class Attention(nn.Module):
        """timm.models.vision_transformer.Attention surface."""

        def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                     proj_drop=0.0, **kwargs):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            b, n, c = x.shape
            h = self.num_heads
            qkv = (self.qkv(x).reshape(b, n, 3, h, c // h)
                   .permute(2, 0, 3, 1, 4))
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = self.attn_drop(attn.softmax(dim=-1))
            x = (attn @ v).transpose(1, 2).reshape(b, n, c)
            return self.proj_drop(self.proj(x))

    class Block(nn.Module):
        """timm.models.vision_transformer.Block surface (pre-norm, optional
        LayerScale via init_values — parameter name `ls1.gamma`)."""

        def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                     drop=0.0, attn_drop=0.0, init_values=None,
                     drop_path=0.0, act_layer=nn.GELU,
                     norm_layer=nn.LayerNorm, **kwargs):
            super().__init__()
            self.norm1 = norm_layer(dim)
            self.attn = Attention(dim, num_heads=num_heads, qkv_bias=qkv_bias,
                                  attn_drop=attn_drop, proj_drop=drop)
            self.ls1 = (LayerScale(dim, init_values)
                        if init_values else nn.Identity())
            self.drop_path1 = (DropPath(drop_path)
                               if drop_path > 0.0 else nn.Identity())
            self.norm2 = norm_layer(dim)
            self.mlp = Mlp(dim, int(dim * mlp_ratio), act_layer=act_layer,
                           drop=drop)
            self.ls2 = (LayerScale(dim, init_values)
                        if init_values else nn.Identity())
            self.drop_path2 = (DropPath(drop_path)
                               if drop_path > 0.0 else nn.Identity())

        def forward(self, x):
            x = x + self.drop_path1(self.ls1(self.attn(self.norm1(x))))
            x = x + self.drop_path2(self.ls2(self.mlp(self.norm2(x))))
            return x

    def _cfg(url="", **kwargs):
        return dict(url=url, **kwargs)

    def register_model(fn):
        return fn

    def _assert(cond, msg=""):
        assert cond, msg

    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")
    trace_utils = types.ModuleType("timm.layers.trace_utils")
    models = types.ModuleType("timm.models")
    vit_mod = types.ModuleType("timm.models.vision_transformer")

    trace_utils._assert = _assert
    layers.trace_utils = trace_utils
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    layers.DropPath = DropPath
    layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    layers.Mlp = Mlp
    layers.PatchEmbed = PatchEmbed
    models.register_model = register_model
    models.vision_transformer = vit_mod
    vit_mod.Block = Block
    vit_mod.Attention = Attention
    vit_mod.Mlp = Mlp
    vit_mod.PatchEmbed = PatchEmbed
    vit_mod._cfg = _cfg
    timm.layers = layers
    timm.models = models
    return {
        "timm": timm,
        "timm.layers": layers,
        "timm.layers.trace_utils": trace_utils,
        "timm.models": models,
        "timm.models.vision_transformer": vit_mod,
    }


def load_reference():
    """Import and return the reference packages (cached).

    Returns a namespace with: octic_vits (package), d8_layers, d8_utils,
    model, deit_vit (deit/vit.py), dinov2_models, deit_models.
    """
    if _cache:
        return _cache["ns"]

    import torch

    os.environ.setdefault("XFORMERS_DISABLED", "1")
    triton, tl = _make_triton_stub()
    sys.modules.setdefault("triton", triton)
    sys.modules.setdefault("triton.language", tl)
    for name, mod in _make_timm_stub(torch).items():
        sys.modules.setdefault(name, mod)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import octic_vits.d8_layers as d8_layers
    import octic_vits.d8_utils as d8_utils
    import octic_vits.model as model
    import octic_vits.d8_invariantization as d8_inv
    import deit.vit as deit_vit
    import octic_vits.dinov2_models as dinov2_models
    import octic_vits.deit_models as deit_models

    # No GPU: route the Triton GELU (5-tuple interface) to the reference's
    # own eager GeluD8 (8-tuple interface) via the reference tuple
    # converters, exactly as the reference kernel self-test does
    # (octic_vits/d8_gelu.py:517-540). Patched everywhere the class name is
    # resolved at module construction time (octic_vits/model.py:124
    # hardcodes act_layer=TritonGeluD8).
    class EagerGeluD8Tuple5(torch.nn.Module):
        def forward(self, xs):
            x8 = d8_utils.convert_5tuple_to_8tuple(xs)
            return d8_utils.convert_8tuple_to_5tuple(
                d8_layers.GeluD8()(x8)
            )

    model.TritonGeluD8 = EagerGeluD8Tuple5
    d8_layers.TritonGeluD8 = EagerGeluD8Tuple5

    ns = types.SimpleNamespace(
        torch=torch,
        d8_layers=d8_layers,
        d8_utils=d8_utils,
        d8_inv=d8_inv,
        model=model,
        deit_vit=deit_vit,
        dinov2_models=dinov2_models,
        deit_models=deit_models,
    )
    _cache["ns"] = ns
    return ns


def state_dict_numpy(module):
    """torch module state_dict -> {name: np.ndarray} (fp32)."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
