"""Reference (PyTorch) checkpoint -> flax param tree conversion.

Maps the reference state_dict layouts onto this package's parameter trees
so released checkpoints evaluate identically:

* OcticVisionTransformer (reference: octic_vits/model.py): ParameterList
  pos_embed.0-5 / cls_token.0, LinearD8 sub-linears (lin_A1..lin_E),
  AffineD8/LayerScaleD8 alphas, LiftIrrepD8Conv2d quadrant weights.
* standard DeiT-LS ViT (reference: deit/vit.py) and DINOv2 ViT.

Conventions: torch Linear weight [out,in] -> kernel [in,out] (transpose);
torch conv weight [O,I,kh,kw] -> [kh,kw,I,O]; `_orig_mod.` compile prefixes
and `module./backbone.` wrappers are stripped
(reference: deit/main.py:417-423, dinov2/utils/utils.py:20-33).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

_STRIP_PREFIXES = ("_orig_mod.", "module.", "backbone.")


def normalize_keys(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        changed = True
        while changed:
            changed = False
            for p in _STRIP_PREFIXES:
                if k.startswith(p):
                    k = k[len(p):]
                    changed = True
        out[k] = np.asarray(v)
    return out


def _t(w):  # torch linear -> flax kernel
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):  # [O, I, kh, kw] -> [kh, kw, I, O]
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _linear_d8(sd, prefix, has_bias):
    out = {
        "kernel_1d": np.stack(
            [
                _t(sd[f"{prefix}.lin_A1.weight"]),
                _t(sd[f"{prefix}.lin_A2.weight"]),
                _t(sd[f"{prefix}.lin_B1.weight"]),
                _t(sd[f"{prefix}.lin_B2.weight"]),
            ]
        ),
        "kernel_e": _t(sd[f"{prefix}.lin_E.weight"]),
    }
    if has_bias and f"{prefix}.lin_A1.bias" in sd:
        out["bias_a1"] = np.asarray(sd[f"{prefix}.lin_A1.bias"])
    return out


def _scale_d8(sd, prefix, with_bias=False):
    out = {
        "alpha_1d": np.stack(
            [
                np.asarray(sd[f"{prefix}.alpha_A1"]),
                np.asarray(sd[f"{prefix}.alpha_A2"]),
                np.asarray(sd[f"{prefix}.alpha_B1"]),
                np.asarray(sd[f"{prefix}.alpha_B2"]),
            ]
        ),
        "alpha_e": np.asarray(sd[f"{prefix}.alpha_E"]),
    }
    if with_bias and f"{prefix}.beta" in sd:
        out["beta_a1"] = np.asarray(sd[f"{prefix}.beta"])
    return out


def _norm_d8(sd, prefix):
    return {"affine": _scale_d8(sd, f"{prefix}.scaling", with_bias=True)}


def _layer_norm(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _dense(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _octic_block(sd, p, style: str):
    """style: 'deit' (gamma_1/gamma_2 AffineD8) or 'dinov2' (ls1/ls2)."""
    g1 = f"{p}.gamma_1" if style == "deit" else f"{p}.ls1"
    g2 = f"{p}.gamma_2" if style == "deit" else f"{p}.ls2"
    return {
        "norm1": _norm_d8(sd, f"{p}.norm1"),
        "norm2": _norm_d8(sd, f"{p}.norm2"),
        "attn": {
            "qkv": _linear_d8(sd, f"{p}.attn.qkv", True),
            "proj": _linear_d8(sd, f"{p}.attn.proj", True),
        },
        "mlp": {
            "fc1": _linear_d8(sd, f"{p}.mlp.fc1", True),
            "fc2": _linear_d8(sd, f"{p}.mlp.fc2", True),
        },
        "ls1": _scale_d8(sd, g1),
        "ls2": _scale_d8(sd, g2),
    }


def _standard_block(sd, p):
    return {
        "norm1": _layer_norm(sd, f"{p}.norm1"),
        "norm2": _layer_norm(sd, f"{p}.norm2"),
        "attn": {
            "qkv": _dense(sd, f"{p}.attn.qkv"),
            "proj": _dense(sd, f"{p}.attn.proj"),
        },
        "mlp": {
            "fc1": _dense(sd, f"{p}.mlp.fc1"),
            "fc2": _dense(sd, f"{p}.mlp.fc2"),
        },
        "gamma_1": np.asarray(sd[f"{p}.gamma_1"])
        if f"{p}.gamma_1" in sd
        else np.asarray(sd[f"{p}.ls1.gamma"]),
        "gamma_2": np.asarray(sd[f"{p}.gamma_2"])
        if f"{p}.gamma_2" in sd
        else np.asarray(sd[f"{p}.ls2.gamma"]),
    }


def convert_octic_vit(
    state_dict: Dict[str, np.ndarray],
    depth: int,
    break_layer: Optional[int] = None,
    style: str = "deit",
) -> Dict:
    """Reference OcticVisionTransformer state_dict -> flax params dict."""
    sd = normalize_keys(state_dict)
    brk = depth // 2 if break_layer is None else break_layer
    params: Dict = {
        "pos_embed": np.stack([np.asarray(sd[f"pos_embed.{i}"]) for i in range(6)]),
        "patch_embed": {
            "w_a1": _conv(sd["patch_embed.lift8.conv_A1.weight"]),
            "w_a2": _conv(sd["patch_embed.lift8.conv_A2.weight"]),
            "w_b1": _conv(sd["patch_embed.lift8.conv_B1.weight"]),
            "w_b2": _conv(sd["patch_embed.lift8.conv_B2.weight"]),
            "w_e_left": _conv(sd["patch_embed.lift8.conv_E_left.weight"]),
            "w_e_right": _conv(sd["patch_embed.lift8.conv_E_right.weight"]),
            "bias_a1": np.asarray(sd["patch_embed.lift8.conv_A1.bias"]),
        },
        "norm": _layer_norm(sd, "norm"),
    }
    if "cls_token.0" in sd:
        params["cls_token_a1"] = np.asarray(sd["cls_token.0"])
    if "mask_token.0" in sd:
        params["mask_token_a1"] = np.asarray(sd["mask_token.0"])
    if "register_tokens.0" in sd:
        params["register_tokens_a1"] = np.asarray(sd["register_tokens.0"])
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"blocks_{i}"] = (
            _octic_block(sd, p, style) if i < brk else _standard_block(sd, p)
        )
    if "head.weight" in sd:
        params["head"] = _dense(sd, "head")
    if "invariant_proj.weight" in sd:
        params["invariant_proj"] = _dense(sd, "invariant_proj")
    return params


def _dinov2_block(sd, p):
    """DINOv2-layout standard block: ls1/ls2 LayerScale, Mlp or SwiGLU FFN
    (reference: dinov2/layers/block.py:43-130, swiglu_ffn.py:14-33)."""
    if f"{p}.mlp.w12.weight" in sd:
        mlp = {"w12": _dense(sd, f"{p}.mlp.w12"), "w3": _dense(sd, f"{p}.mlp.w3")}
    else:
        mlp = {"fc1": _dense(sd, f"{p}.mlp.fc1"), "fc2": _dense(sd, f"{p}.mlp.fc2")}
    return {
        "norm1": _layer_norm(sd, f"{p}.norm1"),
        "norm2": _layer_norm(sd, f"{p}.norm2"),
        "attn": {
            "qkv": _dense(sd, f"{p}.attn.qkv"),
            "proj": _dense(sd, f"{p}.attn.proj"),
        },
        "mlp": mlp,
        "gamma_1": np.asarray(sd[f"{p}.ls1.gamma"]),
        "gamma_2": np.asarray(sd[f"{p}.ls2.gamma"]),
    }


def convert_dinov2_vit(state_dict: Dict[str, np.ndarray], depth: int) -> Dict:
    """Upstream DINOv2 `DinoVisionTransformer` state_dict -> flax params
    (reference: dinov2/models/vision_transformer.py:57-165; hub checkpoints
    from dinov2/hub/backbones.py). Handles ±register tokens and the
    giant's fused-SwiGLU FFN."""
    sd = normalize_keys(state_dict)
    params: Dict = {
        "cls_token": np.asarray(sd["cls_token"]),
        "pos_embed": np.asarray(sd["pos_embed"]),
        "mask_token": np.asarray(sd["mask_token"]),
        "patch_embed": {"proj": {
            "kernel": _conv(sd["patch_embed.proj.weight"]).reshape(
                -1, sd["patch_embed.proj.weight"].shape[0]
            ),
            "bias": np.asarray(sd["patch_embed.proj.bias"]),
        }},
        "norm": _layer_norm(sd, "norm"),
    }
    if "register_tokens" in sd:
        params["register_tokens"] = np.asarray(sd["register_tokens"])
    for i in range(depth):
        params[f"blocks_{i}"] = _dinov2_block(sd, f"blocks.{i}")
    return params


def convert_linear_head(state_dict: Dict[str, np.ndarray]) -> Dict:
    """Upstream linear-classifier head `{weight, bias}` -> flax Dense params
    (reference: dinov2/hub/classifiers.py:20-50)."""
    sd = normalize_keys(state_dict)
    key = "linear_head." if "linear_head.weight" in sd else ""
    return {
        "kernel": _t(sd[f"{key}weight"]),
        "bias": np.asarray(sd[f"{key}bias"]),
    }


def convert_standard_vit(state_dict: Dict[str, np.ndarray], depth: int) -> Dict:
    """Reference deit/vit.py `vit_models` state_dict -> flax params."""
    sd = normalize_keys(state_dict)
    params: Dict = {
        "pos_embed": np.asarray(sd["pos_embed"]),
        "cls_token": np.asarray(sd["cls_token"]),
        "patch_embed": {"proj": {
            "kernel": _conv(sd["patch_embed.proj.weight"]).reshape(-1, sd["patch_embed.proj.weight"].shape[0]),
            "bias": np.asarray(sd["patch_embed.proj.bias"]),
        }},
        "norm": _layer_norm(sd, "norm"),
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _standard_block(sd, f"blocks.{i}")
    if "head.weight" in sd:
        params["head"] = _dense(sd, "head")
    return params


def _conv_head(sd, prefix, bias=True):
    out = {"kernel": _conv(sd[prefix + ".weight"])}
    if bias:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def convert_depth_head(state_dict: Dict[str, np.ndarray]) -> Dict:
    """Released depth-head state_dict -> flax params for models/depth.py.

    Accepts both head kinds (reference: dinov2/hub/depthers.py:131-138,
    220-226 load `*_linear{,4}_head.pth` / `*_dpt_head.pth` into
    `decode_head.*` of a DepthEncoderDecoder):
    * BNHead:   decode_head.conv_depth.{weight,bias}  (1x1 conv)
    * DPTHead:  reassemble/fusion/project/conv_depth.head tree
      (reference: dinov2/hub/depth/decode_heads.py:528-747)

    The ConvTranspose2d reassemble upsamplers ([I, O, s, s]) convert to
    BlockExpand kernels [s, s, I, O] — exact for kernel == stride."""
    sd = {
        (k[len("decode_head."):] if k.startswith("decode_head.") else k):
            np.asarray(v)
        for k, v in state_dict.items()
        if not k.startswith("backbone.")
    }
    if "reassemble_blocks.projects.0.conv.weight" not in sd:
        # BNHead: just the 1x1 classification-regression conv
        return {"conv_depth": _conv_head(sd, "conv_depth")}

    reassemble: Dict = {}
    for i in range(4):
        w = sd[f"reassemble_blocks.readout_projects.{i}.0.weight"]
        reassemble[f"readout_{i}"] = {
            "kernel": _t(w),
            "bias": np.asarray(
                sd[f"reassemble_blocks.readout_projects.{i}.0.bias"]
            ),
        }
        reassemble[f"project_{i}"] = _conv_head(
            sd, f"reassemble_blocks.projects.{i}.conv"
        )
    for i in (0, 1):
        w = sd[f"reassemble_blocks.resize_layers.{i}.weight"]
        reassemble[f"resize_{i}"] = {
            "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))),
            "bias": np.asarray(sd[f"reassemble_blocks.resize_layers.{i}.bias"]),
        }
    reassemble["resize_3"] = _conv_head(sd, "reassemble_blocks.resize_layers.3")

    params: Dict = {"reassemble": reassemble}
    for i in range(4):
        params[f"conv_{i}"] = _conv_head(sd, f"convs.{i}.conv", bias=False)
    for i in range(4):
        fb: Dict = {
            "project": _conv_head(sd, f"fusion_blocks.{i}.project.conv"),
            "res_conv_unit2": {
                "conv1": _conv_head(
                    sd, f"fusion_blocks.{i}.res_conv_unit2.conv1.conv",
                    bias=False),
                "conv2": _conv_head(
                    sd, f"fusion_blocks.{i}.res_conv_unit2.conv2.conv",
                    bias=False),
            },
        }
        if i > 0:
            fb["res_conv_unit1"] = {
                "conv1": _conv_head(
                    sd, f"fusion_blocks.{i}.res_conv_unit1.conv1.conv",
                    bias=False),
                "conv2": _conv_head(
                    sd, f"fusion_blocks.{i}.res_conv_unit1.conv2.conv",
                    bias=False),
            }
        params[f"fusion_{i}"] = fb
    params["project"] = _conv_head(sd, "project.conv")
    for flax_name, idx in (("head_conv1", 0), ("head_conv2", 2),
                           ("head_conv3", 4)):
        params[flax_name] = _conv_head(sd, f"conv_depth.head.{idx}")
    return params
