"""Standard (non-equivariant) ViT layers for the baselines and for the
standard half of hybrid octic models.

Covers the reference's DeiT III blocks (reference: deit/vit.py:14-134) and
DINOv2 blocks (reference: dinov2/layers/*): pre-norm attention/MLP with
optional LayerScale and stochastic depth, SwiGLU FFN option, and a plain
patch embed lowered to patchify+matmul.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

Array = jnp.ndarray


def _trunc_normal(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class Mlp(nn.Module):
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    use_bias: bool = True
    drop: float = 0.0
    use_pallas: bool = False  # fused fc1+GELU kernel (hidden stays in VMEM)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        in_features = x.shape[-1]
        hidden = self.hidden_features or in_features
        out = self.out_features or in_features
        dense = lambda f, name: nn.Dense(
            f,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=_trunc_normal(0.02),
            name=name,
        )
        if self.use_pallas:
            from octic_vits_tpu.ops.pallas_dense import dense_gelu

            dt = self.dtype or x.dtype
            fc1 = nn.Dense(
                hidden, use_bias=self.use_bias, dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=_trunc_normal(0.02), name="fc1",
            )
            # materialize fc1's params with a dummy call, then run fused
            fc1(jnp.zeros((1, 1, in_features), x.dtype))
            p = self.get_variable("params", "fc1")
            b = p.get("bias") if self.use_bias else None
            x = dense_gelu(
                x.astype(dt), p["kernel"].astype(dt),
                None if b is None else b.astype(dt),
            )
        else:
            x = dense(hidden, "fc1")(x)
            x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic)
        x = dense(out, "fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic)
        return x


class SwiGLUFFN(nn.Module):
    """SwiGLU FFN (DINOv2 option; reference: dinov2/layers/swiglu_ffn.py)."""

    hidden_features: Optional[int] = None
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        in_features = x.shape[-1]
        hidden = self.hidden_features or in_features
        # reference aligns hidden to 2/3 * 4d rounded to multiples of 8
        hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
        dense = lambda f, name: nn.Dense(
            f,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=_trunc_normal(0.02),
            name=name,
        )
        x12 = dense(2 * hidden, "w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return dense(in_features, "w3")(jax.nn.silu(x1) * x2)


class Attention(nn.Module):
    """Standard MHA (reference: deit/vit.py:14-55, dinov2/layers/attention.py)."""

    num_heads: int = 8
    qkv_bias: bool = False
    proj_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas_attention: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        b, n, c = x.shape
        h = self.num_heads
        dense = lambda f, bias, name: nn.Dense(
            f,
            use_bias=bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=_trunc_normal(0.02),
            name=name,
        )
        if self.use_pallas_attention and not (
            self.attn_drop > 0.0 and not deterministic
        ):
            from octic_vits_tpu.ops.pallas_attention import standard_attention

            qkv_flat = dense(3 * c, self.qkv_bias, "qkv")(x)
            # saved under the selective remat policy (scan_blocks.py):
            # with qkv saved, the custom_vjp residuals come for free in the
            # bwd replay and the fwd kernel call is dead code — the remat
            # would otherwise RE-RUN the attention kernel (~0.35 ms/block)
            # just to rebuild its residuals
            qkv_flat = _checkpoint_name(qkv_flat, "attn_in")
            out = standard_attention(qkv_flat, h)
            # recomputing the kernel in bwd costs more than the 21 MB save
            out = _checkpoint_name(out, "attn_out")
            out = dense(c, self.proj_bias, "proj")(out)
            return nn.Dropout(self.proj_drop)(out, deterministic)

        qkv = dense(3 * c, self.qkv_bias, "qkv")(x).reshape(b, n, 3, h, c // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # BTNH
        # einsum attention with fp32 softmax measures faster than
        # jax.nn.dot_product_attention on v5e at ViT sequence lengths
        scale = (c // h) ** -0.5
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        if self.attn_drop > 0.0 and not deterministic:
            probs = nn.Dropout(rate=self.attn_drop, deterministic=False)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)
        out = out.reshape(b, n, c)
        out = dense(c, self.proj_bias, "proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic)
        return out


def drop_path(x: Array, rate: float, rng, scale_by_keep: bool = True) -> Array:
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    if keep > 0.0 and scale_by_keep:
        mask = mask / keep
    return x * mask


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.rate == 0.0 or deterministic:
            return x
        return drop_path(x, self.rate, self.make_rng("dropout"))


class Block(nn.Module):
    """Pre-norm transformer block with optional LayerScale.

    `layerscale_init=1e-4` reproduces the DeiT III Layer_scale_init_Block
    (reference: deit/vit.py:90-134); DINOv2 blocks use 1e-5
    (reference: dinov2/layers/block.py:43-103). `layerscale_init=None`
    disables LayerScale (vanilla timm block)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    proj_bias: bool = True
    ffn_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    layerscale_init: Optional[float] = 1e-4
    norm_eps: float = 1e-6
    ffn_layer: str = "mlp"
    use_pallas_attention: bool = False
    use_pallas_mlp: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        dim = x.shape[-1]
        norm = lambda name: nn.LayerNorm(
            epsilon=self.norm_eps, param_dtype=self.param_dtype, name=name
        )

        def scale(y, name):
            if self.layerscale_init is None:
                return y
            gamma = self.param(
                name,
                nn.initializers.constant(self.layerscale_init),
                (dim,),
                self.param_dtype,
            )
            return gamma.astype(y.dtype) * y

        y = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            proj_bias=self.proj_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            use_pallas_attention=self.use_pallas_attention,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(norm("norm1")(x), deterministic)
        y = DropPath(self.drop_path, name="drop_path1")(scale(y, "gamma_1"), deterministic)
        x = x + y

        if self.ffn_layer == "swiglu":
            ffn = SwiGLUFFN(
                hidden_features=int(dim * self.mlp_ratio),
                use_bias=self.ffn_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="mlp",
            )
        else:
            ffn = Mlp(
                hidden_features=int(dim * self.mlp_ratio),
                use_bias=self.ffn_bias,
                drop=self.drop,
                use_pallas=self.use_pallas_mlp,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="mlp",
            )
        y = ffn(norm("norm2")(x), deterministic)
        y = DropPath(self.drop_path, name="drop_path2")(scale(y, "gamma_2"), deterministic)
        return x + y


class HMLPStem(nn.Module):
    """hMLP stem: 3-stage patchify-MLP with norms (reference:
    deit/vit.py:227-254 — 4x4, 2x2, 2x2 strided convs == staged patchify
    matmuls), ending at patch_size=16 tokens."""

    embed_dim: int = 768
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from octic_vits_tpu.layers.d8_layers import _patchify

        b = x.shape[0]
        dims = (self.embed_dim // 4, self.embed_dim // 4, self.embed_dim)
        strides = (4, 2, 2)
        for i, (d, s) in enumerate(zip(dims, strides)):
            bb, h, w, c = x.shape
            patches = _patchify(x, s)
            x = nn.Dense(
                d, dtype=self.dtype, param_dtype=self.param_dtype,
                kernel_init=_trunc_normal(0.02), name=f"proj{i}",
            )(patches)
            x = nn.LayerNorm(
                epsilon=1e-6, param_dtype=self.param_dtype, name=f"norm{i}"
            )(x)
            if i < 2:
                x = jax.nn.gelu(x, approximate=False)
            x = x.reshape(b, h // s, w // s, d)
        return x.reshape(b, -1, self.embed_dim)


class ParallelBlockx2(nn.Module):
    """DeiT III parallel-branch block: two attention branches then two MLP
    branches added to the residual stream
    (reference: deit/vit.py:136-224, Layer_scale_init_Block_paralx2)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    layerscale_init: float = 1e-4
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        dim = x.shape[-1]

        def branch(tag):
            y = nn.LayerNorm(
                epsilon=1e-6, param_dtype=self.param_dtype, name=f"norm1_{tag}"
            )(x)
            y = Attention(
                num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                attn_drop=self.attn_drop, proj_drop=self.drop,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"attn_{tag}",
            )(y, deterministic)
            gamma = self.param(
                f"gamma_1_{tag}", nn.initializers.constant(self.layerscale_init),
                (dim,), self.param_dtype,
            )
            return gamma.astype(y.dtype) * y

        x = x + DropPath(self.drop_path, name="dp_a1")(branch("a"), deterministic) \
              + DropPath(self.drop_path, name="dp_a2")(branch("b"), deterministic)

        def mlp_branch(tag, z):
            y = nn.LayerNorm(
                epsilon=1e-6, param_dtype=self.param_dtype, name=f"norm2_{tag}"
            )(z)
            y = Mlp(
                hidden_features=int(dim * self.mlp_ratio), drop=self.drop,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"mlp_{tag}",
            )(y, deterministic)
            gamma = self.param(
                f"gamma_2_{tag}", nn.initializers.constant(self.layerscale_init),
                (dim,), self.param_dtype,
            )
            return gamma.astype(y.dtype) * y

        return x + DropPath(self.drop_path, name="dp_m1")(
            mlp_branch("a", x), deterministic
        ) + DropPath(self.drop_path, name="dp_m2")(mlp_branch("b", x), deterministic)


class PatchEmbed(nn.Module):
    """Standard patch embed as patchify + matmul (stride == kernel)."""

    patch_size: int = 16
    embed_dim: int = 768
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from octic_vits_tpu.layers.d8_layers import _patchify

        b, h, w, c = x.shape
        p = self.patch_size
        patches = _patchify(x, p)
        out = nn.Dense(
            self.embed_dim,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=_trunc_normal(0.02),
            name="proj",
        )(patches)
        return out.reshape(b, (h // p) * (w // p), self.embed_dim)
