"""DINO projection head (reference: dinov2/layers/dino_head.py:12-58).

3-layer MLP -> L2-normalize -> weight-normalized prototype layer (65536
prototypes in the paper configs). The weight-norm `g` is initialized to 1
and kept trainable (cfg `norm_last_layer=False` path in the reference).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _trunc_normal(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class WeightNormDense(nn.Module):
    """Dense layer with weight normalization: W = g * V / ||V||_row."""

    features: int
    param_dtype: Any = jnp.float32
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        v = self.param("v", _trunc_normal(0.02), (in_dim, self.features), self.param_dtype)
        g = self.param("g", nn.initializers.ones, (self.features,), self.param_dtype)
        norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + 1e-12)
        w = v / norm * g[None, :]
        dtype = self.dtype or x.dtype
        return jnp.dot(x, w.astype(dtype), preferred_element_type=dtype)


class DINOHead(nn.Module):
    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    nlayers: int = 3
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dense = lambda f, name: nn.Dense(
            f, use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=_trunc_normal(0.02),
            name=name,
        )
        n = max(self.nlayers, 1)
        if n == 1:
            x = dense(self.bottleneck_dim, "mlp_0")(x)
        else:
            x = dense(self.hidden_dim, "mlp_0")(x)
            x = jax.nn.gelu(x, approximate=False)
            for i in range(n - 2):
                x = dense(self.hidden_dim, f"mlp_{i+1}")(x)
                x = jax.nn.gelu(x, approximate=False)
            x = dense(self.bottleneck_dim, f"mlp_{n-1}")(x)
        eps = 1e-6 if x.dtype == jnp.float16 else 1e-12
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)
        return WeightNormDense(
            self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="last_layer",
        )(x)
