"""The einsum-native AttentionD8 must match a direct port of the reference
per-head interleave computation (reference: octic_vits/d8_layers.py:623-656)
on the same parameters."""

import jax
import jax.numpy as jnp
import numpy as np

from octic_vits_tpu.d8 import pack_8_to_5
from octic_vits_tpu.layers.d8_layers import AttentionD8, LinearD8


def reference_attention(params, xs, num_heads):
    """Interleaved-head attention exactly as the reference builds it."""
    b, n, c8 = xs[0].shape
    c = 8 * c8
    h = num_heads
    d1 = c // (8 * h)
    de = c // (4 * h)

    qkv = LinearD8(3 * c)
    qkvs = qkv.apply({"params": params["qkv"]}, xs)
    parts = [t.reshape(b, n, 3, h, d1) for t in qkvs[:4]]
    e_part = qkvs[4].reshape(b, n, 2, 3, h, de)
    e_part = e_part.transpose(0, 1, 3, 4, 2, 5).reshape(b, n, 3, h, 2 * de)
    packed = jnp.concatenate(parts + [e_part], axis=-1)  # [B,N,3,H,dh]
    q, k, v = packed[:, :, 0], packed[:, :, 1], packed[:, :, 2]

    scale = (c // h) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, -1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    x1, x2 = jnp.split(out, [4 * d1], axis=-1)
    outs1 = tuple(t.reshape(b, n, c8) for t in jnp.split(x1, 4, axis=-1))
    xe = x2.reshape(b, n, h, 2, de).transpose(0, 1, 3, 2, 4).reshape(b, n, 2, c // 4)
    proj = LinearD8(c)
    return proj.apply({"params": params["proj"]}, outs1 + (xe,))


def test_einsum_native_matches_reference_interleave():
    b, n, c8, heads = 2, 7, 16, 4  # C=128, dh=32
    xs = pack_8_to_5(tuple(
        jax.random.normal(jax.random.PRNGKey(i), (b, n, c8)) for i in range(8)
    ))
    attn = AttentionD8(num_heads=heads, qkv_bias=True)
    variables = attn.init(jax.random.PRNGKey(99), xs)
    ours = attn.apply(variables, xs)
    ref = reference_attention(variables["params"], xs, heads)
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(ours[i]), np.asarray(ref[i]), atol=1e-5,
            err_msg=f"slot {i}",
        )
