"""Parity tests for the fused Pallas D8 LayerNorm-stats kernel
(ops/pallas_ln.py) against the eager flat-E tuple path
(layers/d8_layers.py:_tuple_ln_fwd_impl) — values and analytic grads.
Reference formula: octic_vits/d8_layers.py:161-186."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octic_vits_tpu.layers.d8_layers import _tuple_ln_fwd_impl
from octic_vits_tpu.ops.pallas_ln import ln_d8_flat_tuple

EPS = 1e-5


def _rand_tuple(key, b, n, c8, dtype):
    ks = jax.random.split(key, 5)
    mk = lambda k, w: (
        2.0 * jax.random.normal(k, (b, n, w), jnp.float32) + 0.7
    ).astype(dtype)
    return tuple(mk(ks[i], c8) for i in range(4)) + (mk(ks[4], 4 * c8),)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-6), (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("c8", [64, 160])
def test_ln_kernel_fwd_parity(dtype, tol, c8):
    xs = _rand_tuple(jax.random.PRNGKey(0), 2, 33, c8, dtype)
    got = ln_d8_flat_tuple(xs, EPS)
    want, _ = _tuple_ln_fwd_impl(xs, EPS)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            atol=tol, rtol=tol)


def test_ln_kernel_grad_parity_f32():
    xs = _rand_tuple(jax.random.PRNGKey(1), 2, 17, 64, jnp.float32)
    us = _rand_tuple(jax.random.PRNGKey(2), 2, 17, 64, jnp.float32)

    def loss_k(xs):
        ys = ln_d8_flat_tuple(xs, EPS)
        return sum(jnp.sum(y * u) for y, u in zip(ys, us))

    def loss_e(xs):
        ys, _ = _tuple_ln_fwd_impl(xs, EPS)
        return sum(jnp.sum(y * u) for y, u in zip(ys, us))

    gk = jax.grad(loss_k)(xs)
    ge = jax.grad(loss_e)(xs)
    for a, b in zip(gk, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_ln_kernel_grad_parity_bf16():
    xs = _rand_tuple(jax.random.PRNGKey(3), 1, 9, 64, jnp.bfloat16)

    def loss_k(xs):
        return sum(jnp.sum(y.astype(jnp.float32) ** 2)
                   for y in ln_d8_flat_tuple(xs, EPS))

    def loss_e(xs):
        return sum(jnp.sum(y.astype(jnp.float32) ** 2)
                   for y in _tuple_ln_fwd_impl(xs, EPS)[0])

    gk = jax.grad(loss_k)(xs)
    ge = jax.grad(loss_e)(xs)
    for a, b in zip(gk, ge):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.15, rtol=0.1)


def test_ln_affine_fused_fwd_and_grads():
    """Fused LN+affine kernel == eager stats + ScaleD8 (values + grads for
    x, alpha, alpha_e, beta)."""
    from octic_vits_tpu.ops.pallas_ln import ln_affine_d8_flat_tuple

    c8 = 64
    xs = _rand_tuple(jax.random.PRNGKey(6), 2, 19, c8, jnp.float32)
    us = _rand_tuple(jax.random.PRNGKey(7), 2, 19, c8, jnp.float32)
    kk = jax.random.split(jax.random.PRNGKey(8), 3)
    al = jax.random.normal(kk[0], (4, c8), jnp.float32)
    ae_ = jax.random.normal(kk[1], (2 * c8,), jnp.float32)
    be_ = jax.random.normal(kk[2], (c8,), jnp.float32)

    def fused(xs, al, ae_, be_):
        ys = ln_affine_d8_flat_tuple(
            xs, al, jnp.concatenate((ae_, ae_))[None, :], be_[None, :], EPS)
        return sum(jnp.sum(y * u) for y, u in zip(ys, us))

    def eager(xs, al, ae_, be_):
        ns = _tuple_ln_fwd_impl(xs, EPS)[0]
        aef = jnp.concatenate((ae_, ae_))
        ys = (ns[0] * al[0] + be_, ns[1] * al[1], ns[2] * al[2],
              ns[3] * al[3], ns[4] * aef)
        return sum(jnp.sum(y * u) for y, u in zip(ys, us))

    vk, gk = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(xs, al, ae_, be_)
    ve, ge = jax.value_and_grad(eager, argnums=(0, 1, 2, 3))(xs, al, ae_, be_)
    np.testing.assert_allclose(float(vk), float(ve), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(ge)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_layernorm_module_fused_affine_routing(monkeypatch):
    """LayerNormD8(use_pallas=True) (fused affine kernel) == eager module,
    same params, incl. beta; and param tree is identical."""
    from octic_vits_tpu.layers import d8_layers
    from octic_vits_tpu.layers.d8_layers import LayerNormD8

    monkeypatch.setattr(d8_layers, "OCTIC_PALLAS_LN", True)

    xs = _rand_tuple(jax.random.PRNGKey(9), 2, 11, 64, jnp.float32)
    m_e = LayerNormD8(use_pallas=False)
    m_k = LayerNormD8(use_pallas=True)
    params = m_e.init(jax.random.PRNGKey(10), xs)
    pk = m_k.init(jax.random.PRNGKey(10), xs)
    assert jax.tree.structure(params) == jax.tree.structure(pk)
    # non-trivial affine so the fold is actually tested
    params = jax.tree.map(
        lambda p: p + 0.3 * jnp.arange(p.size, dtype=p.dtype).reshape(p.shape)
        / p.size, params)
    ye = m_e.apply(params, xs)
    yk = m_k.apply(params, xs)
    for a, b in zip(yk, ye):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_layernorm_module_pallas_routing(monkeypatch):
    """LayerNormD8(use_pallas=True, elementwise_affine=False) routes the
    stats-only kernel == eager, same params."""
    from octic_vits_tpu.layers import d8_layers
    from octic_vits_tpu.layers.d8_layers import LayerNormD8

    monkeypatch.setattr(d8_layers, "OCTIC_PALLAS_LN", True)

    xs = _rand_tuple(jax.random.PRNGKey(4), 2, 13, 64, jnp.float32)
    m_e = LayerNormD8(use_pallas=False, elementwise_affine=False)
    m_k = LayerNormD8(use_pallas=True, elementwise_affine=False)
    params = m_e.init(jax.random.PRNGKey(5), xs)
    ye = m_e.apply(params, xs)
    yk = m_k.apply(params, xs)
    for a, b in zip(yk, ye):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
