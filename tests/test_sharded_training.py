"""Multi-device SPMD training tests on the 8-device CPU mesh.

The reference only exercises its distributed paths on live Slurm+NCCL jobs
(SURVEY.md §4); here sharded training is unit-tested: DP (DDP analog),
DP+ZeRO-2 (FSDP SHARD_GRAD_OP analog), and ZeRO-3 param sharding all must
produce finite, device-consistent updates.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from octic_vits_tpu.models import OcticVisionTransformer
from octic_vits_tpu.parallel import batch_sharding, create_mesh
from octic_vits_tpu.train.common import (
    TrainState,
    create_train_state,
    cross_entropy_loss,
    make_train_step,
    state_shardings,
)


def tiny_model():
    return OcticVisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        mlp_ratio=2.0, qkv_bias=True, num_classes=4,
    )


def build(mesh, shard_params=False, ema=False):
    model = tiny_model()
    img = jnp.zeros((8, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), img)
    tx = optax.adamw(1e-3)
    state = create_train_state(params, tx, ema=ema)
    state_sh = state_shardings(state, mesh, shard_params=shard_params)
    state = jax.device_put(state, state_sh)

    def apply_fn(params, images, rngs):
        return model.apply(params, images, deterministic=False, rngs=rngs)

    step = make_train_step(
        apply_fn, tx, cross_entropy_loss, mesh=mesh, state_sh=state_sh,
        ema_decay=0.99 if ema else None, grad_clip=1.0,
    )
    return state, step, state_sh


@pytest.mark.parametrize("fsdp,shard_params", [(1, False), (4, False), (4, True)])
def test_sharded_train_step(fsdp, shard_params):
    mesh = create_mesh(fsdp=fsdp)
    state, step, _ = build(mesh, shard_params=shard_params)
    imgs = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3)),
        batch_sharding(mesh),
    )
    labels = jax.device_put(
        jnp.arange(8) % 4, batch_sharding(mesh)
    )
    state, metrics = step(state, imgs, labels, jax.random.PRNGKey(2))
    state, metrics = step(state, imgs, labels, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert int(state.step) == 2


def test_dp_matches_single_device():
    """A DP-sharded step must produce the same update as single-device."""
    mesh = create_mesh(fsdp=1)
    model = tiny_model()
    img = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 4
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 32, 32, 3)))
    tx = optax.sgd(0.1)

    def apply_fn(p, x, rngs):
        return model.apply(p, x, deterministic=True)

    # single device (copy params: the step donates its input state)
    state1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    step1 = make_train_step(apply_fn, tx, cross_entropy_loss)
    new1, m1 = step1(state1, img, labels, jax.random.PRNGKey(2))

    # 8-way DP
    state8 = create_train_state(params, tx)
    sh = state_shardings(state8, mesh)
    state8 = jax.device_put(state8, sh)
    step8 = make_train_step(
        apply_fn, tx, cross_entropy_loss, mesh=mesh, state_sh=sh
    )
    new8, m8 = step8(
        state8,
        jax.device_put(img, batch_sharding(mesh)),
        jax.device_put(labels, batch_sharding(mesh)),
        jax.random.PRNGKey(2),
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    l1 = jax.tree.leaves(new1.params)
    l8 = jax.tree.leaves(new8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_ema_update():
    mesh = create_mesh(fsdp=1)
    state, step, _ = build(mesh, ema=True)
    imgs = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3)),
        batch_sharding(mesh),
    )
    labels = jax.device_put(jnp.arange(8) % 4, batch_sharding(mesh))
    before = jax.tree.leaves(state.ema_params)[0].copy()
    state, _ = step(state, imgs, labels, jax.random.PRNGKey(2))
    after = jax.tree.leaves(state.ema_params)[0]
    assert float(jnp.abs(before - after).max()) > 0


def test_create_hybrid_mesh_single_slice_fallback():
    """On hosts without multi-slice topology the DCN-aware mesh equals the
    plain (data, fsdp) mesh; fsdp must divide a slice."""
    from octic_vits_tpu.parallel.mesh import create_hybrid_mesh, create_mesh

    mesh = create_hybrid_mesh(fsdp=2)
    ref = create_mesh(jax.devices(), fsdp=2)
    assert mesh.shape == ref.shape
    assert mesh.axis_names == ("data", "fsdp")
