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

pytestmark = pytest.mark.slow  # heavyweight lane; quick lane: -m "not slow"


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


def test_standard_h16_ssl_step_zero3():
    """The REAL standard ViT-H/16 (632M params) takes a full SSL train step
    under ZeRO-3 (`shard_params=True`) on the 8-device mesh.

    Two-sided completion of the BENCH.md single-chip memory result (the
    standard H/16 OOMs on one 16G chip, reference comparator:
    dinov2/fsdp/__init__.py FULL_SHARD): sharded, the framework runs it.
    Tiny image shapes keep the FLOPs CPU-friendly; the parameter tree is
    the full H/16.
    """
    import random as pyrandom

    from octic_vits_tpu.train.dinov2.masking import (
        MaskingGenerator, collate_crops_and_masks,
    )
    from octic_vits_tpu.train.dinov2.ssl_meta_arch import (
        SSLConfig, SSLMetaArch,
    )

    mesh = create_mesh(fsdp=4)
    cfg = SSLConfig(
        arch="dinov2_vit_huge_patch16",
        img_size=32, local_crop_size=16, patch_size=16,
        drop_path_rate=0.0, n_local_crops=2,
        dino_out_dim=1024, ibot_out_dim=1024,
        compute_dtype=jnp.float32,
        backbone_scan=True,
    )
    arch = SSLMetaArch(cfg)
    # init jitted straight into the ZeRO-3 layout (unjitted 632M threefry
    # takes minutes on one CPU core, and replicated-first doubles host mem)
    state_shape = jax.eval_shape(arch.init, jax.random.PRNGKey(0))
    state_sh = arch.state_shardings(state_shape, mesh, shard_params=True)
    state = jax.jit(arch.init, out_shardings=state_sh)(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(state.student["backbone"]))
    assert n_params > 600e6, "not the real ViT-H/16"
    # fsdp-sharded leaves must actually be split
    leaf = state.student["backbone"]["blocks"]["block"]["mlp"]["fc1"]["kernel"]
    assert leaf.addressable_shards[0].data.shape != leaf.shape

    b = 4  # 2*b global crops must divide the 8-device (data x fsdp) batch axes
    rng = pyrandom.Random(0)
    npr = np.random.RandomState(0)
    n_tokens = (cfg.img_size // cfg.patch_size) ** 2
    gen = MaskingGenerator(cfg.img_size // cfg.patch_size,
                           num_masking_patches=n_tokens // 2)
    batch = collate_crops_and_masks(
        npr.randn(2 * b, 32, 32, 3).astype(np.float32),
        npr.randn(2 * b, 16, 16, 3).astype(np.float32),
        n_tokens, gen, rng=rng,
    )
    batch_sh = arch.batch_shardings(mesh)
    batch = {k: jax.device_put(jnp.asarray(v), batch_sh[k])
             for k, v in batch.items()}
    sched = {"lr": 1e-4, "wd": 0.04, "last_layer_lr": 0.0,
             "momentum": 0.992, "teacher_temp": 0.04}
    step = jax.jit(arch.make_train_step(mesh=mesh, state_sh=state_sh),
                   in_shardings=(state_sh, batch_sh, None, None),
                   out_shardings=(state_sh, None),
                   donate_argnums=(0,))
    state, metrics = step(state, batch, sched, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1


def test_create_hybrid_mesh_single_slice_fallback():
    """On hosts without multi-slice topology the DCN-aware mesh equals the
    plain (data, fsdp) mesh; fsdp must divide a slice."""
    from octic_vits_tpu.parallel.mesh import create_hybrid_mesh, create_mesh

    mesh = create_hybrid_mesh(fsdp=2)
    ref = create_mesh(jax.devices(), fsdp=2)
    assert mesh.shape == ref.shape
    assert mesh.axis_names == ("data", "fsdp")
