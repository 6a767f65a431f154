"""Checkpoint save/restore round-trips (orbax) and preemption-style resume."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

pytestmark = pytest.mark.slow  # heavyweight lane; quick lane: -m "not slow"


from octic_vits_tpu.train.common import TrainState, create_train_state
from octic_vits_tpu.utils.checkpoint import (
    CheckpointManager,
    load_teacher,
    save_teacher,
)


def _tiny_state():
    params = {
        "w": jnp.arange(12.0).reshape(3, 4),
        "nested": {"b": jnp.ones((4,))},
    }
    tx = optax.sgd(0.1)
    return create_train_state(params, tx, ema=True)


def test_manager_roundtrip(tmp_path):
    state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(1, jax.device_get(state), force=True)
    mgr.save(5, jax.device_get(state._replace(step=jnp.asarray(5))), force=True)
    mgr.wait()
    assert mgr.latest_step() == 5
    restored = mgr.restore(jax.device_get(state))
    assert int(restored.step) == 5
    np.testing.assert_allclose(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )
    mgr.close()


def test_keep_n_rotation(tmp_path):
    state = jax.device_get(_tiny_state())
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for s in [1, 2, 3, 4]:
        mgr.save(s, state._replace(step=jnp.asarray(s)), force=True)
    mgr.wait()
    assert mgr.latest_step() == 4
    restored = mgr.restore(state, step=3)
    assert int(restored.step) == 3
    mgr.close()


def test_teacher_export_roundtrip(tmp_path):
    teacher = {"backbone": {"k": np.arange(6.0).reshape(2, 3)}}
    path = save_teacher(str(tmp_path), 100, teacher)
    loaded = load_teacher(path, teacher)
    np.testing.assert_allclose(loaded["backbone"]["k"], teacher["backbone"]["k"])


def test_ssl_state_roundtrip(tmp_path):
    import tests.test_ssl_training as tst
    from octic_vits_tpu.train.dinov2.ssl_meta_arch import SSLMetaArch

    arch = SSLMetaArch(tst.tiny_cfg())
    state = arch.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, jax.device_get(state._replace(step=jnp.asarray(7))), force=True)
    mgr.wait()
    restored = mgr.restore(jax.device_get(state))
    assert int(restored.step) == 7
    a = jax.tree.leaves(state.student)[0]
    b = jax.tree.leaves(restored.student)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    mgr.close()
