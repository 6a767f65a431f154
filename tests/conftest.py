"""Test config: run everything on CPU with 8 virtual devices.

The container's sitecustomize force-registers the 'axon' TPU platform before
any test code runs, so JAX_PLATFORMS env alone is not enough — we override
the platform via jax.config after import. XLA_FLAGS must be set before the
CPU backend initializes (it is lazy, so doing it here works).

Sharded-training tests then see a realistic 8-device mesh on a single host
(the reference has no distributed-path tests at all — SURVEY.md §4; we make
them first-class).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.device_count() == 8, jax.devices()
