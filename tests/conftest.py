"""Test configuration: run on CPU with 8 virtual devices so the
multi-chip sharding paths can be exercised without TPU hardware.

(The environment pins JAX_PLATFORMS to the TPU plugin; override it
before any backend initialization.)"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
