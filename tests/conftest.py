"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path is
exercised without TPU hardware (SURVEY.md §4(e)). The TPU PJRT plugin in this
image pins JAX_PLATFORMS at interpreter startup, so the env var alone is not
enough — ``jax.config.update("jax_platforms", ...)`` is authoritative and
must run before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
