"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware) with float64 enabled so golden-value comparisons against
the sympy/scipy oracles are meaningful.
"""

import os

# Force CPU even when a TPU plugin environment (JAX_PLATFORMS=axon) is baked
# into the image: the env var alone is not enough because the site hook may
# already have registered the plugin, so also set the config explicitly.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
