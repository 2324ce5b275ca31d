"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware) with float64 enabled so golden-value comparisons against
the sympy/scipy oracles are meaningful.
"""

import os

# TPU hardware lane (VERDICT r3 #9): MMMPC_TPU_TESTS=1 keeps the real TPU
# backend so `pytest -m tpu` re-runs the kernel parity tests with
# INTERPRET=False on hardware — interpreter parity cannot mask a Mosaic
# lowering difference.  Invocation (see README):
#     MMMPC_TPU_TESTS=1 python -m pytest -m tpu tests/
# Everything else runs on the virtual 8-device CPU mesh with float64.
TPU_LANE = os.environ.get("MMMPC_TPU_TESTS") == "1"

if not TPU_LANE:
    # Force CPU even when a TPU plugin environment (JAX_PLATFORMS=axon) is
    # baked into the image: the env var alone is not enough because the site
    # hook may already have registered the plugin, so also set the config
    # explicitly.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
