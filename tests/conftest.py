"""Test harness: run everything on CPU with 8 virtual devices.

Pallas kernels run in interpreter mode off-TPU (raster/pipeline.py picks this
up automatically); the 8-device virtual mesh exercises the multi-chip
sharding path without hardware. Note: JAX_PLATFORMS as an env var is
overridden by the axon plugin in this environment, so we force cpu through
jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
