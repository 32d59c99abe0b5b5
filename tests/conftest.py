"""Test harness: CPU backend with 8 virtual devices, float64 enabled.

Multi-chip sharding code is tested on the standard JAX fake-backend idiom
(xla_force_host_platform_device_count); float64 gives the oracle precision
the Julia reference gets natively (SURVEY.md section 4).

Note: the axon TPU plugin's sitecustomize forces jax_platforms="axon,cpu"
at interpreter start, so the JAX_PLATFORMS env var alone is NOT enough --
we must override the config after import (before first backend use).
Float64 transcendentals on the tunneled TPU are emulated and only ~1e-8
accurate, so oracle tests must really run on CPU.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
