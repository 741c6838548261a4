"""Test harness: force CPU with an 8-device virtual mesh so sharding logic is
testable without TPU hardware (SURVEY §4 — the JAX analog of a fake backend).

Note: this environment's sitecustomize registers a TPU PJRT plugin and pins
JAX_PLATFORMS at interpreter start, so plain env vars are not enough — we must
override via jax.config after import but before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu"
