"""Test configuration: force an 8-device virtual CPU platform.

The session environment pre-imports jax via a sitecustomize hook that pins
jax_platforms to the single real TPU chip. Unit tests must instead run on a
virtual 8-device CPU mesh (mirroring how the driver dry-runs the multi-chip
path), so we (re)set XLA_FLAGS before the CPU client exists and flip
jax_platforms back to cpu in-process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
