"""Test env: force CPU backend with 8 fake devices BEFORE jax import.

This is the standard JAX fake-backend idiom for testing multi-device
sharding without a TPU slice (SURVEY.md §4.4). All tests run on CPU; the
real-chip paths are exercised by bench.py / __graft_entry__.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Something in this image's site config pins JAX_PLATFORMS=axon (the TPU
# tunnel plugin) regardless of the env var, so pin the platform explicitly
# too — must happen before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
