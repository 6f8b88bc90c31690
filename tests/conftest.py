"""Test harness: run everything on a virtual 8-device CPU mesh.

SURVEY.md §5.5: multi-chip behavior is tested without TPUs via
xla_force_host_platform_device_count. The axon TPU plugin registers
itself via sitecustomize and ignores the JAX_PLATFORMS env var, so we
switch platforms through jax.config and drop any already-initialized
backends.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
