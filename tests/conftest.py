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

# Persistent XLA:CPU AOT cache: the suite's cost is dominated by CPU
# compiles of the frame programs (~15 min for the estimator group);
# the plain jax compilation cache stores nothing on CPU — the AOT
# result cache ("xla_caches") does, cutting repeat runs. Loading prints
# benign machine-feature E-logs (synthetic +prefer-no-scatter/gather
# flags differ from the host feature probe on the SAME machine).
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "icra20_hand_object_pose_tpu", "xla_tests"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
