"""Test config: force an 8-device virtual CPU mesh.

This is the TPU-native answer to multi-device testing without a pod
(SURVEY.md §4): XLA hosts N virtual CPU devices and every sharding /
collective path runs exactly as it would across chips.

Note: the environment's sitecustomize imports jax at interpreter boot with
JAX_PLATFORMS=axon, so plain env vars are too late here — we must go through
jax.config (and XLA_FLAGS, which is still unread until first backend init).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the suite is compile-dominated (tiny shapes,
# hundreds of distinct programs); reruns on the same machine skip straight
# to execution. CPU-specific dir — TPU-service entries don't mix in.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
