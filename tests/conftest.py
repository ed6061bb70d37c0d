"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip shardings are validated
without TPU hardware) with float64 enabled so golden-value tests
(preintegration covariance parity with the reference's
test/preintegration_ut.cpp) can meet double-precision tolerances.

Note: this environment force-registers the `axon` TPU platform regardless of
JAX_PLATFORMS, so the platform must be overridden via jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# persistent XLA compile cache for the CPU suite: each test builds fresh
# Frontend/matcher instances whose jitted programs re-trace per instance,
# and cold CPU+x64 compiles dominate the ~17 min suite wall time; a
# dedicated on-disk cache (separate from the TPU bench cache) makes reruns
# hit compiled programs whenever the traced code didn't change
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cpu_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
