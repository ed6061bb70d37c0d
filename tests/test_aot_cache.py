"""aot_jit wrapper correctness (utils/aot_cache.py): jit-equivalent
results, static-kwarg baking, per-signature isolation, disk round-trip,
and the disabled/fallback paths. Runs on the CPU backend — executable
serialization works there too, just with CPU binaries."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funny_lidar_slam_tpu.utils import aot_cache


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("FLS_AOT_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("FLS_AOT_CACHE", "1")
    return tmp_path


def test_matches_jit_and_writes_cache(cache_dir):
    calls = []

    def f(x, y):
        calls.append(1)
        return x * 2.0 + y.sum()

    g = aot_cache.aot_jit(f)
    x = jnp.arange(8.0)
    y = jnp.ones((3,))
    np.testing.assert_allclose(np.asarray(g(x, y)),
                               np.asarray(jax.jit(f)(x, y)))
    # repeated calls reuse the loaded executable (no retrace)
    n = len(calls)
    g(x, y)
    g(x, y)
    assert len(calls) == n
    assert any(p.endswith(".jaxexe") for p in os.listdir(cache_dir))


def test_static_kwargs_baked(cache_dir):
    def f(x, n):
        return x * n

    g = aot_cache.aot_jit(f, static_argnames=("n",))
    x = jnp.ones(4)
    np.testing.assert_allclose(np.asarray(g(x, n=3)), 3.0)
    np.testing.assert_allclose(np.asarray(g(x, n=5)), 5.0)  # distinct exe
    np.testing.assert_allclose(np.asarray(g(x, n=3)), 3.0)  # cached


def test_shape_signatures_isolated(cache_dir):
    def f(x):
        return x.sum()

    g = aot_cache.aot_jit(f)
    assert float(g(jnp.ones(4))) == 4.0
    assert float(g(jnp.ones(8))) == 8.0
    assert float(g(jnp.ones(4))) == 4.0


def test_pytree_and_dtype_in_key(cache_dir):
    def f(d):
        return d["a"] + d["b"]

    g = aot_cache.aot_jit(f)
    out = g({"a": jnp.ones(3), "b": jnp.full(3, 2.0)})
    np.testing.assert_allclose(np.asarray(out), 3.0)
    out_i = g({"a": jnp.ones(3, jnp.int32), "b": jnp.full(3, 2, jnp.int32)})
    assert out_i.dtype == jnp.int32


def test_disk_roundtrip_fresh_wrapper(cache_dir):
    """A NEW wrapper over the same function must hit the on-disk
    executable (the fresh-process scenario)."""
    def f(x):
        return jnp.sin(x) * 2.0

    x = jnp.linspace(0, 1, 16)
    a = aot_cache.aot_jit(f)
    expect = np.asarray(a(x))
    n_files = len([p for p in os.listdir(cache_dir) if p.endswith(".jaxexe")])
    assert n_files >= 1
    aot_cache._GLOBAL_EXES.clear()  # simulate a fresh process
    b = aot_cache.aot_jit(f)
    np.testing.assert_allclose(np.asarray(b(x)), expect)
    # no new cache entry: the disk executable was served
    assert len([p for p in os.listdir(cache_dir)
                if p.endswith(".jaxexe")]) == n_files


def test_disabled_falls_back(cache_dir, monkeypatch):
    monkeypatch.setenv("FLS_AOT_CACHE", "0")

    def f(x):
        return x + 1

    g = aot_cache.aot_jit(f)
    assert float(g(jnp.zeros(1))[0]) == 1.0
    assert not any(p.endswith(".jaxexe") for p in os.listdir(cache_dir))
