"""Disk cache of AOT-compiled TPU executables.

Why this exists: this platform's PJRT plugin does not implement JAX's
persistent compilation cache — a full bench run with
`JAX_COMPILATION_CACHE_DIR` set writes ZERO cache entries (verified round
5), and every cold compile of the fused frontend step runs MINUTES through
the device tunnel. Round 4 lost its entire scored benchmark to exactly this
(BENCH_r04 rc=124 before a single mode finished).

The serving-style replacement: compile once, `serialize` the PJRT
executable (jax.experimental.serialize_executable), and persist it keyed by
the sha256 of the LOWERED StableHLO text. The key is self-validating — any
change to the traced program, input shapes, dtypes, static arguments, jax
version, or device kind changes the lowered text and misses the cache, so a
stale binary can never be served. A fresh process then `deserialize_and_load`s
in ~1-2 s instead of recompiling for minutes.

Scope: wrap only TOP-LEVEL entry points (the fused frontend step programs).
Everything nested inside them is covered by their key. Tracing + lowering
still runs on a cache hit (it produces the key) — that is seconds of local
CPU, not minutes of tunnel round trips.

Disable with FLS_AOT_CACHE=0; cache dir from FLS_AOT_CACHE_DIR
(default ~/.cache/fls_aot). Any failure in the cache path silently falls
back to the plain jax.jit call.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import threading

import jax


def _enabled() -> bool:
    return os.environ.get("FLS_AOT_CACHE", "1") != "0"


def _cache_dir() -> str:
    return os.environ.get(
        "FLS_AOT_CACHE_DIR", os.path.expanduser("~/.cache/fls_aot"))


_GLOBAL_EXES: dict = {}  # sha -> loaded executable (process lifetime)


def aot_jit(fun, static_argnames: tuple = ()):
    """jax.jit with a disk-backed executable cache.

    Call-convention requirement: static arguments must be passed as KEYWORD
    arguments at every call (they are bound into the executable and omitted
    from the compiled call).
    """
    jfun = jax.jit(fun, static_argnames=static_argnames)
    loaded: dict = {}  # aval-signature -> compiled callable (dynamic args)
    lock = threading.Lock()

    def _aval_key(args, kwargs):
        # PyTreeDef is hashable: use it directly (str(treedef) on the big
        # matcher-state pytree costs ~ms per call and halved the live fps)
        dyn_leaves, treedef = jax.tree.flatten((args, {
            k: v for k, v in kwargs.items() if k not in static_argnames}))
        shapes = tuple(
            (getattr(x, "shape", ()), str(getattr(x, "dtype", type(x))))
            for x in dyn_leaves
        )
        statics = tuple(sorted(
            (k, repr(v)) for k, v in kwargs.items() if k in static_argnames))
        return (treedef, shapes, statics)

    def _load_or_compile(args, kwargs):
        lowered = jfun.lower(*args, **kwargs)
        text = lowered.as_text()
        dev = jax.devices()[0]
        tag = f"{jax.__version__}|{dev.platform}|{getattr(dev, 'device_kind', '')}"
        sha = hashlib.sha256((tag + text).encode()).hexdigest()[:32]
        # process-global reuse: a second pipeline instance in the same
        # process (bench repeat runs, multi-mode sweeps) skips even the
        # deserialization — sha-exact, so config differences can't collide
        hit = _GLOBAL_EXES.get(sha)
        if hit is not None:
            return hit
        path = os.path.join(_cache_dir(), f"{sha}.jaxexe")
        if os.path.exists(path):
            from jax.experimental.serialize_executable import (
                deserialize_and_load)

            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            exe = deserialize_and_load(payload, in_tree, out_tree)
            _GLOBAL_EXES[sha] = exe
            return exe
        compiled = lowered.compile()
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(compiled)
            os.makedirs(_cache_dir(), exist_ok=True)
            # atomic write: the driver may run concurrently with a warm run
            fd, tmp = tempfile.mkstemp(dir=_cache_dir(), suffix=".tmp")
            with os.fdopen(fd, "wb") as fh:
                pickle.dump((payload, in_tree, out_tree), fh)
            os.replace(tmp, path)
        except Exception:
            pass  # serialization unsupported: still return the compiled exe
        _GLOBAL_EXES[sha] = compiled
        return compiled

    def wrapper(*args, **kwargs):
        if not _enabled():
            return jfun(*args, **kwargs)
        try:
            key = _aval_key(args, kwargs)
            exe = loaded.get(key)
            if exe is None:
                with lock:
                    exe = loaded.get(key)
                    if exe is None:
                        exe = _load_or_compile(args, kwargs)
                        loaded[key] = exe
            dyn_kwargs = {k: v for k, v in kwargs.items()
                          if k not in static_argnames}
            return exe(*args, **dyn_kwargs)
        except Exception:
            return jfun(*args, **kwargs)

    wrapper.__name__ = getattr(fun, "__name__", "aot_jit")
    wrapper._jit = jfun  # escape hatch for lower()/inspection
    return wrapper
