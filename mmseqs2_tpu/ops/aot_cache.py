"""Disk-backed AOT executable cache for jitted Pallas programs.

jax's persistent compilation cache only skips the XLA *backend* compile;
every process still re-traces and re-lowers each (shape, static-config)
variant, and tracing a heavily unrolled Pallas DP kernel costs seconds per
shape (an align stage touches ~a dozen shapes -> ~50 s of pure re-tracing
per run). `jax.experimental.serialize_executable` pickles the COMPILED
backend executable (~2.5 MB); a later process loads it in ~10 ms — no
re-trace, no re-lower, no backend compile (just the per-process device
program upload on first invocation).

Cache key = (caller key parts incl. source hash, arg shapes/dtypes,
backend, device kind, jax version). Set MMSEQS2_TPU_AOT_CACHE=off to
disable.
"""

import hashlib
import os
import threading

import numpy as np

_mem = {}
_lock = threading.Lock()


def _cache_dir():
    loc = os.environ.get("MMSEQS2_TPU_AOT_CACHE",
                         os.path.expanduser("~/.cache/mmseqs2_tpu/aot"))
    return None if loc == "off" else loc


def source_hash(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def aot_call(make_exec, key_parts, args, fallback):
    """Run a jitted program through the AOT cache.

    make_exec: () -> jax.stages.Compiled taking exactly `args` (only
    invoked on a cache miss; use the ORIGINAL jit fn's .lower().compile()
    so the XLA persistent cache key matches the normal path). key_parts:
    hashable config description (include a source hash so kernel edits
    invalidate). fallback: called with *args when serialization is
    unavailable."""
    import jax
    loc = _cache_dir()
    if loc is None:
        return fallback(*args)
    shapes = tuple((tuple(np.shape(a)), str(np.asarray(a).dtype)
                    if not hasattr(a, "dtype") else str(a.dtype))
                   for a in args)
    try:
        devkind = jax.devices()[0].device_kind
    except Exception:
        devkind = "?"
    raw = repr((key_parts, shapes, jax.default_backend(), devkind,
                jax.__version__))
    key = hashlib.sha256(raw.encode()).hexdigest()[:32]
    with _lock:
        ex = _mem.get(key)
    if ex is None:
        import pickle

        from jax.experimental import serialize_executable as se
        path = os.path.join(loc, key + ".jexe")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                ex = se.deserialize_and_load(payload, in_tree, out_tree)
            except Exception:
                ex = None
        if ex is None:
            try:
                compiled = make_exec()
                payload, in_tree, out_tree = se.serialize(compiled)
                os.makedirs(loc, exist_ok=True)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    pickle.dump((payload, in_tree, out_tree), f)
                os.replace(tmp, path)
                ex = compiled
            except Exception:
                return fallback(*args)
        with _lock:
            _mem[key] = ex
    return ex(*args)
