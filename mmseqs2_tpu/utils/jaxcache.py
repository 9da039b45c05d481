"""Persistent XLA compilation cache setup (idempotent).

Every workflow step is its own process (CommandCaller semantics), and each
jitted program costs tens of seconds to MINUTES to compile through the TPU
runtime tunnel — without a disk cache a pipeline recompiles the same
kernels at every stage. Used by both the CLI entry point and library
constructors (DevicePrefilter), so benches/tests that bypass the CLI still
share compilations. Set MMSEQS2_TPU_JAX_CACHE=off to disable.
"""

import os

_done = False


def enable_jax_compile_cache():
    global _done
    if _done:
        return
    _done = True
    loc = os.environ.get("MMSEQS2_TPU_JAX_CACHE",
                         os.path.expanduser("~/.cache/mmseqs2_tpu/jax"))
    if loc == "off":
        return
    try:
        import jax
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:      # cache is an optimization, never fatal
        pass
