"""Native (C) kernels, built on demand with the system compiler.

These cover the few reference code paths whose float results depend on x86
instruction semantics (rcpps approximation in the PSSM position-specific
weights, SSE dot-product reduction trees) — see pssm_kernels.c. Everything
falls back to numpy if no compiler is available; the fallback differs from
the reference by at most 1 ulp in rare cells.
"""

import ctypes
import os
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _build(src, out):
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-march=native", "-fsigned-char", "-shared",
                 "-fPIC", src, "-o", out],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def get_lib():
    """Build (once) and return the ctypes library, or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_HERE, "pssm_kernels.c")
    so = os.path.join(_HERE, "_pssm_kernels.so")
    if not os.path.exists(so) or (os.path.getmtime(so)
                                  < os.path.getmtime(src)):
        target = so
        try:
            ok = _build(src, target)
        except OSError:
            ok = False
        if not ok:
            # package dir may be read-only; fall back to a temp location
            target = os.path.join(tempfile.gettempdir(),
                                  "mmseqs2_tpu_pssm_kernels.so")
            if not (os.path.exists(target) and _build(src, target)):
                if not _build(src, target):
                    return None
        so = target
    try:
        _LIB = ctypes.CDLL(so)
    except OSError:
        return None
    return _LIB


def nr_rcp(values):
    """x86 rcpps + one Newton-Raphson iteration, elementwise (float32)."""
    import numpy as np
    lib = get_lib()
    x = np.ascontiguousarray(values, dtype=np.float32)
    if lib is None:
        return (np.float32(1.0) / x).astype(np.float32)
    out = np.empty_like(x)
    lib.nr_rcp_batch(x.ctypes.data_as(ctypes.c_void_p),
                     out.ctypes.data_as(ctypes.c_void_p),
                     ctypes.c_long(x.size))
    return out.reshape(np.shape(values))


def scalar_prod20(R, freq):
    """out[p, aa] = reference ScalarProd20(R[aa], freq[p]); returns None if
    the native library is unavailable (caller falls back to numpy)."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    Rf = np.ascontiguousarray(R, dtype=np.float32)
    f = np.ascontiguousarray(freq, dtype=np.float32)
    out = np.empty((f.shape[0], 20), dtype=np.float32)
    lib.scalar_prod20_batch(Rf.ctypes.data_as(ctypes.c_void_p),
                            f.ctypes.data_as(ctypes.c_void_p),
                            out.ctypes.data_as(ctypes.c_void_p),
                            ctypes.c_long(f.shape[0]))
    return out
