"""Amortized kernel benchmark: R kernel invocations chained inside one jit,
single scalar transfer — removes the ~26ms/call axon tunnel overhead that
polluted all previous measurements.

python experiments/bench_amortized.py [old|sw2|gapless2] ...
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

R = 16


def amortize(kernel_fn):
    """kernel_fn(prof, targets-like) -> scores; returns jitted R-repeat fn."""
    @jax.jit
    def f(prof, tgt):
        def body(i, acc):
            s = kernel_fn(prof + (i - i), tgt)   # i-dep blocks CSE
            return acc + jnp.sum(s)
        return jax.lax.fori_loop(0, R, body, jnp.int32(0))
    return f


def run(name):
    rng = np.random.default_rng(0)
    alpha, lq, lt, batch = 32, 512, 512, 4096
    profile = jnp.asarray(rng.integers(-4, 11, size=(alpha, lq)).astype(
        np.int32))
    targets_t = jnp.asarray(rng.integers(0, 20, size=(lt, batch)).astype(
        np.int32))
    cells = batch * lq * lt

    if name == "old":
        from mmseqs2_tpu.ops.pallas_sw import _sw_pallas_jit

        def kern(p, t):
            return _sw_pallas_jit(p, t, go=11, ge=1, gapless=False, cap=255,
                                  pack=True, interpret=False)[0]
        f = amortize(kern)
        args = (profile, targets_t)
    elif name in ("sw2", "gapless2"):
        import sw_variants2 as v2
        tpk, _ = v2.pack_targets(targets_t, 256, 8)
        tpk = jnp.asarray(tpk)
        if name == "sw2":
            kern = functools.partial(v2.sw2, b=batch, go=11, ge=1, unroll=8,
                                     BT=256)
        else:
            kern = functools.partial(v2.gapless2, b=batch, cap=255,
                                     unroll=8, BT=256)
        f = amortize(kern)
        args = (profile, tpk)

    np.asarray(f(*args))           # compile+warm
    np.asarray(f(*args))
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        np.asarray(f(*args))
    dt = time.perf_counter() - t0
    g = cells * R * iters / dt / 1e9
    print(f"{name}: {g:.1f} GCUPS (amortized, {dt/iters*1e3:.0f}ms per "
          f"{R}-rep call)", flush=True)


if __name__ == "__main__":
    for n in (sys.argv[1:] or ["old", "gapless2", "sw2"]):
        run(n)
