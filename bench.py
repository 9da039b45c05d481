"""Benchmark: Smith-Waterman cell updates per second on the current device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Methodology: dispatch many kernel invocations asynchronously and sync once —
per-call dispatch overhead through the runtime tunnel is ~25ms, which halved
round-1's reported numbers. The headline metric is the gapped affine SW scan
WITH end-position tracking (the align-stage kernel, same as round 1);
the gapless prefilter scan (the reference GPU path's actual filter,
libmarv/CUDASW++ 4.0 class ~1000 GCUPS on A100/H100, SURVEY.md §6) is
reported to stderr. vs_baseline = gapped GCUPS / 1000.
"""

import json
import sys
import time

import numpy as np


def bench_async(fn, args, cells, iters=20, warmup=2):
    for _ in range(warmup):
        np.asarray(fn(*args)[0] if isinstance(fn(*args), (tuple, list))
                   else fn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    r = r[0] if isinstance(r, (tuple, list)) else r
    np.asarray(r)
    dt = time.perf_counter() - t0
    return cells * iters / dt / 1e9


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    alpha, lq, lt, batch = 32, 512, 512, 4096
    profile = rng.integers(-4, 11, size=(alpha, lq)).astype(np.int32)
    targets_t = rng.integers(0, 20, size=(lt, batch)).astype(np.int32)
    cells = batch * lq * lt

    if jax.default_backend() == "cpu":
        from mmseqs2_tpu.ops import dp
        qidx = jnp.zeros(batch, jnp.int32)
        fn = jax.jit(lambda p, t: dp.sw_scan(p[None], qidx, t.T, 11, 1))
        gcups = bench_async(fn, (jnp.asarray(profile),
                                 jnp.asarray(targets_t)), cells, iters=2)
        gapless = 0.0
    else:
        from mmseqs2_tpu.ops.pallas_sw import (gapless_pallas_score,
                                               sw_pallas)
        dp_prof = jnp.asarray(profile)
        dp_tgt = jnp.asarray(targets_t)
        gcups = bench_async(
            lambda p, t: sw_pallas(p, t, go=11, ge=1),
            (dp_prof, dp_tgt), cells)
        gapless = bench_async(
            lambda p, t: gapless_pallas_score(p, t),
            (dp_prof, dp_tgt), cells)
    print(f"gapless prefilter scan: {gapless:.1f} GCUPS/chip",
          file=sys.stderr)
    print(json.dumps({
        "metric": "sw_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS/chip",
        "vs_baseline": round(gcups / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
