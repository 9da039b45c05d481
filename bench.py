"""Benchmark: Smith-Waterman cell updates per second on the current device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference's GPU path (libmarv / CUDASW++ 4.0, Nat.
Methods 2025) delivers on the order of 1000 GCUPS-class gapped throughput per
A100/H100-class device (SURVEY.md §6); vs_baseline is measured GCUPS / 1000.
"""

import json
import time

import numpy as np


def bench_sw(batch=4096, lq=512, lt=512, iters=5, warmup=2):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    alpha = 32
    profile = jnp.asarray(
        rng.integers(-4, 11, size=(alpha, lq)).astype(np.int32))
    targets_t = jnp.asarray(
        rng.integers(0, 20, size=(lt, batch)).astype(np.int32))

    if jax.default_backend() == "cpu":
        from mmseqs2_tpu.ops import dp
        qidx = jnp.zeros(batch, jnp.int32)
        fn = jax.jit(lambda p, t: dp.sw_scan(p[None], qidx, t.T, 11, 1))
    else:
        from mmseqs2_tpu.ops.pallas_sw import sw_pallas
        fn = lambda p, t: sw_pallas(p, t, go=11, ge=1)  # noqa: E731
    # force full completion via host transfer (block_until_ready under the
    # axon tunnel returns before remote execution finishes)
    for _ in range(warmup):
        np.asarray(fn(profile, targets_t)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        s = np.asarray(fn(profile, targets_t)[0])
    dt = time.perf_counter() - t0
    assert int(s.min()) >= 0
    cells = batch * lq * lt * iters
    return cells / dt / 1e9


def main():
    gcups = bench_sw()
    print(json.dumps({
        "metric": "sw_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS/chip",
        "vs_baseline": round(gcups / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
