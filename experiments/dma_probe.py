"""Probe: throughput of many small dynamic-offset row DMAs (HBM->VMEM).

The window-pack rescore design issues one LN-byte DMA per candidate lane
from a dynamic base offset. This measures issue+completion throughput for
G-row blocks at depth-8 software pipelining, plus the cost of a trivial
reduction over the landed rows (to keep the DMAs observable).

python experiments/dma_probe.py [G_block LN]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTH = 8


def make(G, LN, nsteps):
    FETCH = 2048        # aligned superset of any LN<=1024 window

    def kernel(base_ref, src_ref, out_ref, buf, sems):
        def start(l):
            ab = pl.multiple_of((base_ref[l] >> 10) << 10, 1024)
            dst = pl.multiple_of(l * FETCH, 2048)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(ab, FETCH)],
                buf.at[pl.ds(dst, FETCH)], sems.at[l % DEPTH])

        for l in range(DEPTH):
            start(l).start()

        def body(l, _):
            start(l).wait()

            @pl.when(l + DEPTH < G)
            def _():
                start(l + DEPTH).start()
            return 0

        jax.lax.fori_loop(0, G, body, 0)
        out_ref[0, 0] = jnp.sum(buf[:].reshape(G, 2048).astype(jnp.int32))

    @jax.jit
    def run(base, src):
        return pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((G,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((G * 2048,), jnp.int8),
                pltpu.SemaphoreType.DMA((DEPTH,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(base, src)

    return run


def main():
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    LN = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    NSTEPS = 32
    rng = np.random.default_rng(0)
    E = 175_000_000
    src = jnp.asarray(rng.integers(0, 20, size=E).astype(np.int8))
    base = jnp.asarray(
        rng.integers(0, E - 2048, size=NSTEPS * G).astype(np.int32))
    run = make(G, LN, NSTEPS)
    r = run(base, src)
    np.asarray(r)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        r = run(base, src)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / iters
    n_dma = NSTEPS * G
    print(f"G={G} FETCH=2048: {dt*1e3:.2f} ms for {n_dma} row DMAs "
          f"-> {dt/n_dma*1e9:.0f} ns/DMA, "
          f"{n_dma*LN/dt/1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
