"""Measure VPU elementwise throughput + roll cost on the real chip."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(f, x, iters=10):
    for _ in range(3):
        np.asarray(f(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(f(x))
    return time.perf_counter() - t0


def xla_chain(n_ops):
    @jax.jit
    def f(x):
        y = x
        for _ in range(n_ops):
            y = jnp.maximum(y * 1.0001 + 0.1, 0.0)
        return y
    return f


def _pallas_chain_kernel(x_ref, o_ref, *, n_ops):
    y = x_ref[:]
    for _ in range(n_ops):
        y = jnp.maximum(y * 1.0001 + 0.1, 0.0)
    o_ref[:] = y


def pallas_chain(n_ops):
    @jax.jit
    def f(x):
        return pl.pallas_call(
            functools.partial(_pallas_chain_kernel, n_ops=n_ops),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    return f


def _pallas_roll_kernel(x_ref, o_ref, *, n_ops):
    y = x_ref[:]
    for i in range(n_ops):
        y = pltpu.roll(y, 1 + (i % 4), axis=1)
    o_ref[:] = y


def pallas_roll(n_ops):
    @jax.jit
    def f(x):
        return pl.pallas_call(
            functools.partial(_pallas_roll_kernel, n_ops=n_ops),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    return f


def main():
    x = jnp.asarray(np.random.rand(2048, 512).astype(np.float32))
    n = x.size
    for nm, mk in [("xla", xla_chain), ("pallas", pallas_chain),
                   ("roll", pallas_roll)]:
        for n_ops in (16, 64, 256):
            dt = bench(mk(n_ops), x) / 10
            per_op = n * (n_ops * (2 if nm != "roll" else 1)) / dt
            print(f"{nm} chain n_ops={n_ops}: {dt*1e6:.0f}us "
                  f"-> {per_op/1e12:.2f} T elem-ops/s", flush=True)


if __name__ == "__main__":
    main()
