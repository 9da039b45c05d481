"""Per-op cost probe on (512,512) f32 tiles inside one Pallas kernel.

Times a kernel that runs `iters` repetitions of an op sequence on VMEM
scratch, reporting ns per op-application. Op menu: max, add, select,
roll1, roll8, roll256, roll_sel (roll+select), fma.

python experiments/vpu_probe2.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 512, 512
INNER = 64
OUTER = 200


def make(op):
    def kernel(x_ref, out_ref, a_sc, b_sc):
        a_sc[:] = x_ref[:]
        b_sc[:] = x_ref[:] * 0.5
        sub = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
        m = sub >= 7

        def body(i, carry):
            a = a_sc[:]
            b = b_sc[:]
            if op == "max":
                r = jnp.maximum(a, b)
            elif op == "add":
                r = a + b
            elif op == "select":
                r = jnp.where(m, a, b)
            elif op == "roll1":
                r = pltpu.roll(a, 1, axis=0)
            elif op == "roll8":
                r = pltpu.roll(a, 8, axis=0)
            elif op == "roll256":
                r = pltpu.roll(a, 256, axis=0)
            elif op == "roll_sel_max":
                rolled = pltpu.roll(a, 1, axis=0)
                r = jnp.where(m, jnp.maximum(a, rolled), a)
            elif op == "rollmax":
                r = jnp.maximum(a, pltpu.roll(a, 8, axis=0))
            elif op == "fma":
                r = a * 1.0001 + b
            elif op == "lanroll":
                r = pltpu.roll(a, 1, axis=1)
            elif op == "reduce0":
                r = a + jnp.max(b, axis=0, keepdims=True)
            a_sc[:] = r + jnp.float32(1e-7)  # prevent hoisting
            return carry

        jax.lax.fori_loop(0, INNER, body, 0)
        out_ref[:] = a_sc[:]

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((R, C), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, C), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, C), jnp.float32),
                        pltpu.VMEM((R, C), jnp.float32)],
    )
    return jax.jit(lambda x: call(x))


def bench(op):
    f = make(op)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(R, C))
                    .astype(np.float32))
    np.asarray(f(x))
    t0 = time.perf_counter()
    for _ in range(OUTER):
        r = f(x)
    np.asarray(r)
    dt = time.perf_counter() - t0
    per_op = dt / (OUTER * INNER)
    return per_op * 1e9


if __name__ == "__main__":
    base = bench("add")
    print(f"{'add':14s} {base:8.0f} ns  1.00x")
    for op in ["max", "fma", "select", "roll1", "roll8", "roll256",
               "rollmax", "roll_sel_max", "lanroll", "reduce0"]:
        t = bench(op)
        print(f"{op:14s} {t:8.0f} ns  {t/base:.2f}x")
