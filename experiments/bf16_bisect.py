"""Bisect which bf16 op breaks the Mosaic compile in the DP kernels.

Each variant is a tiny kernel doing one suspect op on a (512, 512) bf16
tile inside a fori_loop. Run: python experiments/bf16_bisect.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LQ, BT = 512, 512


def make(variant, dtype):
    def kernel(x_ref, o_ref, h_ref):
        h_ref[:] = x_ref[:].astype(dtype)

        def body(t, _):
            h = h_ref[:]
            if variant == "add":
                h = h + jnp.asarray(1, dtype)
            elif variant == "roll":
                h = pltpu.roll(h, 1, axis=0)
            elif variant == "roll_where":
                r = pltpu.roll(h, 1, axis=0)
                sub = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
                h = jnp.where(sub == 0, jnp.asarray(0, dtype), r)
            elif variant == "max":
                h = jnp.maximum(h, jnp.asarray(0, dtype))
            elif variant == "subslice_store":
                h_ref[pl.ds(0, 8)] = h[0:8] + jnp.asarray(1, dtype)
                h = h_ref[:]
            elif variant == "reduce":
                m = jnp.max(h, axis=0, keepdims=True)
                h = h + m.astype(dtype)
            elif variant == "cast_store":
                h = (h.astype(jnp.float32) + 1.0).astype(dtype)
            h_ref[:] = h
            return 0

        jax.lax.fori_loop(0, 4, body, 0)
        o_ref[:] = h_ref[:].astype(jnp.float32)

    @jax.jit
    def go(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((LQ, BT), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((LQ, BT), dtype)],
        )(x)

    return go


def main():
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 100, size=(LQ, BT)).astype(np.float32))
    for dtype in (jnp.bfloat16, jnp.float16):
        for variant in ("add", "max", "roll", "roll_where",
                        "subslice_store", "reduce", "cast_store"):
            try:
                np.asarray(make(variant, dtype)(x))
                print(f"{dtype.__name__:9s} {variant:15s}: ok", flush=True)
            except Exception as e:
                print(f"{dtype.__name__:9s} {variant:15s}: "
                      f"FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
