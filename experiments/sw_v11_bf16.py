"""Experiment: bf16/f16 DP state with f32 reductions.

sw_v8 showed bf16 state failing to compile; hypothesis: the cross-sublane
max-reduction (jnp.max axis=0) over bf16 is the unsupported op, not the
elementwise state math. Here the state refs stay narrow (halving VMEM
traffic — the measured bottleneck, see sw_v10 ablations: the bare 3-op
gapless loop tops out ~594 GCUPS = ~11 TB/s of f32 tile traffic) and
only the final reduce upcasts to f32.

Exactness: gapless clamps h to [0, cap<=255] per column, and every
integer < 256 is exact in bf16; any inexact intermediate (>=256, spacing
2) still clamps to cap, so results are bit-identical. For gapped, f16
(10-bit mantissa) keeps integers exact to 2048 — enough for ramp-space
values when max_score + lq*ge <= 2047; larger problems keep the f32 path.

Run: python experiments/sw_v11_bf16.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, args, cells, iters=20, warmup=2, trials=3):
    for _ in range(warmup):
        np.asarray(fn(*args))
    best = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = fn(*args)
        np.asarray(r)
        dt = time.perf_counter() - t0
        best = max(best, cells * iters / dt / 1e9)
    return best


def _shift_sub(x, fill):
    rolled = pltpu.roll(x, 1, axis=0)
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(sub == 0, fill, rolled)


def gapless_kernel(prof_ref, tpk_ref, out_ref, h_ref, hm_ref, stile_ref,
                   *, lq, lt, bt, unroll, dtype, cap, stile_dtype):
    prof = prof_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[1]
    ub = unroll * bt
    h_ref[:] = jnp.zeros_like(h_ref)
    hm_ref[:] = jnp.zeros_like(hm_ref)
    capv = jnp.asarray(cap, dtype)
    zero = jnp.asarray(0, dtype)

    def column(s):
        h = _shift_sub(h_ref[:], zero) + s
        h = jnp.minimum(jnp.maximum(h, zero), capv)
        h_ref[:] = h
        hm_ref[:] = jnp.maximum(hm_ref[:], h)

    def tile_step(t, _):
        chars = tpk_ref[0, t, :]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (alpha, ub), 0)
                  == chars[None, :]).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(prof, onehot,
                               preferred_element_type=stile_dtype)
        for u in range(unroll):
            column(stile_ref[:, pl.ds(u * bt, bt)].astype(dtype))
        return 0

    jax.lax.fori_loop(0, lt // unroll, tile_step, 0)
    out_ref[:] = jnp.broadcast_to(
        jnp.max(hm_ref[:].astype(jnp.float32), axis=0, keepdims=True),
        out_ref.shape)


def gapped_kernel(prof_ref, tpk_ref, out_ref, h_ref, e_ref, hm_ref,
                  stile_ref, *, lq, lt, bt, unroll, dtype, go, ge,
                  stile_dtype):
    prof = prof_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[1]
    ub = unroll * bt
    sub = jax.lax.broadcasted_iota(jnp.int32, (lq, bt), 0)
    ramp = (sub * ge).astype(dtype)
    NEG = jnp.asarray(-16000, dtype)
    # tiled lazy-F closure, as in the production kernel
    F_TILE = 8
    while lq // F_TILE > 64 and lq % (F_TILE * 2) == 0:
        F_TILE *= 2
    n_ftiles = lq // F_TILE
    nlev = max(1, (F_TILE - 1).bit_length())
    subt = jax.lax.broadcasted_iota(jnp.int32, (F_TILE, bt), 0)
    masks = [subt >= (1 << l) for l in range(nlev)]
    first_t = subt == 0
    h_ref[:] = ramp
    e_ref[:] = ramp + NEG
    hm_ref[:] = jnp.zeros_like(hm_ref)
    go_v = jnp.asarray(go, dtype)
    ge_v = jnp.asarray(ge, dtype)
    goge = jnp.asarray(go - ge, dtype)
    mge = jnp.asarray(-ge, dtype)

    def column(s):
        h = h_ref[:]
        diag = _shift_sub(h, mge) + s
        e = jnp.maximum(h - go_v, e_ref[:] - ge_v)
        hng = jnp.maximum(ramp, jnp.maximum(diag, e))

        def ftile(hng_k, carry):
            run = hng_k
            for l in range(nlev):
                rolled = pltpu.roll(run, 1 << l, axis=0)
                run = jnp.where(masks[l], jnp.maximum(run, rolled), run)
            run = jnp.maximum(run, carry)
            fsh = pltpu.roll(run, 1, axis=0)
            fsh = jnp.where(first_t,
                            jnp.broadcast_to(carry, (F_TILE, bt)), fsh)
            return (jnp.maximum(hng_k, fsh - goge),
                    run[F_TILE - 1:F_TILE])

        carry = jnp.full((1, bt), NEG)
        for k in range(n_ftiles):
            hnew_k, carry = ftile(hng[k * F_TILE:(k + 1) * F_TILE], carry)
            h_ref[pl.ds(k * F_TILE, F_TILE)] = hnew_k
        e_ref[:] = e
        hm_ref[:] = jnp.maximum(hm_ref[:], h_ref[:] - ramp)

    def tile_step(t, _):
        chars = tpk_ref[0, t, :]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (alpha, ub), 0)
                  == chars[None, :]).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(prof, onehot,
                               preferred_element_type=stile_dtype)
        for u in range(unroll):
            column((stile_ref[:, pl.ds(u * bt, bt)].astype(dtype)
                    + ge_v))
        return 0

    jax.lax.fori_loop(0, lt // unroll, tile_step, 0)
    out_ref[:] = jnp.broadcast_to(
        jnp.max(hm_ref[:].astype(jnp.float32), axis=0, keepdims=True),
        out_ref.shape)


def pack_targets(targets_t, BT, U):
    lt, b = targets_t.shape
    nb = -(-b // BT)
    x = targets_t.reshape(lt // U, U, nb, BT).transpose(2, 0, 1, 3)
    return x.reshape(nb, lt // U, U * BT)


@functools.partial(jax.jit, static_argnames=("kind", "dtype", "bt",
                                             "unroll", "stile_dtype"))
def run(prof_t, tpk, *, kind, dtype, bt, unroll,
        stile_dtype=jnp.float32):
    lq, alpha = prof_t.shape
    nb, n_tiles, ub = tpk.shape
    lt = n_tiles * unroll
    scratch = [pltpu.VMEM((lq, bt), dtype),
               pltpu.VMEM((lq, bt), dtype),
               pltpu.VMEM((lq, unroll * bt), stile_dtype)]
    if kind == "gapped":
        scratch = [pltpu.VMEM((lq, bt), dtype)] + scratch
        kernel = functools.partial(gapped_kernel, lq=lq, lt=lt, bt=bt,
                                   unroll=unroll, dtype=dtype, go=11,
                                   ge=1, stile_dtype=stile_dtype)
    else:
        kernel = functools.partial(gapless_kernel, lq=lq, lt=lt, bt=bt,
                                   unroll=unroll, dtype=dtype, cap=255,
                                   stile_dtype=stile_dtype)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((lq, alpha), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, ub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, bt), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * 8, bt), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=scratch,
    )(prof_t, tpk)


def main():
    rng = np.random.default_rng(0)
    alpha, lq, lt = 32, 512, 512
    batch = 16384 if jax.default_backend() != "cpu" else 1024
    unroll, bt = 8, 512
    profile = rng.integers(-4, 11, size=(alpha, lq)).astype(np.int32)
    targets = rng.integers(0, 20, size=(lt, batch)).astype(np.int32)
    cells = batch * lq * lt
    prof_t = jnp.asarray(profile).T.astype(jnp.float32)
    tpk = pack_targets(jnp.asarray(targets), bt, unroll).astype(jnp.int32)

    ref = {}
    for kind in ("gapless", "gapped"):
        for dtype, sdt in ((jnp.float32, jnp.float32),
                           (jnp.bfloat16, jnp.float32),
                           (jnp.bfloat16, jnp.bfloat16),
                           (jnp.float16, jnp.float32)):
            name = f"{kind:8s} {dtype.__name__:9s} stile={sdt.__name__}"
            try:
                out = np.asarray(run(prof_t, tpk, kind=kind, dtype=dtype,
                                     bt=bt, unroll=unroll,
                                     stile_dtype=sdt))
                key = kind
                if key not in ref:
                    ref[key] = out
                    ok = "ref"
                else:
                    ok = ("exact" if np.array_equal(out, ref[key]) else
                          f"MAXDIFF={np.abs(out - ref[key]).max()}")
                g = bench(lambda: run(prof_t, tpk, kind=kind, dtype=dtype,
                                      bt=bt, unroll=unroll,
                                      stile_dtype=sdt), (), cells)
                print(f"{name}: {g:8.1f} GCUPS  [{ok}]", flush=True)
            except Exception as e:
                print(f"{name}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
