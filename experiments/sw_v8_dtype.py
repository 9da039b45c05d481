"""Experiment: DP state dtype (f32 vs bf16 vs i16 vs i32) throughput on the
gapless and gapped kernels. If the VPU packs narrow types (2x bf16/i16 per
lane), the state ops double in throughput; if not, f32 stays.

Run on the TPU: python experiments/sw_v8_dtype.py
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
                   *, lq, lt, bt, unroll, dtype, cap):
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
                               preferred_element_type=jnp.float32)
        for u in range(unroll):
            column(stile_ref[:, pl.ds(u * bt, bt)].astype(dtype))
        return 0

    jax.lax.fori_loop(0, lt // unroll, tile_step, 0)
    out_ref[:] = jnp.broadcast_to(
        jnp.max(hm_ref[:], axis=0, keepdims=True),
        out_ref.shape).astype(jnp.float32)


def gapped_kernel(prof_ref, tpk_ref, out_ref, h_ref, e_ref, hm_ref,
                  stile_ref, *, lq, lt, bt, unroll, dtype, go, ge):
    prof = prof_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[1]
    ub = unroll * bt
    sub = jax.lax.broadcasted_iota(jnp.int32, (lq, bt), 0)
    ramp = (sub * ge).astype(dtype)
    NEG = jnp.asarray(-16000 if dtype != jnp.float32 else -1e9, dtype)
    nlev = max(1, (lq - 1).bit_length())
    masks = [sub >= (1 << l) for l in range(nlev)]
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
        run = hng
        for l in range(nlev):
            rolled = pltpu.roll(run, 1 << l, axis=0)
            run = jnp.where(masks[l], jnp.maximum(run, rolled), run)
        f = _shift_sub(run, NEG) - goge
        hnew = jnp.maximum(hng, f)
        h_ref[:] = hnew
        e_ref[:] = e
        hm_ref[:] = jnp.maximum(hm_ref[:], hnew - ramp)

    def tile_step(t, _):
        chars = tpk_ref[0, t, :]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (alpha, ub), 0)
                  == chars[None, :]).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(prof, onehot,
                               preferred_element_type=jnp.float32)
        for u in range(unroll):
            column((stile_ref[:, pl.ds(u * bt, bt)]
                    + jnp.float32(ge)).astype(dtype))
        return 0

    jax.lax.fori_loop(0, lt // unroll, tile_step, 0)
    out_ref[:] = jnp.broadcast_to(
        jnp.max(hm_ref[:], axis=0, keepdims=True),
        out_ref.shape).astype(jnp.float32)


def pack_targets(targets_t, BT, U):
    lt, b = targets_t.shape
    nb = -(-b // BT)
    x = targets_t.reshape(lt // U, U, nb, BT).transpose(2, 0, 1, 3)
    return x.reshape(nb, lt // U, U * BT)


@functools.partial(jax.jit, static_argnames=("kind", "dtype", "bt",
                                             "unroll"))
def run(prof_t, tpk, *, kind, dtype, bt, unroll):
    lq, alpha = prof_t.shape
    nb, n_tiles, ub = tpk.shape
    lt = n_tiles * unroll
    scratch = [pltpu.VMEM((lq, bt), dtype),
               pltpu.VMEM((lq, bt), dtype),
               pltpu.VMEM((lq, unroll * bt), jnp.float32)]
    if kind == "gapped":
        scratch = [pltpu.VMEM((lq, bt), dtype)] + scratch
        kernel = functools.partial(gapped_kernel, lq=lq, lt=lt, bt=bt,
                                   unroll=unroll, dtype=dtype, go=11, ge=1)
    else:
        kernel = functools.partial(gapless_kernel, lq=lq, lt=lt, bt=bt,
                                   unroll=unroll, dtype=dtype, cap=255)
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
    alpha, lq, lt, batch = 32, 512, 512, 16384
    bt, unroll = 512, 8
    prof = rng.integers(-4, 11, size=(lq, alpha)).astype(np.float32)
    tt = rng.integers(0, 20, size=(lt, batch)).astype(np.int32)
    tpk = jnp.asarray(pack_targets(tt, bt, unroll))
    profd = jnp.asarray(prof)
    cells = batch * lq * lt
    for kind in ("gapless", "gapped"):
        for dtype in (jnp.float32, jnp.bfloat16, jnp.int32, jnp.int16):
            try:
                g = bench(lambda p, t: run(p, t, kind=kind, dtype=dtype,
                                           bt=bt, unroll=unroll),
                          (profd, tpk), cells)
                print(f"{kind:8s} {dtype.__name__:9s}: {g:8.1f} GCUPS")
            except Exception as e:
                print(f"{kind:8s} {dtype.__name__:9s}: FAIL "
                      f"{str(e)[:200]}")


if __name__ == "__main__" and len(__import__("sys").argv) == 1:
    main()


# --- round 2 of the experiment: concat-based shifts (bf16-safe, and the
# fill row replaces the iota mask: one op less per shift) ---

def _shift_cat(x, fill):
    return jnp.concatenate(
        [jnp.full((1, x.shape[1]), fill, x.dtype), x[:-1]], axis=0)


def gapless_kernel2(prof_ref, tpk_ref, out_ref, h_ref, hm_ref, stile_ref,
                    *, lq, lt, bt, unroll, dtype, cap):
    prof = prof_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[1]
    ub = unroll * bt
    h_ref[:] = jnp.zeros_like(h_ref)
    hm_ref[:] = jnp.zeros_like(hm_ref)
    capv = jnp.asarray(cap, dtype)
    zero = jnp.asarray(0, dtype)

    def column(s):
        h = _shift_cat(h_ref[:], zero) + s
        h = jnp.minimum(jnp.maximum(h, zero), capv)
        h_ref[:] = h
        hm_ref[:] = jnp.maximum(hm_ref[:], h)

    def tile_step(t, _):
        chars = tpk_ref[0, t, :]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (alpha, ub), 0)
                  == chars[None, :]).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(prof, onehot,
                               preferred_element_type=jnp.float32)
        for u in range(unroll):
            column(stile_ref[:, pl.ds(u * bt, bt)].astype(dtype))
        return 0

    jax.lax.fori_loop(0, lt // unroll, tile_step, 0)
    out_ref[:] = jnp.broadcast_to(
        jnp.max(hm_ref[:].astype(jnp.float32), axis=0, keepdims=True),
        out_ref.shape)


def gapped_kernel2(prof_ref, tpk_ref, out_ref, h_ref, e_ref, hm_ref,
                   stile_ref, *, lq, lt, bt, unroll, dtype, go, ge,
                   shiftmode):
    prof = prof_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[1]
    ub = unroll * bt
    sub = jax.lax.broadcasted_iota(jnp.int32, (lq, bt), 0)
    ramp = (sub * ge).astype(dtype)
    NEG = jnp.asarray(-1e9, dtype)
    nlev = max(1, (lq - 1).bit_length())
    # additive level masks: max(run, rolled + add) instead of where()
    adds = [jnp.where(sub >= (1 << l), jnp.asarray(0, dtype), NEG)
            for l in range(nlev)]
    h_ref[:] = ramp
    e_ref[:] = ramp + NEG
    hm_ref[:] = jnp.zeros_like(hm_ref)
    go_v = jnp.asarray(go, dtype)
    ge_v = jnp.asarray(ge, dtype)
    goge = jnp.asarray(go - ge, dtype)
    mge = jnp.asarray(-ge, dtype)

    def column(s):
        h = h_ref[:]
        diag = _shift_cat(h, mge) + s
        e = jnp.maximum(h - go_v, e_ref[:] - ge_v)
        hng = jnp.maximum(ramp, jnp.maximum(diag, e))
        run = hng
        for l in range(nlev):
            if shiftmode == "roll":
                rolled = pltpu.roll(run, 1 << l, axis=0)
                run = jnp.maximum(run, rolled + adds[l])
            else:
                sh = 1 << l
                rolled = jnp.concatenate(
                    [jnp.full((sh, bt), NEG, run.dtype), run[:-sh]], axis=0)
                run = jnp.maximum(run, rolled)
        f = _shift_cat(run, NEG) - goge
        hnew = jnp.maximum(hng, f)
        h_ref[:] = hnew
        e_ref[:] = e
        hm_ref[:] = jnp.maximum(hm_ref[:], hnew - ramp)

    def tile_step(t, _):
        chars = tpk_ref[0, t, :]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (alpha, ub), 0)
                  == chars[None, :]).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(prof, onehot,
                               preferred_element_type=jnp.float32)
        for u in range(unroll):
            column((stile_ref[:, pl.ds(u * bt, bt)]
                    + jnp.float32(ge)).astype(dtype))
        return 0

    jax.lax.fori_loop(0, lt // unroll, tile_step, 0)
    out_ref[:] = jnp.broadcast_to(
        jnp.max(hm_ref[:].astype(jnp.float32), axis=0, keepdims=True),
        out_ref.shape)


@functools.partial(jax.jit, static_argnames=("kind", "dtype", "bt",
                                             "unroll", "shiftmode"))
def run2(prof_t, tpk, *, kind, dtype, bt, unroll, shiftmode="cat"):
    lq, alpha = prof_t.shape
    nb, n_tiles, ub = tpk.shape
    lt = n_tiles * unroll
    scratch = [pltpu.VMEM((lq, bt), dtype),
               pltpu.VMEM((lq, bt), dtype),
               pltpu.VMEM((lq, unroll * bt), jnp.float32)]
    if kind == "gapped":
        scratch = [pltpu.VMEM((lq, bt), dtype)] + scratch
        kernel = functools.partial(gapped_kernel2, lq=lq, lt=lt, bt=bt,
                                   unroll=unroll, dtype=dtype, go=11,
                                   ge=1, shiftmode=shiftmode)
    else:
        kernel = functools.partial(gapless_kernel2, lq=lq, lt=lt, bt=bt,
                                   unroll=unroll, dtype=dtype, cap=255)
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


def main2():
    rng = np.random.default_rng(0)
    alpha, lq, lt, batch = 32, 512, 512, 16384
    bt, unroll = 512, 8
    prof = rng.integers(-4, 11, size=(lq, alpha)).astype(np.float32)
    tt = rng.integers(0, 20, size=(lt, batch)).astype(np.int32)
    tpk = jnp.asarray(pack_targets(tt, bt, unroll))
    profd = jnp.asarray(prof)
    cells = batch * lq * lt
    for kind, dtype, sm in [("gapless", jnp.float32, "cat"),
                            ("gapless", jnp.bfloat16, "cat"),
                            ("gapped", jnp.float32, "cat"),
                            ("gapped", jnp.float32, "roll"),
                            ("gapped", jnp.bfloat16, "cat")]:
        try:
            g = bench(lambda p, t: run2(p, t, kind=kind, dtype=dtype,
                                        bt=bt, unroll=unroll,
                                        shiftmode=sm),
                      (profd, tpk), cells)
            print(f"v2 {kind:8s} {dtype.__name__:9s} {sm:4s}: "
                  f"{g:8.1f} GCUPS")
        except Exception as e:
            print(f"v2 {kind:8s} {dtype.__name__:9s} {sm:4s}: FAIL "
                  f"{str(e)[:150]}")


if __name__ == "__main__" and len(__import__("sys").argv) > 1:
    main2()
