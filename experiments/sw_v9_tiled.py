"""Experiment: tiled lazy-F cummax for the gapped SW kernel.

The round-2 kernel pays ceil(log2(Lq)) roll+max+select triples per column
over the FULL (Lq, BT) state for the lazy-F closure. Decomposition: split
the query rows into tiles of T sublanes; per column do a local cummax per
tile (log2(T) levels over (T, BT)) plus a sequential (1, BT) carry chain
across the Lq/T tiles. Cell-op count per column drops from 3*log2(Lq) to
~3*log2(T) + 2, at the cost of Lq/T tiny carry ops.

Run: python experiments/sw_v9_tiled.py [T ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


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


def kernel(prof_ref, tpk_ref, out_ref, h_ref, e_ref, hm_ref, stile_ref,
           *, lq, lt, bt, unroll, go, ge, tile):
    prof = prof_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[1]
    ub = unroll * bt
    sub = jax.lax.broadcasted_iota(jnp.int32, (lq, bt), 0)
    subf = sub.astype(jnp.float32)
    ramp = subf * jnp.float32(ge)
    n_tiles_q = lq // tile
    nlev = max(1, (tile - 1).bit_length())
    subt = jax.lax.broadcasted_iota(jnp.int32, (tile, bt), 0)
    masks = [subt >= (1 << l) for l in range(nlev)]
    h_ref[:] = ramp
    e_ref[:] = ramp + jnp.float32(NEG)
    hm_ref[:] = jnp.zeros_like(hm_ref)
    go_f = jnp.float32(go)
    ge_f = jnp.float32(ge)
    goge = jnp.float32(go - ge)

    def column(s):
        h = h_ref[:]
        diag = _shift_sub(h, jnp.float32(-ge)) + s
        e = jnp.maximum(h - go_f, e_ref[:] - ge_f)
        hng = jnp.maximum(ramp, jnp.maximum(diag, e))
        # tiled cummax: local scan per T-row tile + (1, BT) carry chain
        parts = []
        carry = jnp.full((1, bt), jnp.float32(NEG))
        for k in range(n_tiles_q):
            run = hng[k * tile:(k + 1) * tile]
            for l in range(nlev):
                rolled = pltpu.roll(run, 1 << l, axis=0)
                run = jnp.where(masks[l], jnp.maximum(run, rolled), run)
            run = jnp.maximum(run, carry)
            carry = run[tile - 1:tile]
            parts.append(run)
        run = jnp.concatenate(parts, axis=0)
        f = _shift_sub(run, jnp.float32(NEG)) - goge
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
            column(stile_ref[:, pl.ds(u * bt, bt)] + jnp.float32(ge))
        return 0

    jax.lax.fori_loop(0, lt // unroll, tile_step, 0)
    out_ref[:] = jnp.broadcast_to(
        jnp.max(hm_ref[:], axis=0, keepdims=True), out_ref.shape)


def pack_targets(targets_t, BT, U):
    lt, b = targets_t.shape
    nb = -(-b // BT)
    x = targets_t.reshape(lt // U, U, nb, BT).transpose(2, 0, 1, 3)
    return x.reshape(nb, lt // U, U * BT)


@functools.partial(jax.jit, static_argnames=("bt", "unroll", "tile"))
def run(prof_t, tpk, *, bt, unroll, tile):
    lq, alpha = prof_t.shape
    nb, n_tiles, ub = tpk.shape
    lt = n_tiles * unroll
    return pl.pallas_call(
        functools.partial(kernel, lq=lq, lt=lt, bt=bt, unroll=unroll,
                          go=11, ge=1, tile=tile),
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
        scratch_shapes=[pltpu.VMEM((lq, bt), jnp.float32),
                        pltpu.VMEM((lq, bt), jnp.float32),
                        pltpu.VMEM((lq, bt), jnp.float32),
                        pltpu.VMEM((lq, unroll * bt), jnp.float32)],
    )(prof_t, tpk)


def main():
    tiles = [int(t) for t in sys.argv[1:]] or [512, 128, 32, 16, 8]
    rng = np.random.default_rng(0)
    alpha, lq, lt, batch = 32, 512, 512, 16384
    bt, unroll = 512, 8
    prof = rng.integers(-4, 11, size=(lq, alpha)).astype(np.float32)
    tt = rng.integers(0, 20, size=(lt, batch)).astype(np.int32)
    tpk = jnp.asarray(pack_targets(tt, bt, unroll))
    profd = jnp.asarray(prof)
    cells = batch * lq * lt

    # correctness oracle: tile=512 == untiled full scan (same math)
    ref = None
    for T in tiles:
        try:
            out = np.asarray(run(profd, tpk, bt=bt, unroll=unroll, tile=T))
            if ref is None:
                ref = out
            ok = "OK " if np.array_equal(out, ref) else "MISMATCH"
            g = bench(lambda p, t: run(p, t, bt=bt, unroll=unroll, tile=T),
                      (profd, tpk), cells)
            print(f"tile={T:4d}: {g:8.1f} GCUPS  {ok}")
        except Exception as e:
            print(f"tile={T:4d}: FAIL {str(e)[:150]}")



# --- v9b: per-tile fused F (no concat, no global run shift) --------------

def kernel_b(prof_ref, tpk_ref, out_ref, h_ref, e_ref, hm_ref, stile_ref,
             *, lq, lt, bt, unroll, go, ge, tile):
    prof = prof_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[1]
    ub = unroll * bt
    sub = jax.lax.broadcasted_iota(jnp.int32, (lq, bt), 0)
    ramp = sub.astype(jnp.float32) * jnp.float32(ge)
    n_tiles_q = lq // tile
    nlev = max(1, (tile - 1).bit_length())
    subt = jax.lax.broadcasted_iota(jnp.int32, (tile, bt), 0)
    masks = [subt >= (1 << l) for l in range(nlev)]
    first_t = subt == 0
    h_ref[:] = ramp
    e_ref[:] = ramp + jnp.float32(NEG)
    hm_ref[:] = jnp.zeros_like(hm_ref)
    go_f = jnp.float32(go)
    ge_f = jnp.float32(ge)
    goge = jnp.float32(go - ge)

    def column(s):
        h = h_ref[:]
        diag = _shift_sub(h, jnp.float32(-ge)) + s
        e = jnp.maximum(h - go_f, e_ref[:] - ge_f)
        hng = jnp.maximum(ramp, jnp.maximum(diag, e))
        carry = jnp.full((1, bt), jnp.float32(NEG))
        for k in range(n_tiles_q):
            hng_k = hng[k * tile:(k + 1) * tile]
            run = hng_k
            for l in range(nlev):
                rolled = pltpu.roll(run, 1 << l, axis=0)
                run = jnp.where(masks[l], jnp.maximum(run, rolled), run)
            run = jnp.maximum(run, carry)
            # F for this tile: shift run down by one, fill = prev carry
            fsh = pltpu.roll(run, 1, axis=0)
            fsh = jnp.where(first_t, jnp.broadcast_to(carry, (tile, bt)),
                            fsh)
            carry = run[tile - 1:tile]
            h_ref[pl.ds(k * tile, tile)] = jnp.maximum(hng_k, fsh - goge)
        e_ref[:] = e
        hm_ref[:] = jnp.maximum(hm_ref[:], h_ref[:] - ramp)

    def tile_step(t, _):
        chars = tpk_ref[0, t, :]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (alpha, ub), 0)
                  == chars[None, :]).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(prof, onehot,
                               preferred_element_type=jnp.float32)
        for u in range(unroll):
            column(stile_ref[:, pl.ds(u * bt, bt)] + jnp.float32(ge))
        return 0

    jax.lax.fori_loop(0, lt // unroll, tile_step, 0)
    out_ref[:] = jnp.broadcast_to(
        jnp.max(hm_ref[:], axis=0, keepdims=True), out_ref.shape)


@functools.partial(jax.jit, static_argnames=("bt", "unroll", "tile"))
def run_b(prof_t, tpk, *, bt, unroll, tile):
    lq, alpha = prof_t.shape
    nb, n_tiles, ub = tpk.shape
    lt = n_tiles * unroll
    return pl.pallas_call(
        functools.partial(kernel_b, lq=lq, lt=lt, bt=bt, unroll=unroll,
                          go=11, ge=1, tile=tile),
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
        scratch_shapes=[pltpu.VMEM((lq, bt), jnp.float32),
                        pltpu.VMEM((lq, bt), jnp.float32),
                        pltpu.VMEM((lq, bt), jnp.float32),
                        pltpu.VMEM((lq, unroll * bt), jnp.float32)],
    )(prof_t, tpk)


def main_b():
    tiles = [int(t) for t in sys.argv[2:]] or [8, 16, 32]
    rng = np.random.default_rng(0)
    alpha, lq, lt, batch = 32, 512, 512, 16384
    bt, unroll = 512, 8
    prof = rng.integers(-4, 11, size=(lq, alpha)).astype(np.float32)
    tt = rng.integers(0, 20, size=(lt, batch)).astype(np.int32)
    tpk = jnp.asarray(pack_targets(tt, bt, unroll))
    profd = jnp.asarray(prof)
    cells = batch * lq * lt
    ref = np.asarray(run(profd, tpk, bt=bt, unroll=unroll, tile=512))
    for T in tiles:
        try:
            out = np.asarray(run_b(profd, tpk, bt=bt, unroll=unroll,
                                   tile=T))
            ok = "OK " if np.array_equal(out, ref) else "MISMATCH"
            g = bench(lambda p, t: run_b(p, t, bt=bt, unroll=unroll,
                                         tile=T), (profd, tpk), cells)
            print(f"v9b tile={T:4d}: {g:8.1f} GCUPS  {ok}")
        except Exception as e:
            print(f"v9b tile={T:4d}: FAIL {str(e)[:150]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "b":
        main_b()
    else:
        main()
