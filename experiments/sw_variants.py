"""Microbenchmark harness for SW kernel variants on the real TPU.

Run: python experiments/sw_variants.py [variant ...]
Each variant prints GCUPS. Correctness cross-checked against ops/dp.sw_scan
on a small case first.
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


def _shift_lanes(x, fill):
    rolled = pltpu.roll(x, 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, fill, rolled)


# ---------------------------------------------------------------- variant: score-only + unrolled columns + precomputed score tile
def _sw_score_kernel(profile_ref, targets_ref, score_ref,
                     h_ref, e_ref, hmax_ref, stile_ref,
                     *, lq, lt, go, ge, unroll, nlevels, early_exit):
    bt = h_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, lq), 1)
    lanef = lane.astype(jnp.float32)
    ramp = lanef * jnp.float32(ge)
    h_ref[:] = ramp
    e_ref[:] = ramp + jnp.float32(NEG)
    hmax_ref[:] = jnp.zeros_like(hmax_ref)

    prof = profile_ref[:].astype(jnp.bfloat16)          # (A, Lq)
    alpha = prof.shape[0]
    go_f = jnp.float32(go)
    ge_f = jnp.float32(ge)
    goge = jnp.float32(go - ge)

    n_tiles = lt // unroll

    def tile_step(t, _):
        j0 = t * unroll
        for u in range(unroll):
            chars = targets_ref[j0 + u, :]
            onehot = (chars[:, None] ==
                      jax.lax.broadcasted_iota(jnp.int32, (bt, alpha), 1)
                      ).astype(jnp.bfloat16)
            s = jnp.dot(onehot, prof, preferred_element_type=jnp.float32)
            h = h_ref[:]
            diag = _shift_lanes(h, jnp.float32(-ge)) + (s + ge_f)
            e = jnp.maximum(h - go_f, e_ref[:] - ge_f)
            hng = jnp.maximum(ramp, jnp.maximum(diag, e))
            hmax_ref[:] = jnp.maximum(hmax_ref[:], hng)
            # lazy-F closure: cummax along lanes (ramped space)
            run = hng
            if early_exit:
                def cond(carry):
                    d, run, changed = carry
                    return jnp.logical_and(d < lq, changed)

                def body(carry):
                    d, run, _ = carry
                    rolled = pltpu.roll(run, 1, axis=1)
                    # multi-step: shift by d via repeated... use where mask
                    return carry
                # (early-exit handled in variant below)
                pass
            d = 1
            while d < lq:
                rolled = pltpu.roll(run, d, axis=1)
                run = jnp.where(lane >= d, jnp.maximum(run, rolled), run)
                d *= 2
            f = _shift_lanes(run, jnp.float32(NEG)) - goge
            h_ref[:] = jnp.maximum(hng, f)
            e_ref[:] = e
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_step, 0)
    score_ref[:] = jnp.max(hmax_ref[:] - ramp, axis=1,
                           keepdims=True).astype(jnp.int32)


def sw_score_unrolled(profile, targets_t, go=11, ge=1, unroll=8):
    alpha, lq = profile.shape
    lt, b = targets_t.shape
    BT = 256
    nb = -(-b // BT)
    kernel = functools.partial(_sw_score_kernel, lq=lq, lt=lt, go=go, ge=ge,
                               unroll=unroll, nlevels=0, early_exit=False)
    score = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((alpha, lq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lt, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * BT, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BT, lq), jnp.float32),
            pltpu.VMEM((BT, lq), jnp.float32),
            pltpu.VMEM((BT, lq), jnp.float32),
            pltpu.VMEM((unroll * BT, lq), jnp.float32),
        ],
    )(profile.astype(jnp.float32), targets_t)
    return score[:b, 0]


# ---------------------------------------------------------------- variant: score-only + early-exit lazy F
def _sw_score_ee_kernel(profile_ref, targets_ref, score_ref,
                        h_ref, e_ref, hmax_ref, stile_ref,
                        *, lq, lt, go, ge, unroll):
    bt = h_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, lq), 1)
    lanef = lane.astype(jnp.float32)
    ramp = lanef * jnp.float32(ge)
    h_ref[:] = ramp
    e_ref[:] = ramp + jnp.float32(NEG)
    hmax_ref[:] = jnp.zeros_like(hmax_ref)

    prof = profile_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[0]
    go_f = jnp.float32(go)
    ge_f = jnp.float32(ge)
    goge = jnp.float32(go - ge)
    n_tiles = lt // unroll

    def tile_step(t, _):
        j0 = t * unroll
        for u in range(unroll):
            chars = targets_ref[j0 + u, :]
            onehot = (chars[:, None] ==
                      jax.lax.broadcasted_iota(jnp.int32, (bt, alpha), 1)
                      ).astype(jnp.bfloat16)
            s = jnp.dot(onehot, prof, preferred_element_type=jnp.float32)
            h = h_ref[:]
            diag = _shift_lanes(h, jnp.float32(-ge)) + (s + ge_f)
            e = jnp.maximum(h - go_f, e_ref[:] - ge_f)
            hng = jnp.maximum(ramp, jnp.maximum(diag, e))
            hmax_ref[:] = jnp.maximum(hmax_ref[:], hng)

            # early-exit doubling cummax: stop once a doubling step
            # changes nothing (monotone => converged)
            def cond(carry):
                d, run, changed = carry
                return jnp.logical_and(d < lq, changed)

            def body(carry):
                d, run, _ = carry
                rolled = pltpu.roll(run, d, axis=1)
                # wrapped lanes (lane < d) keep old value
                new = jnp.where(lane >= d, jnp.maximum(run, rolled), run)
                changed = jnp.any(new > run)
                return (d * 2, new, changed)

            _, run, _ = jax.lax.while_loop(cond, body, (1, hng, True))
            f = _shift_lanes(run, jnp.float32(NEG)) - goge
            h_ref[:] = jnp.maximum(hng, f)
            e_ref[:] = e
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_step, 0)
    score_ref[:] = jnp.max(hmax_ref[:] - ramp, axis=1,
                           keepdims=True).astype(jnp.int32)


def sw_score_ee(profile, targets_t, go=11, ge=1, unroll=8):
    alpha, lq = profile.shape
    lt, b = targets_t.shape
    BT = 256
    nb = -(-b // BT)
    kernel = functools.partial(_sw_score_ee_kernel, lq=lq, lt=lt, go=go,
                               ge=ge, unroll=unroll)
    score = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((alpha, lq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lt, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * BT, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BT, lq), jnp.float32),
            pltpu.VMEM((BT, lq), jnp.float32),
            pltpu.VMEM((BT, lq), jnp.float32),
            pltpu.VMEM((unroll * BT, lq), jnp.float32),
        ],
    )(profile.astype(jnp.float32), targets_t)
    return score[:b, 0]


# ---------------------------------------------------------------- gapless score-only
def _gapless_kernel(profile_ref, targets_ref, score_ref,
                    h_ref, hmax_ref, stile_ref, *, lq, lt, cap, unroll):
    bt = h_ref.shape[0]
    h_ref[:] = jnp.zeros_like(h_ref)
    hmax_ref[:] = jnp.zeros_like(hmax_ref)
    prof = profile_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[0]
    n_tiles = lt // unroll

    def tile_step(t, _):
        j0 = t * unroll
        for u in range(unroll):
            chars = targets_ref[j0 + u, :]
            onehot = (chars[:, None] ==
                      jax.lax.broadcasted_iota(jnp.int32, (bt, alpha), 1)
                      ).astype(jnp.bfloat16)
            s = jnp.dot(onehot, prof, preferred_element_type=jnp.float32)
            h = _shift_lanes(h_ref[:], jnp.float32(0)) + s
            h = jnp.clip(h, 0.0, jnp.float32(cap))
            h_ref[:] = h
            hmax_ref[:] = jnp.maximum(hmax_ref[:], h)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_step, 0)
    score_ref[:] = jnp.max(hmax_ref[:], axis=1, keepdims=True).astype(
        jnp.int32)


def gapless_score(profile, targets_t, cap=255, unroll=8):
    alpha, lq = profile.shape
    lt, b = targets_t.shape
    BT = 256
    nb = -(-b // BT)
    kernel = functools.partial(_gapless_kernel, lq=lq, lt=lt, cap=cap,
                               unroll=unroll)
    score = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((alpha, lq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lt, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * BT, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BT, lq), jnp.float32),
            pltpu.VMEM((BT, lq), jnp.float32),
            pltpu.VMEM((unroll * BT, lq), jnp.float32),
        ],
    )(profile.astype(jnp.float32), targets_t)
    return score[:b, 0]


# ---------------------------------------------------------------- harness
def bench(fn, profile, targets_t, iters=5, warmup=2):
    for _ in range(warmup):
        np.asarray(fn(profile, targets_t))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(profile, targets_t))
    dt = time.perf_counter() - t0
    b = targets_t.shape[1]
    lq = profile.shape[1]
    lt = targets_t.shape[0]
    return b * lq * lt * iters / dt / 1e9


def check(fn, gapless=False):
    """Cross-check small case vs dp reference."""
    sys.path.insert(0, "/root/repo")
    from mmseqs2_tpu.ops import dp
    rng = np.random.default_rng(1)
    alpha, lq, lt, b = 32, 128, 96, 64
    prof = rng.integers(-4, 11, size=(alpha, lq)).astype(np.int32)
    prof[20:, :] = -128
    tgt = rng.integers(0, 20, size=(lt, b)).astype(np.int32)
    got = np.asarray(fn(jnp.asarray(prof), jnp.asarray(tgt)))
    qidx = jnp.zeros(b, jnp.int32)
    if gapless:
        want = np.asarray(dp.gapless_scan(
            jnp.asarray(prof)[None], qidx, jnp.asarray(tgt).T,
            jnp.full(b, 255, jnp.int32))[0]).reshape(-1)
    else:
        want = np.asarray(dp.sw_scan(jnp.asarray(prof)[None], qidx,
                                     jnp.asarray(tgt).T, 11, 1)[0])
    ok = np.array_equal(got, want)
    print(f"  check: {'OK' if ok else 'MISMATCH'}"
          + ("" if ok else f" got={got[:8]} want={want[:8]}"))
    return ok


def main():
    rng = np.random.default_rng(0)
    alpha, lq, lt, batch = 32, 512, 512, 4096
    profile = jnp.asarray(rng.integers(-4, 11, size=(alpha, lq)).astype(
        np.int32))
    targets_t = jnp.asarray(rng.integers(0, 20, size=(lt, batch)).astype(
        np.int32))

    variants = sys.argv[1:] or ["old", "score8", "ee8", "gapless8"]
    for v in variants:
        if v == "old":
            sys.path.insert(0, "/root/repo")
            from mmseqs2_tpu.ops.pallas_sw import sw_pallas
            fn = lambda p, t: sw_pallas(p, t, go=11, ge=1)[0]  # noqa
            g = bench(fn, profile, targets_t)
            print(f"old full-tracking: {g:.1f} GCUPS")
        elif v.startswith("score"):
            u = int(v[5:])
            fn = jax.jit(functools.partial(sw_score_unrolled, go=11, ge=1,
                                           unroll=u))
            check(fn)
            g = bench(fn, profile, targets_t)
            print(f"score-only unroll={u}: {g:.1f} GCUPS")
        elif v.startswith("ee"):
            u = int(v[2:])
            fn = jax.jit(functools.partial(sw_score_ee, go=11, ge=1,
                                           unroll=u))
            check(fn)
            g = bench(fn, profile, targets_t)
            print(f"early-exit unroll={u}: {g:.1f} GCUPS")
        elif v.startswith("gapless"):
            u = int(v[7:])
            fn = jax.jit(functools.partial(gapless_score, cap=255, unroll=u))
            check(fn, gapless=True)
            g = bench(fn, profile, targets_t)
            print(f"gapless unroll={u}: {g:.1f} GCUPS")


if __name__ == "__main__":
    main()
