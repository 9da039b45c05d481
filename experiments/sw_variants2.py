"""Round 2 of SW kernel experiments: batched-columns matmul via host
pre-layout.

Host reorders targets to (nb, n_tiles, U*BT) so the kernel can build a tall
one-hot (U*BT, A) from a single row slice (no reshape) and do ONE bf16
matmul per U columns.

Run: python experiments/sw_variants2.py [variant ...]
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


def pack_targets(targets_t, BT, U):
    """(Lt, B) -> (nb, Lt//U, U*BT) with row t holding chars for columns
    t*U..t*U+U-1 laid out as [u*BT + b]."""
    lt, b = targets_t.shape
    nb = -(-b // BT)
    pad_b = nb * BT - b
    pad_t = (-lt) % U
    tp = np.pad(np.asarray(targets_t), ((0, pad_t), (0, pad_b)),
                constant_values=31)
    ltp = lt + pad_t
    # tp: (ltp, nb*BT) -> (nb, ltp//U, U, BT) -> (nb, ltp//U, U*BT)
    x = tp.reshape(ltp // U, U, nb, BT).transpose(2, 0, 1, 3)
    return np.ascontiguousarray(x.reshape(nb, ltp // U, U * BT)), ltp


# ------------------------------------------------------------------ kernels
def _gapless2_kernel(profile_ref, tpk_ref, score_ref,
                     h_ref, hmax_ref, stile_ref, *, lq, n_tiles, cap,
                     unroll, bt):
    h_ref[:] = jnp.zeros_like(h_ref)
    hmax_ref[:] = jnp.zeros_like(hmax_ref)
    prof = profile_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[0]
    ub = unroll * bt

    def tile_step(t, _):
        chars = tpk_ref[0, t, :]                    # (U*BT,)
        onehot = (chars[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (ub, alpha), 1)
                  ).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(onehot, prof,
                               preferred_element_type=jnp.float32)
        for u in range(unroll):
            s = stile_ref[pl.ds(u * bt, bt), :]
            h = _shift_lanes(h_ref[:], jnp.float32(0)) + s
            h = jnp.minimum(jnp.maximum(h, 0.0), jnp.float32(cap))
            h_ref[:] = h
            hmax_ref[:] = jnp.maximum(hmax_ref[:], h)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_step, 0)
    score_ref[:] = jnp.max(hmax_ref[:], axis=1, keepdims=True).astype(
        jnp.int32)


def gapless2(profile, tpk, b, cap=255, unroll=8, BT=256):
    alpha, lq = profile.shape
    nb = tpk.shape[0]
    n_tiles = tpk.shape[1]
    kernel = functools.partial(_gapless2_kernel, lq=lq, n_tiles=n_tiles,
                               cap=cap, unroll=unroll, bt=BT)
    score = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((alpha, lq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, unroll * BT), lambda i: (i, 0, 0),
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
    )(profile.astype(jnp.float32), tpk)
    return score[:b, 0]


def _sw2_kernel(profile_ref, tpk_ref, score_ref,
                h_ref, e_ref, hmax_ref, stile_ref, *, lq, n_tiles, go, ge,
                unroll, bt):
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, lq), 1)
    lanef = lane.astype(jnp.float32)
    ramp = lanef * jnp.float32(ge)
    h_ref[:] = ramp
    e_ref[:] = ramp + jnp.float32(NEG)
    hmax_ref[:] = jnp.zeros_like(hmax_ref)
    # profile has +ge pre-added host-side (diag = shift(h) + s + ge)
    prof = profile_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[0]
    ub = unroll * bt
    go_f = jnp.float32(go)
    ge_f = jnp.float32(ge)
    goge = jnp.float32(go - ge)
    nlev = max(1, (lq - 1).bit_length())
    masks = [lane >= (1 << l) for l in range(nlev)]

    def tile_step(t, _):
        chars = tpk_ref[0, t, :]
        onehot = (chars[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (ub, alpha), 1)
                  ).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(onehot, prof,
                               preferred_element_type=jnp.float32)
        for u in range(unroll):
            s = stile_ref[pl.ds(u * bt, bt), :]
            h = h_ref[:]
            diag = _shift_lanes(h, jnp.float32(-ge)) + s
            e = jnp.maximum(h - go_f, e_ref[:] - ge_f)
            hng = jnp.maximum(ramp, jnp.maximum(diag, e))
            hmax_ref[:] = jnp.maximum(hmax_ref[:], hng)
            run = hng
            for l in range(nlev):
                rolled = pltpu.roll(run, 1 << l, axis=1)
                run = jnp.where(masks[l], jnp.maximum(run, rolled), run)
            f = _shift_lanes(run, jnp.float32(NEG)) - goge
            h_ref[:] = jnp.maximum(hng, f)
            e_ref[:] = e
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_step, 0)
    score_ref[:] = jnp.max(hmax_ref[:] - ramp, axis=1,
                           keepdims=True).astype(jnp.int32)


def sw2(profile, tpk, b, go=11, ge=1, unroll=8, BT=256):
    alpha, lq = profile.shape
    nb = tpk.shape[0]
    n_tiles = tpk.shape[1]
    prof_plus = profile.astype(jnp.float32) + jnp.float32(ge)
    # padded char 31 must never produce positive scores: give it NEG column
    prof_plus = prof_plus.at[31, :].set(-1e4)
    kernel = functools.partial(_sw2_kernel, lq=lq, n_tiles=n_tiles, go=go,
                               ge=ge, unroll=unroll, bt=BT)
    score = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((alpha, lq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, unroll * BT), lambda i: (i, 0, 0),
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
    )(prof_plus, tpk)
    return score[:b, 0]


# ------------------------------------------------------------------ harness
def make_fn(kind, profile, targets_t, u, bt):
    lt, b = targets_t.shape
    tpk, _ = pack_targets(targets_t, bt, u)
    tpk = jnp.asarray(tpk)
    prof = jnp.asarray(profile)
    if kind == "gapless2":
        f = jax.jit(functools.partial(gapless2, b=b, cap=255, unroll=u,
                                      BT=bt))
    else:
        f = jax.jit(functools.partial(sw2, b=b, go=11, ge=1, unroll=u,
                                      BT=bt))
    return lambda: f(prof, tpk)


def bench(fn, cells, iters=5, warmup=2):
    for _ in range(warmup):
        np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn())
    dt = time.perf_counter() - t0
    return cells * iters / dt / 1e9


def check(fn, gapless=False):
    sys.path.insert(0, "/root/repo")
    from mmseqs2_tpu.ops import dp
    rng = np.random.default_rng(1)
    alpha, lq, lt, b = 32, 128, 96, 64
    prof = rng.integers(-6, 5, size=(alpha, lq)).astype(np.int32)
    prof[20:, :] = -128
    tgt = rng.integers(0, 20, size=(lt, b)).astype(np.int32)
    got = np.asarray(fn(prof, tgt)).reshape(-1)
    qidx = jnp.zeros(b, jnp.int32)
    if gapless:
        want = np.asarray(dp.gapless_scan(
            jnp.asarray(prof)[None], qidx, jnp.asarray(tgt).T,
            jnp.full(b, 255, jnp.int32))[0]).reshape(-1)
    else:
        want = np.asarray(dp.sw_scan(jnp.asarray(prof)[None], qidx,
                                     jnp.asarray(tgt).T, 11, 1)[0]).reshape(
                                         -1)
    ok = np.array_equal(got, want)
    print(f"  check: {'OK' if ok else 'MISMATCH'}"
          + ("" if ok else f" got={got[:8]} want={want[:8]}"), flush=True)
    return ok


def main():
    rng = np.random.default_rng(0)
    alpha, lq, lt, batch = 32, 512, 512, 4096
    profile = rng.integers(-4, 11, size=(alpha, lq)).astype(np.int32)
    targets_t = rng.integers(0, 20, size=(lt, batch)).astype(np.int32)

    for v in (sys.argv[1:] or ["gapless2-8-256", "sw2-8-256",
                               "gapless2-16-512", "sw2-8-512"]):
        parts = v.split("-")
        u, bt = int(parts[1]), int(parts[2])
        def cfn(p, t, kind=parts[0], u=u, bt=bt):
            tpk, _ = pack_targets(t, bt, u)
            if kind == "gapless2":
                return gapless2(jnp.asarray(p), jnp.asarray(tpk),
                                t.shape[1], cap=255, unroll=u, BT=bt)
            return sw2(jnp.asarray(p), jnp.asarray(tpk), t.shape[1],
                       go=11, ge=1, unroll=u, BT=bt)
        check(cfn, gapless=(parts[0] == "gapless2"))
        fn = make_fn(parts[0], profile, targets_t, u, bt)
        cells = targets_t.shape[1] * profile.shape[1] * targets_t.shape[0]
        g = bench(fn, cells)
        print(f"{v}: {g:.1f} GCUPS", flush=True)


if __name__ == "__main__":
    main()
