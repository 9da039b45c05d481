"""V4: transposed layout — query positions on SUBLANES, batch on lanes.

All shifts/cummax become sublane rolls (~6x cheaper than lane rolls per the
probe). stile = prof_T (Lq, A) @ onehot_T (A, U*BT) per tile; DP state
(Lq, BT).

python experiments/sw_v4.py [swT-8-256] [gaplessT-8-256]
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


def pack_targets(targets_t, BT, U):
    lt, b = targets_t.shape
    nb = -(-b // BT)
    pad_b = nb * BT - b
    pad_t = (-lt) % U
    tp = np.pad(np.asarray(targets_t), ((0, pad_t), (0, pad_b)),
                constant_values=31)
    ltp = lt + pad_t
    x = tp.reshape(ltp // U, U, nb, BT).transpose(2, 0, 1, 3)
    return np.ascontiguousarray(x.reshape(nb, ltp // U, U * BT)), ltp


def _shift_sub(x, fill):
    rolled = pltpu.roll(x, 1, axis=0)
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(sub == 0, fill, rolled)


def _swT_kernel(profile_ref, tpk_ref, score_ref,
                h_ref, e_ref, hmax_ref, stile_ref, *, lq, n_tiles, go, ge,
                unroll, bt, gapless, cap):
    sub = jax.lax.broadcasted_iota(jnp.int32, (lq, bt), 0)
    first = sub == 0
    prof = profile_ref[:].astype(jnp.bfloat16)       # (Lq, A) transposed
    alpha = prof.shape[1]
    ub = unroll * bt
    go_f = jnp.float32(go)
    ge_f = jnp.float32(ge)
    goge = jnp.float32(go - ge)
    capf = jnp.float32(cap)
    if not gapless:
        ramp = sub.astype(jnp.float32) * ge_f
        nlev = max(1, (lq - 1).bit_length())
        masks = [sub >= (1 << l) for l in range(nlev)]
        h_ref[:] = ramp
        e_ref[:] = ramp + jnp.float32(NEG)
    else:
        h_ref[:] = jnp.zeros_like(h_ref)
    hmax_ref[:] = jnp.zeros_like(hmax_ref)

    def tile_step(t, _):
        chars = tpk_ref[0, t, :]                      # (U*BT,)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (alpha, ub), 0)
                  == chars[None, :]).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(prof, onehot,
                               preferred_element_type=jnp.float32)
        for u in range(unroll):
            s = stile_ref[:, pl.ds(u * bt, bt)]
            if gapless:
                h = _shift_sub(h_ref[:], jnp.float32(0)) + s
                h = jnp.minimum(jnp.maximum(h, 0.0), capf)
                h_ref[:] = h
                hmax_ref[:] = jnp.maximum(hmax_ref[:], h)
            else:
                h = h_ref[:]
                diag = _shift_sub(h, jnp.float32(-ge)) + s
                e = jnp.maximum(h - go_f, e_ref[:] - ge_f)
                hng = jnp.maximum(ramp, jnp.maximum(diag, e))
                hmax_ref[:] = jnp.maximum(hmax_ref[:], hng)
                run = hng
                for l in range(nlev):
                    rolled = pltpu.roll(run, 1 << l, axis=0)
                    run = jnp.where(masks[l], jnp.maximum(run, rolled), run)
                f = _shift_sub(run, jnp.float32(NEG)) - goge
                h_ref[:] = jnp.maximum(hng, f)
                e_ref[:] = e
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_step, 0)
    if gapless:
        hm = hmax_ref[:]
    else:
        hm = hmax_ref[:] - sub.astype(jnp.float32) * ge_f
    score_ref[:] = jnp.broadcast_to(
        jnp.max(hm, axis=0, keepdims=True), score_ref.shape).astype(
            jnp.int32)


def swT(profile, tpk, b, go=11, ge=1, unroll=8, BT=256, gapless=False,
        cap=255):
    alpha, lq = profile.shape
    nb, n_tiles, ub = tpk.shape
    if gapless:
        prof_t = profile.astype(jnp.float32).T
    else:
        prof_t = (profile.astype(jnp.float32) + jnp.float32(ge)).at[31, :]\
            .set(-1e4).T
    kernel = functools.partial(_swT_kernel, lq=lq, n_tiles=n_tiles, go=go,
                               ge=ge, unroll=unroll, bt=BT, gapless=gapless,
                               cap=cap)
    nscr = 3
    score = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((lq, alpha), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, ub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, BT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * 8, BT), jnp.int32),
        scratch_shapes=[pltpu.VMEM((lq, BT), jnp.float32)] * nscr
        + [pltpu.VMEM((lq, unroll * BT), jnp.float32)],
    )(prof_t, tpk)
    return score.reshape(nb, 8, BT)[:, 0, :].reshape(-1)[:b]


def check(gapless, u, bt):
    sys.path.insert(0, "/root/repo")
    from mmseqs2_tpu.ops import dp
    rng = np.random.default_rng(1)
    alpha, lq, lt, b = 32, 128, 96, 64
    prof = rng.integers(-6, 5, size=(alpha, lq)).astype(np.int32)
    prof[20:, :] = -128
    tgt = rng.integers(0, 20, size=(lt, b)).astype(np.int32)
    tpk, _ = pack_targets(tgt, bt, u)
    got = np.asarray(swT(jnp.asarray(prof), jnp.asarray(tpk), b, unroll=u,
                         BT=bt, gapless=gapless)).reshape(-1)
    qidx = jnp.zeros(b, jnp.int32)
    if gapless:
        res = dp.gapless_scan(jnp.asarray(prof)[None], qidx,
                              jnp.asarray(tgt).T,
                              jnp.full(b, 255, jnp.int32))
        if isinstance(res, tuple):
            res = res[0]
        want = np.asarray(res).reshape(-1)[:b]
    else:
        want = np.asarray(dp.sw_scan(jnp.asarray(prof)[None], qidx,
                                     jnp.asarray(tgt).T, 11, 1)[0]
                          ).reshape(-1)
    ok = np.array_equal(got, want)
    print(f"  check: {'OK' if ok else 'MISMATCH'}"
          + ("" if ok else f" got={got[:8]} want={want[:8]}"), flush=True)


def bench_async(f, args, cells, iters=20):
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    np.asarray(r)
    dt = time.perf_counter() - t0
    return cells * iters / dt / 1e9


def main():
    rng = np.random.default_rng(0)
    alpha, lq, lt, batch = 32, 512, 512, 4096
    profile = rng.integers(-4, 11, size=(alpha, lq)).astype(np.int32)
    targets_t = rng.integers(0, 20, size=(lt, batch)).astype(np.int32)
    for v in (sys.argv[1:] or ["swT-8-256", "gaplessT-8-256"]):
        kind, u, bt = v.split("-")[0], int(v.split("-")[1]), int(
            v.split("-")[2])
        gl = kind.startswith("gapless")
        check(gl, u, bt)
        tpk, _ = pack_targets(targets_t, bt, u)
        f = jax.jit(functools.partial(swT, b=batch, go=11, ge=1, unroll=u,
                                      BT=bt, gapless=gl))
        g = bench_async(f, (jnp.asarray(profile), jnp.asarray(tpk)),
                        batch * lq * lt)
        print(f"{v}: {g:.1f} GCUPS", flush=True)


if __name__ == "__main__":
    main()
