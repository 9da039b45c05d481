"""V5 prototype: hierarchical cummax + deferred tile tracking.

Prefix-max over Lq sublanes decomposed as:
  intra-VREG (8 rows): 3 masked rolls (1,2,4) with group-boundary masks
  group level: extract row-7 values -> (Lq/8, BT) tile, 6-level prefix there
  combine: repeat group-exclusive prefix 8x + max with intra prefix

Tracking deferred: H values for U columns parked in the stile buffer
(read s / write h in place), one packed reduce per tile.

python experiments/sw_v5_hier.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
BT = 512
U = 8
LQ = 512
LT = 512
B = 4096
ALPHA = 32
GO, GE = 11, 1


def pack_targets(t, bt, u):
    lt, b = t.shape
    nb = -(-b // bt)
    x = np.asarray(t).reshape(lt // u, u, nb, bt).transpose(2, 0, 1, 3)
    return np.ascontiguousarray(x.reshape(nb, lt // u, u * bt))


def _shift_sub(x, fill):
    rolled = pltpu.roll(x, 1, axis=0)
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(sub == 0, fill, rolled)


def make_kernel(mode):
    G = LQ // 8

    def kernel(profile_ref, tpk_ref, score_ref, qend_ref, tend_ref,
               buf_sc, e_sc, g_sc, best_sc, bq_sc, bt_sc, hcarry_sc):
        lq, bt = LQ, BT
        sub = jax.lax.broadcasted_iota(jnp.int32, (lq, bt), 0)
        subf = sub.astype(jnp.float32)
        lane8 = sub % 8
        gmask = [lane8 >= 1, lane8 >= 2, lane8 >= 4]
        gsub = jax.lax.broadcasted_iota(jnp.int32, (G, bt), 0)
        gmasks = [gsub >= (1 << l) for l in range(6)]
        prof = profile_ref[:].astype(jnp.bfloat16)
        go_f, ge_f = jnp.float32(GO), jnp.float32(GE)
        goge = jnp.float32(GO - GE)
        PK = jnp.float32(1024.0)
        ramp = subf * ge_f
        # packed-candidate constant: (h - ramp)*PK + (PK-1-subf)
        ubsub = jax.lax.broadcasted_iota(jnp.int32, (lq, U * bt), 0)
        ubsubf = ubsub.astype(jnp.float32)
        Cub = -(ubsubf * ge_f) * PK + (PK - 1.0 - ubsubf)
        e_sc[:] = ramp + jnp.float32(NEG)
        hcarry_sc[:] = ramp
        best_sc[:] = jnp.zeros_like(best_sc)
        bq_sc[:] = jnp.full_like(bq_sc, lq - 1)
        bt_sc[:] = jnp.full_like(bt_sc, -1)

        # selection matrix extracting rows 7, 15, ... (group totals);
        # the one nonzero per row makes the f32 matmul exact
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (G, lq), 1)
                  == (jax.lax.broadcasted_iota(jnp.int32, (G, lq), 0)
                      * 8 + 7)).astype(jnp.float32)

        def cummax_hier(v):
            run = v
            for l, m in enumerate(gmask):
                rolled = pltpu.roll(run, 1 << l, axis=0)
                run = jnp.where(m, jnp.maximum(run, rolled), run)
            # group totals: rows 7, 15, ... via MXU selection
            g = jnp.dot(rowsel, run,
                        preferred_element_type=jnp.float32)   # (G, BT)
            # exclusive prefix over groups
            gp = jnp.where(gsub == 0, jnp.float32(NEG),
                           pltpu.roll(g, 1, axis=0))
            for l, m in enumerate(gmasks):
                rolled = pltpu.roll(gp, 1 << l, axis=0)
                gp = jnp.where(m, jnp.maximum(gp, rolled), gp)
            gpb = pltpu.repeat(gp, 8, axis=0)                   # (Lq, BT)
            return jnp.maximum(run, gpb)

        def cummax_flat(v):
            run = v
            for l in range(9):
                rolled = pltpu.roll(run, 1 << l, axis=0)
                run = jnp.where(sub >= (1 << l),
                                jnp.maximum(run, rolled), run)
            return run

        cummax = cummax_hier if mode in ("hier", "hier_defer") \
            else cummax_flat
        defer = mode.endswith("defer")

        def column(u, hprev):
            s = buf_sc[:, pl.ds(u * bt, bt)]
            diag = _shift_sub(hprev, jnp.float32(-GE)) + s
            e = jnp.maximum(hprev - go_f, e_sc[:] - ge_f)
            hng = jnp.maximum(ramp, jnp.maximum(diag, e))
            run = cummax(hng)
            f = _shift_sub(run, jnp.float32(NEG)) - goge
            hnew = jnp.maximum(hng, f)
            e_sc[:] = e
            buf_sc[:, pl.ds(u * bt, bt)] = hnew
            return hnew

        n_tiles = LT // U

        def tile_step(t, _):
            chars = tpk_ref[0, t, :]
            onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (ALPHA, U * bt), 0)
                == chars[None, :]).astype(jnp.bfloat16)
            hlast = hcarry_sc[:]
            buf_sc[:] = jnp.dot(prof, onehot,
                                preferred_element_type=jnp.float32) + ge_f
            if defer:
                hprev = hlast
                for u in range(U):
                    hprev = column(u, hprev)
                hcarry_sc[:] = hprev
                # deferred packed tracking over the whole tile
                cand = buf_sc[:] * PK + Cub
                candmax = jnp.max(cand, axis=0, keepdims=True)  # (1, U*BT)
                for u in range(U):
                    cm = candmax[:, u * bt:(u + 1) * bt]
                    colmax = jnp.floor(cm / PK)
                    amax = (PK - 1.0 - (cm - colmax * PK)).astype(jnp.int32)
                    better = colmax > best_sc[:]
                    bt_sc[:] = jnp.where(better, t * U + u, bt_sc[:])
                    bq_sc[:] = jnp.where(better, amax, bq_sc[:])
                    best_sc[:] = jnp.maximum(best_sc[:], colmax)
            else:
                hprev = hlast
                for u in range(U):
                    hnew = column(u, hprev)
                    htrue = hnew - ramp
                    cand = htrue * PK + (PK - 1.0 - subf)
                    cm = jnp.max(cand, axis=0, keepdims=True)
                    colmax = jnp.floor(cm / PK)
                    amax = (PK - 1.0 - (cm - colmax * PK)).astype(jnp.int32)
                    better = colmax > best_sc[:]
                    bt_sc[:] = jnp.where(better, t * U + u, bt_sc[:])
                    bq_sc[:] = jnp.where(better, amax, bq_sc[:])
                    best_sc[:] = jnp.maximum(best_sc[:], colmax)
                    hprev = hnew
                hcarry_sc[:] = hprev
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_step, 0)
        score_ref[:] = jnp.broadcast_to(best_sc[:],
                                        score_ref.shape).astype(jnp.int32)
        qend_ref[:] = jnp.broadcast_to(bq_sc[:], qend_ref.shape)
        tend_ref[:] = jnp.broadcast_to(bt_sc[:], tend_ref.shape)

    return kernel


def build(mode):
    rng = np.random.default_rng(0)
    prof = rng.integers(-4, 11, size=(LQ, ALPHA)).astype(np.float32)
    targets = rng.integers(0, 20, size=(LT, B)).astype(np.int32)
    tpk = pack_targets(targets, BT, U)
    nb = tpk.shape[0]
    kern = make_kernel(mode)
    call = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((LQ, ALPHA), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LT // U, U * BT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((8, BT), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((nb * 8, BT), jnp.int32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=[
            pltpu.VMEM((LQ, U * BT), jnp.float32),   # buf: stile then H
            pltpu.VMEM((LQ, BT), jnp.float32),       # E
            pltpu.VMEM((LQ // 8, BT), jnp.float32),  # group scratch
            pltpu.VMEM((1, BT), jnp.float32),
            pltpu.VMEM((1, BT), jnp.int32),
            pltpu.VMEM((1, BT), jnp.int32),
            pltpu.VMEM((LQ, BT), jnp.float32),       # h carry
        ],
    )
    f = jax.jit(lambda p, t: call(p, t))
    return f, (jnp.asarray(prof), jnp.asarray(tpk)), prof, targets


def bench(mode, iters=20):
    f, args, prof, targets = build(mode)
    outs = f(*args)
    s = np.asarray(outs[0]).reshape(-1, 8, BT)[:, 0, :].reshape(-1)[:B]
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = f(*args)
    np.asarray(outs[0])
    dt = time.perf_counter() - t0
    cells = B * LQ * LT
    return cells * iters / dt / 1e9, s


if __name__ == "__main__":
    # reference scores from the production kernel
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mmseqs2_tpu.ops.pallas_sw import sw_pallas
    rng = np.random.default_rng(0)
    prof = rng.integers(-4, 11, size=(LQ, ALPHA)).astype(np.float32)
    targets = rng.integers(0, 20, size=(LT, B)).astype(np.int32)
    want, wq, wt = sw_pallas(prof.T, targets, go=GO, ge=GE)
    want = np.asarray(want)
    for mode in ["flat", "hier", "hier_defer"]:
        try:
            g, s = bench(mode)
            ok = np.array_equal(s, want)
            print(f"{mode:12s} {g:8.1f} GCUPS  score_match={ok}")
            if not ok:
                bad = np.nonzero(s != want)[0][:5]
                print("   mismatches", bad, s[bad], want[bad])
        except Exception as e:
            print(f"{mode:12s} FAILED {type(e).__name__}: {e}")
