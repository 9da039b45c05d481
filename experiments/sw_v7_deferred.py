"""V7: deferred per-cell packed tracking vs per-column reduce.

The production tracked kernel does a cross-sublane max-reduce of the
(Lq, BT) tile EVERY column (packed score*PK+pos). V7 instead keeps a
per-cell running max of packed (htrue * PKT + (PKT-1-j)) — 3 VPU ops per
column — and does ONE cross-sublane reduce at the very end:
  packmax = max over (i) of percell  -> (max score, then min j)
  qend    = min i where percell == packmax
Tie-breaks match dp.sw_scan: first column to reach the global max,
smallest query index within it.

Variants benchmarked:
  prod      current production kernel (per-column packed reduce)
  deferred  per-cell packed running max, single final reduce
  defsub    deferred + subtract-kill cummax

python experiments/sw_v7_deferred.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
KILL = 1e12
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
    def kernel(profile_ref, tpk_ref, score_ref, qend_ref, tend_ref,
               h_sc, e_sc, stile_sc, cell_sc, best_sc, bq_sc, bt_sc):
        lq, bt = LQ, BT
        sub = jax.lax.broadcasted_iota(jnp.int32, (lq, bt), 0)
        subf = sub.astype(jnp.float32)
        first = sub == 0
        prof = profile_ref[:].astype(jnp.bfloat16)
        go_f, ge_f = jnp.float32(GO), jnp.float32(GE)
        goge = jnp.float32(GO - GE)
        PKQ = jnp.float32(1024.0)
        PKT = jnp.float32(512.0)
        subpart = PKQ - 1.0 - subf
        ramp = subf * ge_f
        nlev = 9
        masks = [sub >= (1 << l) for l in range(nlev)]
        kills = [jnp.where(sub < (1 << l), jnp.float32(KILL),
                           jnp.float32(0)) for l in range(nlev)]
        h_sc[:] = ramp
        e_sc[:] = ramp + jnp.float32(NEG)
        if mode == "prod":
            best_sc[:] = jnp.zeros_like(best_sc)
            bq_sc[:] = jnp.full_like(bq_sc, LQ - 1)
            bt_sc[:] = jnp.full_like(bt_sc, -1)
        else:
            cell_sc[:] = jnp.zeros_like(cell_sc)

        def cummax(run):
            for l in range(nlev):
                rolled = pltpu.roll(run, 1 << l, axis=0)
                if mode == "defsub":
                    run = jnp.maximum(run, rolled - kills[l])
                else:
                    run = jnp.where(masks[l], jnp.maximum(run, rolled),
                                    run)
            return run

        def column(j, s):
            h = h_sc[:]
            diag = _shift_sub(h, jnp.float32(-GE)) + s
            e = jnp.maximum(h - go_f, e_sc[:] - ge_f)
            hng = jnp.maximum(ramp, jnp.maximum(diag, e))
            run = cummax(hng)
            f = _shift_sub(run, jnp.float32(NEG)) - goge
            hnew = jnp.maximum(hng, f)
            h_sc[:] = hnew
            e_sc[:] = e
            htrue = hnew - ramp
            if mode == "prod":
                cand = htrue * PKQ + subpart
                candmax = jnp.max(cand, axis=0, keepdims=True)
                colmax = jnp.floor(candmax / PKQ)
                amax = (PKQ - 1.0
                        - (candmax - colmax * PKQ)).astype(jnp.int32)
                better = colmax > best_sc[:]
                bt_sc[:] = jnp.where(better, j, bt_sc[:])
                bq_sc[:] = jnp.where(better, amax, bq_sc[:])
                best_sc[:] = jnp.maximum(best_sc[:], colmax)
            else:
                cand = htrue * PKT + jnp.float32(PKT - 1.0 - j)
                cell_sc[:] = jnp.maximum(cell_sc[:], cand)

        def stile_for(t):
            chars = tpk_ref[0, t, :]
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (ALPHA, U * BT), 0)
                      == chars[None, :]).astype(jnp.bfloat16)
            stile_sc[:] = jnp.dot(prof, onehot,
                                  preferred_element_type=jnp.float32)

        def tile_step(t, _):
            stile_for(t)
            for u in range(U):
                column(t * U + u, stile_sc[:, pl.ds(u * BT, BT)])
            return 0

        jax.lax.fori_loop(0, LT // U, tile_step, 0)

        if mode == "prod":
            score_ref[:] = jnp.broadcast_to(
                best_sc[:], score_ref.shape).astype(jnp.int32)
            qend_ref[:] = jnp.broadcast_to(bq_sc[:], qend_ref.shape)
            tend_ref[:] = jnp.broadcast_to(bt_sc[:], tend_ref.shape)
        else:
            cell = cell_sc[:]
            pm = jnp.max(cell, axis=0, keepdims=True)
            score = jnp.floor(pm / PKT)
            tend = (PKT - 1.0 - (pm - score * PKT)).astype(jnp.int32)
            qend = jnp.min(jnp.where(cell == pm, sub, LQ), axis=0,
                           keepdims=True)
            score_ref[:] = jnp.broadcast_to(
                score, score_ref.shape).astype(jnp.int32)
            qend_ref[:] = jnp.broadcast_to(qend, qend_ref.shape)
            tend_ref[:] = jnp.broadcast_to(tend, tend_ref.shape)

    return kernel


def run(mode, prof_t, tpk):
    nb = tpk.shape[0]
    kernel = make_kernel(mode)
    outs = pl.pallas_call(
        kernel,
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
            pltpu.VMEM((LQ, BT), jnp.float32),
            pltpu.VMEM((LQ, BT), jnp.float32),
            pltpu.VMEM((LQ, U * BT), jnp.float32),
            pltpu.VMEM((LQ, BT), jnp.float32),
            pltpu.VMEM((1, BT), jnp.float32),
            pltpu.VMEM((1, BT), jnp.int32),
            pltpu.VMEM((1, BT), jnp.int32),
        ],
    )(prof_t, tpk)
    return [o.reshape(nb, 8, BT)[:, 0, :].reshape(-1) for o in outs]


def main():
    rng = np.random.default_rng(0)
    profile = rng.integers(-4, 11, size=(ALPHA, LQ)).astype(np.int32)
    targets_t = rng.integers(0, 20, size=(LT, B)).astype(np.int32)
    prof_t = jnp.asarray((profile + GE).T.astype(np.float32))
    tpk = jnp.asarray(pack_targets(targets_t, BT, U))
    cells = B * LQ * LT

    ref = None
    for mode in ["prod", "deferred", "defsub"]:
        f = jax.jit(functools.partial(run, mode))
        outs = [np.asarray(o) for o in f(prof_t, tpk)]
        if ref is None:
            ref = outs
            ok = "ref"
        else:
            ok = all(np.array_equal(a, b) for a, b in zip(ref, outs))
        # async-dispatch timing
        for _ in range(2):
            np.asarray(f(prof_t, tpk)[0])
        t0 = time.perf_counter()
        it = 20
        r = None
        for _ in range(it):
            r = f(prof_t, tpk)
        np.asarray(r[0])
        dt = time.perf_counter() - t0
        print(f"{mode:10s} {cells * it / dt / 1e9:8.1f} GCUPS  match={ok}")


if __name__ == "__main__":
    main()
