"""V6: cummax select -> subtract-kill; measure real GCUPS + correctness.

Variants:
  full        production cummax (roll + select + max per level)
  subkill     all levels: run = max(run, roll(run) - kill_l), kill_l
              precomputed 1e12 on rows < 2^l (kills wrapped values)
  subkill8    levels 0-2 select, levels >=3 subtract-kill

python experiments/sw_v6_subkill.py
"""

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
               h_sc, e_sc, stile_sc, best_sc, bq_sc, bt_sc):
        lq, bt = LQ, BT
        sub = jax.lax.broadcasted_iota(jnp.int32, (lq, bt), 0)
        subf = sub.astype(jnp.float32)
        prof = profile_ref[:].astype(jnp.bfloat16)
        go_f, ge_f = jnp.float32(GO), jnp.float32(GE)
        goge = jnp.float32(GO - GE)
        PK = jnp.float32(1024.0)
        subpart = PK - 1.0 - subf
        ramp = subf * ge_f
        nlev = 9
        masks = [sub >= (1 << l) for l in range(nlev)]
        kills = [jnp.where(sub < (1 << l), jnp.float32(KILL),
                           jnp.float32(0)) for l in range(nlev)]
        h_sc[:] = ramp
        e_sc[:] = ramp + jnp.float32(NEG)
        best_sc[:] = jnp.zeros_like(best_sc)
        bq_sc[:] = jnp.full_like(bq_sc, lq - 1)
        bt_sc[:] = jnp.full_like(bt_sc, -1)

        def cummax(run):
            for l in range(nlev):
                rolled = pltpu.roll(run, 1 << l, axis=0)
                if mode == "subkill" or (mode == "subkill8" and l >= 3):
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
            cand = htrue * PK + subpart
            candmax = jnp.max(cand, axis=0, keepdims=True)
            colmax = jnp.floor(candmax / PK)
            amax = (PK - 1.0 - (candmax - colmax * PK)).astype(jnp.int32)
            better = colmax > best_sc[:]
            bt_sc[:] = jnp.where(better, j, bt_sc[:])
            bq_sc[:] = jnp.where(better, amax, bq_sc[:])
            best_sc[:] = jnp.maximum(best_sc[:], colmax)

        n_tiles = LT // U

        def tile_step(t, _):
            chars = tpk_ref[0, t, :]
            onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (ALPHA, U * bt), 0)
                == chars[None, :]).astype(jnp.bfloat16)
            stile_sc[:] = jnp.dot(prof, onehot,
                                  preferred_element_type=jnp.float32) \
                + ge_f
            for u in range(U):
                column(t * U + u, stile_sc[:, pl.ds(u * bt, bt)])
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
    call = pl.pallas_call(
        make_kernel(mode),
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
            pltpu.VMEM((1, BT), jnp.float32),
            pltpu.VMEM((1, BT), jnp.int32),
            pltpu.VMEM((1, BT), jnp.int32),
        ],
    )
    return jax.jit(lambda p, t: call(p, t)), (jnp.asarray(prof),
                                              jnp.asarray(tpk))


def bench(mode, want, iters=20):
    f, args = build(mode)
    outs = f(*args)
    s = np.asarray(outs[0]).reshape(-1, 8, BT)[:, 0, :].reshape(-1)[:B]
    q = np.asarray(outs[1]).reshape(-1, 8, BT)[:, 0, :].reshape(-1)[:B]
    t = np.asarray(outs[2]).reshape(-1, 8, BT)[:, 0, :].reshape(-1)[:B]
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = f(*args)
    np.asarray(outs[0])
    dt = time.perf_counter() - t0
    cells = B * LQ * LT
    ok = (np.array_equal(s, want[0]) and np.array_equal(q, want[1])
          and np.array_equal(t, want[2]))
    return cells * iters / dt / 1e9, ok, (s, q, t)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "/root/repo")
    from mmseqs2_tpu.ops.pallas_sw import sw_pallas
    rng = np.random.default_rng(0)
    prof = rng.integers(-4, 11, size=(LQ, ALPHA)).astype(np.float32)
    targets = rng.integers(0, 20, size=(LT, B)).astype(np.int32)
    w = sw_pallas(prof.T, targets, go=GO, ge=GE)
    want = tuple(np.asarray(x) for x in w)
    for mode in ["full", "subkill", "subkill8"]:
        try:
            g, ok, got = bench(mode, want)
            print(f"{mode:10s} {g:8.1f} GCUPS  match={ok}")
            if not ok:
                bad = np.nonzero(got[0] != want[0])[0][:5]
                print("   score mismatches", bad, got[0][bad],
                      want[0][bad])
        except Exception as e:
            print(f"{mode:10s} FAILED {type(e).__name__}: {str(e)[:150]}")
