"""V5 ablation: where does the gapped-tracked column time go?

Variants (all Lq=Lt=512, batch 4096, BT=512, U=8):
  full       current kernel semantics (gapped + packed tracking)
  notrack    gapped, no end tracking
  nocummax   gapped, cummax replaced by 1 level (WRONG results, cost probe)
  nof        gapped without any F closure (WRONG, cost probe)
  noonehot   one-hot built on host; kernel does matmul only
  noscore    score tile = constant (no one-hot, no matmul; WRONG, cost probe)
  gapless    gapless scan (existing)

python experiments/sw_v5_ablate.py
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
    onehot_in = mode == "noonehot"

    def kernel(profile_ref, tpk_ref, score_ref, h_sc, e_sc, stile_sc,
               best_sc, bq_sc, bt_sc):
        lq, bt = LQ, BT
        sub = jax.lax.broadcasted_iota(jnp.int32, (lq, bt), 0)
        subf = sub.astype(jnp.float32)
        prof = profile_ref[:].astype(jnp.bfloat16)
        go_f, ge_f, goge = jnp.float32(11), jnp.float32(1), jnp.float32(10)
        PK = jnp.float32(1024.0)
        subpart = PK - 1.0 - subf
        ramp = subf * ge_f
        nlev = 9 if mode not in ("nocummax",) else 1
        masks = [sub >= (1 << l) for l in range(nlev)]
        h_sc[:] = ramp
        e_sc[:] = ramp + jnp.float32(NEG)
        track = mode in ("full", "noonehot", "noscore", "nocummax", "nof")
        best_sc[:] = jnp.zeros_like(best_sc)
        bq_sc[:] = jnp.full_like(bq_sc, lq - 1)
        bt_sc[:] = jnp.full_like(bt_sc, -1)

        def column(j, s):
            h = h_sc[:]
            diag = _shift_sub(h, jnp.float32(-1)) + s
            e = jnp.maximum(h - go_f, e_sc[:] - ge_f)
            hng = jnp.maximum(ramp, jnp.maximum(diag, e))
            if mode == "nof":
                hnew = hng
            else:
                run = hng
                for l in range(nlev):
                    rolled = pltpu.roll(run, 1 << l, axis=0)
                    run = jnp.where(masks[l], jnp.maximum(run, rolled), run)
                f = _shift_sub(run, jnp.float32(NEG)) - goge
                hnew = jnp.maximum(hng, f)
            h_sc[:] = hnew
            e_sc[:] = e
            htrue = hnew - ramp
            if track and mode != "notrack":
                cand = htrue * PK + subpart
                candmax = jnp.max(cand, axis=0, keepdims=True)
                colmax = jnp.floor(candmax / PK)
                amax = (PK - 1.0 - (candmax - colmax * PK)).astype(jnp.int32)
                better = colmax > best_sc[:]
                bt_sc[:] = jnp.where(better, j, bt_sc[:])
                bq_sc[:] = jnp.where(better, amax, bq_sc[:])
                best_sc[:] = jnp.maximum(best_sc[:], colmax)
            else:
                best_sc[:] = jnp.maximum(best_sc[:],
                                         jnp.max(htrue, axis=0,
                                                 keepdims=True))

        n_tiles = LT // U

        def tile_step(t, _):
            if mode == "noscore":
                stile_sc[:] = jnp.float32(1.0) + jnp.float32(t)
            elif onehot_in:
                oh = tpk_ref[0, t].astype(jnp.bfloat16)   # (A, U*BT)
                stile_sc[:] = jnp.dot(prof, oh,
                                      preferred_element_type=jnp.float32)
            else:
                chars = tpk_ref[0, t, :]
                onehot = (jax.lax.broadcasted_iota(
                    jnp.int32, (ALPHA, U * BT), 0)
                    == chars[None, :]).astype(jnp.bfloat16)
                stile_sc[:] = jnp.dot(prof, onehot,
                                      preferred_element_type=jnp.float32)
            for u in range(U):
                column(t * U + u, stile_sc[:, pl.ds(u * BT, BT)])
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_step, 0)
        score_ref[:] = jnp.broadcast_to(best_sc[:],
                                        score_ref.shape).astype(jnp.int32)

    return kernel


def build(mode):
    rng = np.random.default_rng(0)
    prof = rng.integers(-4, 11, size=(LQ, ALPHA)).astype(np.float32)
    targets = rng.integers(0, 20, size=(LT, B)).astype(np.int32)
    tpk = pack_targets(targets, BT, U)
    nb = tpk.shape[0]
    if mode == "noonehot":
        oh = np.zeros((nb, LT // U, ALPHA, U * BT), np.int8)
        for ib in range(nb):
            for t in range(LT // U):
                oh[ib, t][tpk[ib, t] % ALPHA,
                          np.arange(U * BT)] = 1
        tin = jnp.asarray(oh)
        in_spec = pl.BlockSpec((1, LT // U, ALPHA, U * BT),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        # (nb, tiles, A, U*BT) int8: but kernel indexes tpk_ref[0, t] ->
        # shape (A, U*BT)
    else:
        tin = jnp.asarray(tpk)
        in_spec = pl.BlockSpec((1, LT // U, U * BT), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)

    kern = make_kernel(mode)
    call = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((LQ, ALPHA), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            in_spec,
        ],
        out_specs=pl.BlockSpec((8, BT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * 8, BT), jnp.int32),
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
    f = jax.jit(lambda p, t: call(p, t))
    return f, (jnp.asarray(prof), tin)


def bench(mode, iters=20):
    f, args = build(mode)
    r = f(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    np.asarray(r)
    dt = time.perf_counter() - t0
    cells = B * LQ * LT
    return cells * iters / dt / 1e9


if __name__ == "__main__":
    for mode in ["full", "notrack", "nocummax", "nof", "noonehot",
                 "noscore"]:
        try:
            print(f"{mode:10s} {bench(mode):8.1f} GCUPS")
        except Exception as e:
            print(f"{mode:10s} FAILED {type(e).__name__}: {e}")
