"""V3: register-resident DP sub-tiles.

Structure per grid block (BT batch rows):
  for t in tiles (U columns):                 # fori
    stile = onehot(chars) @ prof              # one (U*BT, A)@(A, Lq) matmul
    for sb in range(BT//8):                   # fori, state refs in VMEM
      h = state[sb]                           # (8, Lq) -> 4 vregs
      for u in range(U):                      # UNROLLED -> registers
        s = stile[u*BT + sb*8 ...]            # the only VMEM read
        h = dp_step(h, s)
      state[sb] = h

Run: python experiments/sw_v3.py [gapless3|sw3] ...
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
SB = 8


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


def _gapless3_kernel(profile_ref, tpk_ref, score_ref, hs_ref, hm_ref,
                     stile_ref, *, lq, n_tiles, cap, unroll, bt):
    lane = jax.lax.broadcasted_iota(jnp.int32, (SB, lq), 1)
    first = lane == 0
    prof = profile_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[0]
    ub = unroll * bt
    hs_ref[:] = jnp.zeros_like(hs_ref)
    hm_ref[:] = jnp.zeros_like(hm_ref)
    capf = jnp.float32(cap)

    def tile_step(t, _):
        chars = tpk_ref[0, t, :]
        onehot = (chars[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (ub, alpha), 1)
                  ).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(onehot, prof,
                               preferred_element_type=jnp.float32)

        def sb_step(sb, _):
            r0 = sb * SB
            h = hs_ref[pl.ds(r0, SB), :]
            hm = hm_ref[pl.ds(r0, SB), :]
            for u in range(unroll):
                s = stile_ref[pl.ds(u * bt + r0, SB), :]
                hsh = jnp.where(first, 0.0, pltpu.roll(h, 1, axis=1))
                h = jnp.minimum(jnp.maximum(hsh + s, 0.0), capf)
                hm = jnp.maximum(hm, h)
            hs_ref[pl.ds(r0, SB), :] = h
            hm_ref[pl.ds(r0, SB), :] = hm
            return 0

        jax.lax.fori_loop(0, bt // SB, sb_step, 0)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_step, 0)
    score_ref[:] = jnp.max(hm_ref[:], axis=1, keepdims=True).astype(
        jnp.int32)


def gapless3(profile, tpk, b, cap=255, unroll=64, BT=64):
    alpha, lq = profile.shape
    nb, n_tiles, ub = tpk.shape
    kernel = functools.partial(_gapless3_kernel, lq=lq, n_tiles=n_tiles,
                               cap=cap, unroll=unroll, bt=BT)
    score = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((alpha, lq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, ub), lambda i: (i, 0, 0),
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


def _sw3_kernel(profile_ref, tpk_ref, score_ref, hs_ref, es_ref, hm_ref,
                stile_ref, *, lq, n_tiles, go, ge, unroll, bt):
    lane = jax.lax.broadcasted_iota(jnp.int32, (SB, lq), 1)
    first = lane == 0
    ramp = lane.astype(jnp.float32) * jnp.float32(ge)
    nlev = max(1, (lq - 1).bit_length())
    masks = [lane >= (1 << l) for l in range(nlev)]
    prof = profile_ref[:].astype(jnp.bfloat16)
    alpha = prof.shape[0]
    ub = unroll * bt
    go_f = jnp.float32(go)
    ge_f = jnp.float32(ge)
    goge = jnp.float32(go - ge)
    hs_ref[:] = jnp.tile(ramp, (bt // SB, 1))
    es_ref[:] = jnp.tile(ramp + jnp.float32(NEG), (bt // SB, 1))
    hm_ref[:] = jnp.zeros_like(hm_ref)

    def tile_step(t, _):
        chars = tpk_ref[0, t, :]
        onehot = (chars[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (ub, alpha), 1)
                  ).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(onehot, prof,
                               preferred_element_type=jnp.float32)

        def sb_step(sb, _):
            r0 = sb * SB
            h = hs_ref[pl.ds(r0, SB), :]
            e = es_ref[pl.ds(r0, SB), :]
            hm = hm_ref[pl.ds(r0, SB), :]
            for u in range(unroll):
                s = stile_ref[pl.ds(u * bt + r0, SB), :]
                diag = jnp.where(first, -ge_f,
                                 pltpu.roll(h, 1, axis=1)) + s
                e = jnp.maximum(h - go_f, e - ge_f)
                hng = jnp.maximum(ramp, jnp.maximum(diag, e))
                hm = jnp.maximum(hm, hng)
                run = hng
                for l in range(nlev):
                    rolled = pltpu.roll(run, 1 << l, axis=1)
                    run = jnp.where(masks[l], jnp.maximum(run, rolled), run)
                f = jnp.where(first, jnp.float32(NEG),
                              pltpu.roll(run, 1, axis=1)) - goge
                h = jnp.maximum(hng, f)
            hs_ref[pl.ds(r0, SB), :] = h
            es_ref[pl.ds(r0, SB), :] = e
            hm_ref[pl.ds(r0, SB), :] = hm
            return 0

        jax.lax.fori_loop(0, bt // SB, sb_step, 0)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_step, 0)
    ramp_full = jnp.tile(ramp, (bt // SB, 1))
    score_ref[:] = jnp.max(hm_ref[:] - ramp_full, axis=1,
                           keepdims=True).astype(jnp.int32)


def sw3(profile, tpk, b, go=11, ge=1, unroll=64, BT=64):
    alpha, lq = profile.shape
    nb, n_tiles, ub = tpk.shape
    prof_plus = profile.astype(jnp.float32) + jnp.float32(ge)
    prof_plus = prof_plus.at[31, :].set(-1e4)
    kernel = functools.partial(_sw3_kernel, lq=lq, n_tiles=n_tiles, go=go,
                               ge=ge, unroll=unroll, bt=BT)
    score = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((alpha, lq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, ub), lambda i: (i, 0, 0),
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
def check(kind, u, bt):
    sys.path.insert(0, "/root/repo")
    from mmseqs2_tpu.ops import dp
    rng = np.random.default_rng(1)
    alpha, lq, lt, b = 32, 128, 96, 64
    prof = rng.integers(-6, 5, size=(alpha, lq)).astype(np.int32)
    prof[20:, :] = -128
    tgt = rng.integers(0, 20, size=(lt, b)).astype(np.int32)
    tpk, _ = pack_targets(tgt, bt, u)
    if kind == "gapless3":
        got = np.asarray(gapless3(jnp.asarray(prof), jnp.asarray(tpk), b,
                                  unroll=u, BT=bt)).reshape(-1)
        want = np.asarray(dp.gapless_scan(
            jnp.asarray(prof)[None], jnp.zeros(b, jnp.int32),
            jnp.asarray(tgt).T, jnp.full(b, 255, jnp.int32))[0]).reshape(-1)
    else:
        got = np.asarray(sw3(jnp.asarray(prof), jnp.asarray(tpk), b,
                             unroll=u, BT=bt)).reshape(-1)
        want = np.asarray(dp.sw_scan(
            jnp.asarray(prof)[None], jnp.zeros(b, jnp.int32),
            jnp.asarray(tgt).T, 11, 1)[0]).reshape(-1)
    ok = np.array_equal(got, want)
    print(f"  check: {'OK' if ok else 'MISMATCH'}"
          + ("" if ok else f" got={got[:8]} want={want[:8]}"), flush=True)


def main():
    rng = np.random.default_rng(0)
    alpha, lq, lt, batch = 32, 512, 512, 4096
    profile = rng.integers(-4, 11, size=(alpha, lq)).astype(np.int32)
    targets_t = rng.integers(0, 20, size=(lt, batch)).astype(np.int32)

    for v in (sys.argv[1:] or ["gapless3-64-64", "sw3-64-64"]):
        kind, u, bt = v.split("-")[0], int(v.split("-")[1]), int(
            v.split("-")[2])
        check(kind, u, bt)
        tpk, _ = pack_targets(targets_t, bt, u)
        tpk_d = jnp.asarray(tpk)
        prof_d = jnp.asarray(profile)
        if kind == "gapless3":
            f = jax.jit(functools.partial(gapless3, b=batch, unroll=u,
                                          BT=bt))
        else:
            f = jax.jit(functools.partial(sw3, b=batch, unroll=u, BT=bt))
        for _ in range(2):
            np.asarray(f(prof_d, tpk_d))
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            np.asarray(f(prof_d, tpk_d))
        dt = time.perf_counter() - t0
        g = batch * lq * lt * iters / dt / 1e9
        print(f"{v}: {g:.1f} GCUPS", flush=True)


if __name__ == "__main__":
    main()
