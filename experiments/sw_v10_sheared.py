"""Experiment: SHEARED-layout gapless scan.

Current gapless kernel pays per column: sublane roll + row-0 select +
add + relu (+ running-max) over the (Lq, BT) state = ~5 VPU ops/cell.
Sheared reindexing r = (i - j) mod R (R = Lq+1 padded) makes the diagonal
dependency SAME-SUBLANE: Hs[r, j] = relu(Hs[r, j-1] + s[(r+j) mod R, c_j])
— no roll, no select, 3 ops/cell (add, relu, hm max). The shear moves to
the substitution side: the profile stack (R, U*A) holds U rotations of
the profile and advances by one pltpu.roll of (R, U*A) per U-column tile
(A/BT ops/cell). A pad row (score -2^16) between query end and wrap makes
diagonals restart cleanly when they cross the bottom boundary.

MXU cost rises from A to U*A MACs/cell (the one-hot row index becomes
u*A + char), so small U is better for the MXU while large U amortizes
the stack roll; sweep U.

Run: python experiments/sw_v10_sheared.py [U ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_SCORE = -65536.0


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


def pack_targets(targets_t, BT, U):
    lt, b = targets_t.shape
    nb = -(-b // BT)
    pad_b = nb * BT - b
    pad_t = (-lt) % U
    tp = jnp.pad(targets_t, ((0, pad_t), (0, pad_b)), mode="edge") \
        if (pad_t or pad_b) else targets_t
    ltp = lt + pad_t
    x = tp.reshape(ltp // U, U, nb, BT).transpose(2, 0, 1, 3)
    return x.reshape(nb, ltp // U, U * BT)


def kernel(prof_ref, tpk_ref, out_ref, h_ref, hm_ref, stack_ref, stile_ref,
           *, R, lt, bt, U, A, cap, no_roll=False, no_mxu=False,
           no_hm=False):
    prof = prof_ref[:]                               # (R, A) f32
    for u in range(U):
        stack_ref[:, u * A:(u + 1) * A] = (
            pltpu.roll(prof, (R - u) % R, axis=0))
    h_ref[:] = jnp.zeros_like(h_ref)
    hm_ref[:] = jnp.zeros_like(hm_ref)
    ub = U * bt
    u_of = jax.lax.broadcasted_iota(jnp.int32, (1, ub), 1) // bt

    n_tiles = -(-lt // U)

    def tile_step(t, _):
        chars = tpk_ref[0, t, :].astype(jnp.int32)
        idx = u_of[0] * A + chars
        if not no_mxu:
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (U * A, ub), 0)
                      == idx[None, :]).astype(jnp.bfloat16)
            stile_ref[:] = jnp.dot(stack_ref[:].astype(jnp.bfloat16),
                                   onehot,
                                   preferred_element_type=jnp.float32)
        for u in range(U):
            s = stile_ref[:, pl.ds(u * bt, bt)]
            h = jnp.maximum(h_ref[:] + s, 0.0)
            h_ref[:] = h
            if not no_hm:
                hm_ref[:] = jnp.maximum(hm_ref[:], h)
        if not no_roll:
            stack_ref[:] = pltpu.roll(stack_ref[:], (R - U) % R, axis=0)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_step, 0)
    hm = jnp.max(hm_ref[:], axis=0, keepdims=True)
    hm = jnp.minimum(hm, jnp.float32(cap))
    out_ref[:] = jnp.broadcast_to(hm, out_ref.shape).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("U", "bt", "cap", "no_roll",
                                              "no_mxu", "no_hm"))
def sheared_gapless(profile, targets_t, *, U=4, bt=512, cap=255,
                    no_roll=False, no_mxu=False, no_hm=False):
    """profile: (A, Lq) int; targets_t: (Lt, B) int. Returns (B,) i32."""
    A = 32
    prof = jnp.asarray(profile).astype(jnp.float32)
    a0, lq = prof.shape
    R = ((lq + 1 + 7) // 8) * 8
    prof_t = jnp.full((R, A), PAD_SCORE, jnp.float32)
    prof_t = prof_t.at[:lq, :a0].set(prof.T)
    targets_t = jnp.asarray(targets_t)
    lt, b = targets_t.shape
    tpk = pack_targets(targets_t, bt, U).astype(jnp.int32)
    nb, n_tiles, ub = tpk.shape
    out = pl.pallas_call(
        functools.partial(kernel, R=R, lt=lt, bt=bt, U=U, A=A, cap=cap,
                          no_roll=no_roll, no_mxu=no_mxu, no_hm=no_hm),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((R, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, ub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, bt), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * 8, bt), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=[
            pltpu.VMEM((R, bt), jnp.float32),
            pltpu.VMEM((R, bt), jnp.float32),
            pltpu.VMEM((R, U * A), jnp.float32),
            pltpu.VMEM((R, U * bt), jnp.float32),
        ],
    )(prof_t, tpk)
    return out.reshape(nb, 8, bt)[:, 0, :].reshape(-1)[:b]


def main():
    rng = np.random.default_rng(0)
    alpha, lq, lt = 32, 512, 512
    batch = 16384 if jax.default_backend() != "cpu" else 1024
    profile = rng.integers(-4, 11, size=(alpha, lq)).astype(np.int32)
    targets = rng.integers(0, 20, size=(lt, batch)).astype(np.int32)
    cells = batch * lq * lt

    # correctness vs existing kernel
    sys.path.insert(0, "/root/repo")
    from mmseqs2_tpu.ops.pallas_sw import gapless_pallas_score
    small_t = targets[:, :1024]
    want = np.asarray(gapless_pallas_score(profile, small_t))
    for U in ([int(x) for x in sys.argv[1:]] or [2, 4, 8]):
        got = np.asarray(sheared_gapless(profile, small_t, U=U))
        ok = np.array_equal(got, want)
        print(f"U={U}: correct={ok}" + (
            "" if ok else f"  maxdiff={np.abs(got-want).max()}"))
        if not ok:
            bad = np.nonzero(got != want)[0][:5]
            print("   first bad lanes:", bad, got[bad], want[bad])
            continue
        g = bench(lambda p, t: sheared_gapless(p, t, U=U),
                  (jnp.asarray(profile), jnp.asarray(targets)), cells)
        print(f"   sheared U={U}: {g:.1f} GCUPS")
        for kw in ({"no_roll": True}, {"no_mxu": True}, {"no_hm": True},
                   {"no_roll": True, "no_mxu": True}):
            g = bench(lambda p, t: sheared_gapless(p, t, U=U, **kw),
                      (jnp.asarray(profile), jnp.asarray(targets)), cells)
            print(f"     ablate {kw}: {g:.1f} GCUPS")
    g0 = bench(lambda p, t: gapless_pallas_score(p, t),
               (jnp.asarray(profile), jnp.asarray(targets)), cells)
    print(f"   current gapless: {g0:.1f} GCUPS")


if __name__ == "__main__":
    main()
