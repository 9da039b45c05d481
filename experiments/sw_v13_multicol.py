"""Experiment: K-column-composed gapless scan.

The gapless recurrence H_j(i) = relu(H_{j-1}(i-1) + s_j(i)) pays one
sublane roll + boundary select PER COLUMN (2 of its 5 VPU ops/cell).
Composing K columns into one step rolls ONCE by K and applies K
pre-shifted substitution columns:

    T_0 = roll_down_K(H), top K rows := 0
    T_{r+1} = relu(T_r + s_{j+r} shifted down by (K-1-r))    r=0..K-1
    H' = T_K        (column j+K-1, unshifted)

The shifted substitution columns come from ONE MXU matmul against a
stack of K row-shifted profile copies (one-hot row index r*A + char —
the same multi-block trick as the multi-query kernel); rows above the
shift are PAD (very negative) so relu reproduces the H(i<0)=0 boundary.
The state grows by K-1 pad rows so intermediate columns' bottom cells
stay inside the tile (they appear shifted; a row-shift doesn't change
the per-lane running max, which is all the scan reports).

Ops/cell at K=4: (roll+select + 4 add + 4 relu + 4 max)/4 = 3.5 vs 5.
Exact: same f32 arithmetic, same relu chain, order preserved per lane.

Run: python experiments/sw_v13_multicol.py [K ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = -1e9


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


def kernel(prof_ref, tpk_ref, out_ref, h_ref, hm_ref, stile_ref,
           *, lqp, lt, bt, U, K, A, cap):
    # prof_ref: (lqp, K*A) — K row-shifted profile copies, block r
    # shifted down by (K-1-r), pad rows very negative
    prof = prof_ref[:].astype(jnp.bfloat16)
    ub = U * bt
    h_ref[:] = jnp.zeros_like(h_ref)
    hm_ref[:] = jnp.zeros_like(hm_ref)
    sub = jax.lax.broadcasted_iota(jnp.int32, (lqp, bt), 0)
    topk = sub < K
    u_of = jax.lax.broadcasted_iota(jnp.int32, (1, ub), 1) // bt

    n_tiles = -(-lt // U)
    n_groups = U // K

    def tile_step(t, _):
        chars = tpk_ref[0, t, :].astype(jnp.int32)
        idx = (u_of[0] % K) * A + chars
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (K * A, ub), 0)
                  == idx[None, :]).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(prof, onehot,
                               preferred_element_type=jnp.float32)
        for g in range(n_groups):
            t0 = pltpu.roll(h_ref[:], K, axis=0)
            cur = jnp.where(topk, jnp.float32(0), t0)
            hm = hm_ref[:]
            for r in range(K):
                s = stile_ref[:, pl.ds((g * K + r) * bt, bt)]
                cur = jnp.maximum(cur + s, 0.0)
                hm = jnp.maximum(hm, cur)
            h_ref[:] = cur
            hm_ref[:] = hm
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_step, 0)
    hm = jnp.max(hm_ref[:], axis=0, keepdims=True)
    hm = jnp.minimum(hm, jnp.float32(cap))
    out_ref[:] = jnp.broadcast_to(hm, out_ref.shape).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("U", "K", "bt", "cap"))
def multicol_gapless(profile, targets_t, *, U=8, K=4, bt=512, cap=255):
    A = 32
    prof = jnp.asarray(profile).astype(jnp.float32)
    a0, lq = prof.shape
    lqp = ((lq + K - 1 + 7) // 8) * 8
    # stack of K shifted copies: block r rows [K-1-r, K-1-r+lq) = prof
    stack = jnp.full((lqp, K * A), PAD, jnp.float32)
    pt = prof.T
    for r in range(K):
        sh = K - 1 - r
        stack = stack.at[sh:sh + lq, r * A:r * A + a0].set(pt)
    targets_t = jnp.asarray(targets_t)
    lt, b = targets_t.shape
    tpk = pack_targets(targets_t, bt, U).astype(jnp.int32)
    nb, n_tiles, ub = tpk.shape
    out = pl.pallas_call(
        functools.partial(kernel, lqp=lqp, lt=lt, bt=bt, U=U, K=K, A=A,
                          cap=cap),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((lqp, K * A), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, ub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, bt), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * 8, bt), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=[
            pltpu.VMEM((lqp, bt), jnp.float32),
            pltpu.VMEM((lqp, bt), jnp.float32),
            pltpu.VMEM((lqp, U * bt), jnp.float32),
        ],
    )(stack, tpk)
    return out.reshape(nb, 8, bt)[:, 0, :].reshape(-1)[:b]


def main():
    rng = np.random.default_rng(0)
    alpha, lq, lt = 32, 512, 512
    batch = 16384 if jax.default_backend() != "cpu" else 1024
    profile = rng.integers(-4, 11, size=(alpha, lq)).astype(np.int32)
    targets = rng.integers(0, 20, size=(lt, batch)).astype(np.int32)
    cells = batch * lq * lt

    sys.path.insert(0, "/root/repo")
    from mmseqs2_tpu.ops.pallas_sw import gapless_pallas_score
    small_t = targets[:, :1024]
    want = np.asarray(gapless_pallas_score(profile, small_t))
    for K in ([int(x) for x in sys.argv[1:]] or [2, 4, 8]):
        U = max(8, K)
        try:
            got = np.asarray(multicol_gapless(profile, small_t, U=U, K=K))
            ok = np.array_equal(got, want)
            tag = "exact" if ok else f"MAXDIFF={np.abs(got - want).max()}"
            if not ok:
                bad = np.nonzero(got != want)[0][:5]
                print("   bad lanes:", bad, got[bad], want[bad])
            g = bench(lambda p, t: multicol_gapless(p, t, U=U, K=K),
                      (jnp.asarray(profile), jnp.asarray(targets)), cells)
            print(f"multicol K={K} U={U}: {g:8.1f} GCUPS  [{tag}]",
                  flush=True)
        except Exception as e:
            print(f"multicol K={K}: FAIL {str(e)[:110]}", flush=True)
    g0 = bench(gapless_pallas_score,
               (jnp.asarray(profile), jnp.asarray(targets)), cells)
    print(f"current f32       : {g0:8.1f} GCUPS  [ref]")


if __name__ == "__main__":
    main()
