"""Pallas TPU kernels for the alignment DP cores.

The XLA `lax.scan` formulation (ops/dp.py) materializes its carried state in
HBM every target column — measured ~10 GCUPS/chip, HBM-bandwidth bound. These
kernels keep the whole DP state in VMEM across the column loop and use the
MXU for the substitution lookup (one-hot chars @ profile), so each column is
a few VPU passes over a (BT, Lq) tile:

  layout: batch tile BT on sublanes, query positions on lanes (f32 tiles);
  per column j:
    s    = onehot(targets[j]) @ profile        (BT,A)x(A,Lq) on the MXU
    E    = max(Hng - go, E - ge)
    Hng  = max(0, shift(H) + s, E)
    F    = exact lazy-F closure: shifted cummax of (Hng + i*ge) along lanes
    H    = max(Hng, F)
  plus end-position tracking with the reference tie-breaks (first column to
  reach the global max; smallest query index within it).

Semantics identical to dp.sw_scan / dp.gapless_scan (cross-checked in
tests/test_pallas.py); one query profile per call (the align stage batches
per query), many targets.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9   # plain float: jnp scalars would be captured as tracer consts


def _shift_lanes(x, fill):
    """Shift right by one along the lane (last) axis, filling with `fill`."""
    rolled = pltpu.roll(x, 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, fill, rolled)


def _cummax_lanes(x, lq):
    """Inclusive running max along the lane axis (log-step doubling)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < lq:
        rolled = pltpu.roll(x, d, axis=1)
        x = jnp.where(lane >= d, jnp.maximum(x, rolled), x)
        d *= 2
    return x


def _sw_kernel(profile_ref, targets_ref, score_ref, qend_ref, tend_ref,
               h_ref, hng_ref, e_ref, best_ref, bq_ref, bt_ref,
               *, lq, lt, go, ge, gapless, cap, pack):
    bt_tile = h_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt_tile, lq), 1)
    lanef = lane.astype(jnp.float32)
    # gapped state lives in "ramped space" (X' = X + lane*ge): the lazy-F
    # cummax then runs directly on Hng' with constant-only corrections,
    # saving the per-step ramp add/subtract
    ramp = lanef * jnp.float32(ge)
    zero_floor = jnp.zeros_like(ramp) if gapless else ramp
    h_ref[:] = zero_floor
    if not gapless:
        hng_ref[:] = ramp
        e_ref[:] = ramp + jnp.float32(NEG)
    best_ref[:] = jnp.zeros_like(best_ref)
    bq_ref[:] = jnp.full_like(bq_ref, lq - 1)
    bt_ref[:] = jnp.full_like(bt_ref, -1)

    prof = profile_ref[:]                        # (A, Lq) f32
    alpha = prof.shape[0]
    pk = 1024
    while pk < lq:
        pk *= 2
    PK = jnp.float32(pk)
    lanepart = PK - jnp.float32(1.0) - lanef     # (pk-1) - lane

    def step(j, _):
        chars = targets_ref[j, :]                # (BT,) int32
        onehot = (chars[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (bt_tile, alpha), 1)
                  ).astype(jnp.float32)
        s = jnp.dot(onehot, prof, preferred_element_type=jnp.float32)
        h = h_ref[:]
        if gapless:
            diag = _shift_lanes(h, jnp.float32(0)) + s
            hnew = jnp.clip(diag, 0.0, jnp.float32(cap))
            htrue = hnew
        else:
            # ramped: diag'[i] = h'[i-1] + s + ge; boundary h'(-1) = -ge
            diag = _shift_lanes(h, jnp.float32(-ge)) + (s + jnp.float32(ge))
            e = jnp.maximum(hng_ref[:] - go, e_ref[:] - ge)
            hng = jnp.maximum(ramp, jnp.maximum(diag, e))
            run = _cummax_lanes(hng, lq)
            f = _shift_lanes(run, jnp.float32(NEG)) - jnp.float32(go - ge)
            hnew = jnp.maximum(hng, f)
            e_ref[:] = e
            hng_ref[:] = hng
            htrue = hnew - ramp
        h_ref[:] = hnew
        if pack:
            # single packed reduce; decode keeps the strict-H update so a
            # tie on H keeps the earlier column j (reference tie-break)
            cand = htrue * PK + lanepart
            candmax = jnp.max(cand, axis=1, keepdims=True)
            colmax = jnp.floor(candmax / PK)
            amax = (PK - jnp.float32(1.0)
                    - (candmax - colmax * PK)).astype(jnp.int32)
        else:
            colmax = jnp.max(htrue, axis=1, keepdims=True)
            amax = jnp.min(jnp.where(htrue == colmax, lane, lq),
                           axis=1, keepdims=True)          # first max index
        better = colmax > best_ref[:]
        bt_ref[:] = jnp.where(better, j, bt_ref[:])
        bq_ref[:] = jnp.where(better, amax, bq_ref[:])
        best_ref[:] = jnp.maximum(best_ref[:], colmax)
        return 0

    jax.lax.fori_loop(0, lt, step, 0)
    score_ref[:] = best_ref[:].astype(jnp.int32)
    qend_ref[:] = bq_ref[:]
    tend_ref[:] = bt_ref[:]


def sw_pallas(profile, targets_t, go=11, ge=1, gapless=False, cap=255,
              interpret=False):
    """Batched SW (or gapless) scores + end positions for ONE query profile.

    profile:   (A, Lq) int32/float — substitution column scores (PAD rows
               very negative).
    targets_t: (Lt, B) int32 — transposed target batch (PAD letter rows map
               to very negative profile rows).
    Returns (score (B,), qend (B,), tend (B,)) int32, matching dp.sw_scan /
    dp.gapless_scan semantics.
    """
    # packed (score,qend) tracking is exact while score*PK + (PK-1) < 2^24
    # (f32 integer range), PK = the lane count rounded up to a power of two;
    # computed on the host so it can be a static kernel parameter
    lq = profile.shape[1]
    pk = 1024
    while pk < lq:
        pk *= 2
    if gapless:
        max_score_bound = cap
    else:
        max_score_bound = int(np.asarray(profile).max()) * lq
    pack = 0 <= max_score_bound < (1 << 24) // pk - 1
    return _sw_pallas_jit(profile, targets_t, go=go, ge=ge, gapless=gapless,
                          cap=cap, pack=pack, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("go", "ge", "gapless", "cap",
                                             "pack", "interpret"))
def _sw_pallas_jit(profile, targets_t, go, ge, gapless, cap, pack,
                   interpret):
    alpha, lq = profile.shape
    lt, b = targets_t.shape
    BT = 512 if b >= 512 else max(8, b)
    # VMEM: 3 state arrays + targets block must fit the 16M scoped limit
    while BT * lq * 4 * 3 + lt * BT * 4 > 12 * 1024 * 1024 and BT > 8:
        BT //= 2
    nb = -(-b // BT)
    pad_b = nb * BT - b
    if pad_b:
        targets_t = jnp.pad(targets_t, ((0, 0), (0, pad_b)),
                            constant_values=alpha - 1)
    prof_f = profile.astype(jnp.float32)

    kernel = functools.partial(_sw_kernel, lq=lq, lt=lt, go=go, ge=ge,
                               gapless=gapless, cap=cap, pack=pack)
    out_shape = [jax.ShapeDtypeStruct((nb * BT, 1), jnp.int32)] * 3
    score, qend, tend = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((alpha, lq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lt, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((BT, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BT, lq), jnp.float32),
            pltpu.VMEM((BT, lq), jnp.float32),
            pltpu.VMEM((BT, lq), jnp.float32),
            pltpu.VMEM((BT, 1), jnp.float32),
            pltpu.VMEM((BT, 1), jnp.int32),
            pltpu.VMEM((BT, 1), jnp.int32),
        ],
        interpret=interpret,
    )(prof_f, targets_t)
    return (score[:b, 0], qend[:b, 0], tend[:b, 0])
