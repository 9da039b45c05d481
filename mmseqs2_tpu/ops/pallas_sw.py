"""Pallas TPU kernels for the alignment DP cores (transposed layout).

Round-2 redesign after profiling on v5e: the DP state lives as (Lq, BT)
tiles with query positions on SUBLANES and the target batch on LANES.
Rationale (measured, experiments/sw_v4.py):
  - cross-query-position shifts (the diagonal shift and the lazy-F cummax)
    become sublane rolls, ~6x cheaper than lane rolls on this core;
  - the substitution lookup is one bf16 MXU matmul per U-column tile:
    profT (Lq, A) @ onehot (A, U*BT), read back one (Lq, BT) slice per
    column — score-tile traffic is the only per-cell VMEM cost;
  - per-call dispatch overhead through the runtime is ~25ms, so callers
    should batch large and measure with async dispatch (see bench.py).
Measured on TPU v5e (batch 16384, Lq=Lt=512, best-of-3 async trials):
~195 GCUPS gapped with end tracking, ~215 gapped score-only, ~625 gapless
score-only (round 3: tiled lazy-F closure + deferred gapless saturation;
round 2 was 146/—/576, round 1's lane-layout kernel ~22).

Round-5 ceiling study — alternatives MEASURED SLOWER than this kernel, do
not re-attempt without new toolchain evidence (experiments/sw_v10..v13):
  - bf16/f16/i16/i32 DP state: f16 and i16 do not compile (Mosaic:
    reductions/elementwise unsupported), bf16 compiles except
    pltpu.roll-on-sublanes and runs ~0.75x f32 via slice-store or concat
    shifts (441-523 vs 575 GCUPS gapless) — the VPU does not double-pump
    sub-32-bit elementwise through this toolchain, so dtype narrowing
    buys nothing (sw_v8, bf16_bisect, sw_v12).
  - sheared layout (diag dep made same-sublane, zero rolls in the inner
    loop): 527 vs 577 GCUPS — removing the roll+select does not help
    because the kernel is not op-count-bound (sw_v10).
  - K-column composition (one roll per K columns against K statically
    row-shifted profile copies in one MXU lookup, 5 -> 3.5 ops/cell at
    K=4, exact): 546-557 vs 577 (sw_v13).
  Ablations bound the bare 3-op relu chain at ~594 GCUPS, i.e. the
  gapless kernel runs within ~5% of what Mosaic schedules for ANY
  (Lq, BT)-tile column walk on this core; the gapped kernel adds the
  lazy-F closure on top of the same floor. Further wins must come from
  batching/overlap (dispatch pipelining, bigger batches), not the
  per-cell instruction stream.

Semantics identical to dp.sw_scan / dp.gapless_scan (cross-checked in
tests/test_pallas.py): one query profile per call, many targets; affine
gaps via the ramped-space lazy-F closure (a sublane cummax); end-position
tracking reproduces the reference tie-breaks (first column to reach the
global max, smallest query index within it) via packed (score, position)
max-reduction.

Reference the kernels replace: striped SSW (StripedSmithWaterman.cpp:99-479)
and libmarv's GPU gapless/gapped scans (lib/libmarv, ungappedprefilter.cpp).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .aot_cache import aot_call, source_hash

NEG = -1e9
DEFAULT_BT = 512
DEFAULT_U = 8
_SRC = source_hash(__file__)


def _sw_exec(args, **static):
    """_sw_call through the AOT executable cache: skips the multi-second
    per-shape Pallas re-trace in every fresh process (see aot_cache)."""
    if static.get("interpret"):
        return _sw_call(*args, **static)
    return aot_call(
        lambda: _sw_call.lower(*args, **static).compile(),
        ("sw", _SRC, tuple(sorted(static.items()))), args,
        lambda *a: _sw_call(*a, **static))


def pack_targets(targets_t, BT: int, U: int):
    """(Lt, B) -> (nb, ceil(Lt/U), U*BT): row t holds the chars of columns
    t*U..t*U+U-1 for one BT-batch block, laid out as [u*BT + b] so the
    kernel builds a tall one-hot from a single row slice. Runs on device
    (jnp) so repeated calls don't re-transfer the batch."""
    lt, b = targets_t.shape
    nb = -(-b // BT)
    pad_b = nb * BT - b
    pad_t = (-lt) % U
    tp = jnp.pad(targets_t, ((0, pad_t), (0, pad_b)), mode="edge") \
        if (pad_t or pad_b) else targets_t
    ltp = lt + pad_t
    x = tp.reshape(ltp // U, U, nb, BT).transpose(2, 0, 1, 3)
    return x.reshape(nb, ltp // U, U * BT)


def _pk_for(lq):
    pk = 1024
    while pk < lq:
        pk *= 2
    return pk


def _shift_sub(x, fill):
    rolled = pltpu.roll(x, 1, axis=0)
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(sub == 0, fill, rolled)


def _kernel(profile_ref, tpk_ref, *refs, lq, lt, n_tiles, go, ge, unroll,
            bt, gapless, cap, track, pack, offset, nq=1):
    if nq > 1:
        qsel_ref, refs = refs[0], refs[1:]
    if offset:
        qoff_ref, refs = refs[0], refs[1:]
    if track:
        score_ref, qend_ref, tend_ref = refs[:3]
        scratch = refs[3:]
    else:
        score_ref = refs[0]
        scratch = refs[1:]
    (h_ref, e_ref, hm_ref, stile_ref, best_ref, bq_ref, bt_ref,
     stage_ref) = scratch
    cell_ref = hm_ref      # packed-tracking reuses the hm scratch tile

    sub = jax.lax.broadcasted_iota(jnp.int32, (lq, bt), 0)
    subf = sub.astype(jnp.float32)
    first = sub == 0
    prof = profile_ref[:].astype(jnp.bfloat16)        # (Lq, A)
    alpha = prof.shape[1]
    ub = unroll * bt
    go_f = jnp.float32(go)
    ge_f = jnp.float32(ge)
    goge = jnp.float32(go - ge)
    capf = jnp.float32(cap)
    PKT = jnp.float32(_pk_for(lt))
    pktm1 = jnp.float32(_pk_for(lt) - 1)
    if gapless:
        ramp = jnp.zeros_like(subf)
        h_ref[:] = jnp.zeros_like(h_ref)
    else:
        ramp = subf * ge_f
        # tiled lazy-F closure (experiments/sw_v9_tiled.py, +34% vs the
        # full-height cummax): local log2(F_TILE)-level scan per F_TILE-row
        # tile + a sequential (1, BT) carry chain across tiles. F_TILE
        # grows with Lq so the fully-unrolled chain stays <=64 tiles —
        # unrolled is ~2.3x faster than a lax.fori_loop body (dynamic
        # sublane slices), while >64 unrolled tiles explodes Mosaic
        # compile time (the Lq=2048 blow-up was 256 unrolled tiles).
        if lq % 8 == 0 and lq >= 16:
            F_TILE = 8
            while lq // F_TILE > 64 and lq % (F_TILE * 2) == 0:
                F_TILE *= 2
        else:
            F_TILE = lq
        n_ftiles = lq // F_TILE
        nlev = max(1, (F_TILE - 1).bit_length())
        subt = jax.lax.broadcasted_iota(jnp.int32, (F_TILE, bt), 0)
        masks = [subt >= (1 << l) for l in range(nlev)]
        first_t = subt == 0
        h_ref[:] = ramp
        e_ref[:] = ramp + jnp.float32(NEG)
    hm_ref[:] = jnp.zeros_like(hm_ref)
    if track and not pack:
        best_ref[:] = jnp.zeros_like(best_ref)
        bq_ref[:] = jnp.full_like(bq_ref, lq - 1)
        bt_ref[:] = jnp.full_like(bt_ref, -1)

    if offset:
        # per-lane query start offset: rows < qoff[b] are masked out of
        # the lane's substitution scores, which confines its alignment to
        # the query SUFFIX starting at qoff[b] (exact: the zero floor /
        # ramp boundary makes row qoff[b] behave like row 0). Used by the
        # reverse start-position pass, whose per-pair reversed query
        # prefixes are suffixes of ONE shared reversed profile.
        offmask = jnp.where(
            sub >= jnp.broadcast_to(qoff_ref[0], (lq, bt)),
            jnp.float32(0), jnp.float32(NEG))

    def column(j, s):
        """One DP column; s is the (Lq, BT) substitution slice."""
        if offset:
            s = s + offmask
        if gapless:
            h = _shift_sub(h_ref[:], jnp.float32(0)) + s
            if track:
                # end positions follow the reference's saturating u8 walk
                # (first column to reach the cap), so cap per step
                h = jnp.minimum(jnp.maximum(h, 0.0), capf)
            else:
                # score-only: max(min(cap, h_sat)) == min(cap, max(h_raw))
                # -- saturation commutes with the final max, so the
                # per-cell min() moves to the output reduce (-1 op/cell)
                h = jnp.maximum(h, 0.0)
            h_ref[:] = h
            htrue = h
        else:
            h = h_ref[:]
            diag = _shift_sub(h, jnp.float32(-ge)) + s   # s has +ge folded
            e = jnp.maximum(h - go_f, e_ref[:] - ge_f)
            hng = jnp.maximum(ramp, jnp.maximum(diag, e))

            def ftile(hng_k, carry):
                run = hng_k
                for l in range(nlev):
                    rolled = pltpu.roll(run, 1 << l, axis=0)
                    run = jnp.where(masks[l], jnp.maximum(run, rolled),
                                    run)
                run = jnp.maximum(run, carry)
                # F for this tile: run shifted down one row, the previous
                # tile's carry filling row 0
                fsh = pltpu.roll(run, 1, axis=0)
                fsh = jnp.where(first_t,
                                jnp.broadcast_to(carry, (F_TILE, bt)), fsh)
                return (jnp.maximum(hng_k, fsh - goge),
                        run[F_TILE - 1:F_TILE])

            carry0 = jnp.full((1, bt), jnp.float32(NEG))
            if n_ftiles <= 64:     # fully unrolled (F_TILE scaling keeps
                carry = carry0     # every power-of-two Lq on this path)
                for k in range(n_ftiles):
                    hnew_k, carry = ftile(
                        hng[k * F_TILE:(k + 1) * F_TILE], carry)
                    h_ref[pl.ds(k * F_TILE, F_TILE)] = hnew_k
            else:
                # odd non-power-of-two Lq fallback: one compiled tile body
                stage_ref[:] = hng   # stage hng where the loop can slice it

                def fbody(k, carry):
                    hnew_k, carry = ftile(
                        stage_ref[pl.ds(k * F_TILE, F_TILE)], carry)
                    h_ref[pl.ds(k * F_TILE, F_TILE)] = hnew_k
                    return carry

                jax.lax.fori_loop(0, n_ftiles, fbody, carry0)
            e_ref[:] = e
            htrue = h_ref[:] - ramp
        if track and pack:
            # deferred tracking: per-cell running max of packed
            # (score, earliest column); ONE cross-sublane reduce at the
            # end instead of one per column (+30% measured,
            # experiments/sw_v7_deferred.py)
            cand = htrue * PKT + (pktm1 - jnp.float32(j))
            cell_ref[:] = jnp.maximum(cell_ref[:], cand)
        elif track:
            colmax = jnp.max(htrue, axis=0, keepdims=True)
            amax = jnp.min(jnp.where(htrue == colmax, sub, lq),
                           axis=0, keepdims=True)
            better = colmax > best_ref[:]
            bt_ref[:] = jnp.where(better, j, bt_ref[:])
            bq_ref[:] = jnp.where(better, amax, bq_ref[:])
            best_ref[:] = jnp.maximum(best_ref[:], colmax)
        else:
            hm_ref[:] = jnp.maximum(hm_ref[:], htrue)

    def stile_for(t):
        chars = tpk_ref[0, t, :].astype(jnp.int32)
        if nq > 1:
            # multi-query: per-lane query select. prof is (Lq, nq*A) with
            # query q's substitution block at columns [q*A, (q+1)*A); the
            # one-hot row index becomes qsel*A + char so ONE matmul looks
            # up every lane's own query profile (K = nq*A on the MXU).
            chars = qsel_ref[0, 0, :].astype(jnp.int32) * (alpha // nq) + chars
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (alpha, ub), 0)
                  == chars[None, :]).astype(jnp.bfloat16)
        stile_ref[:] = jnp.dot(prof, onehot,
                               preferred_element_type=jnp.float32)

    n_full = lt // unroll                   # tiles with all columns real
    tail = lt - n_full * unroll

    def tile_step(t, _):
        stile_for(t)
        for u in range(unroll):
            column(t * unroll + u, stile_ref[:, pl.ds(u * bt, bt)])
        return 0

    jax.lax.fori_loop(0, n_full, tile_step, 0)
    if tail:
        stile_for(n_full)
        for u in range(tail):               # padded tail columns skipped
            column(n_full * unroll + u, stile_ref[:, pl.ds(u * bt, bt)])

    if track and pack:
        cell = cell_ref[:]
        pm = jnp.max(cell, axis=0, keepdims=True)
        score = jnp.floor(pm / PKT)
        tend = (pktm1 - (pm - score * PKT)).astype(jnp.int32)
        qend = jnp.min(jnp.where(cell == pm, sub, lq), axis=0,
                       keepdims=True)
        pos = score > 0.0          # all-zero rows report (-1, lq-1)
        score_ref[:] = jnp.broadcast_to(score,
                                        score_ref.shape).astype(jnp.int32)
        qend_ref[:] = jnp.broadcast_to(jnp.where(pos, qend, lq - 1),
                                       qend_ref.shape)
        tend_ref[:] = jnp.broadcast_to(jnp.where(pos, tend, -1),
                                       tend_ref.shape)
    elif track:
        score_ref[:] = jnp.broadcast_to(best_ref[:],
                                        score_ref.shape).astype(jnp.int32)
        qend_ref[:] = jnp.broadcast_to(bq_ref[:], qend_ref.shape)
        tend_ref[:] = jnp.broadcast_to(bt_ref[:], tend_ref.shape)
    else:
        hm = jnp.max(hm_ref[:], axis=0, keepdims=True)
        if gapless:
            hm = jnp.minimum(hm, capf)       # deferred saturation cap
        score_ref[:] = jnp.broadcast_to(hm,
                                        score_ref.shape).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "go", "ge", "gapless", "cap", "track", "pack", "unroll", "bt",
    "interpret", "nq"))
def _sw_call(prof_t, targets_t, qoff=None, qsel=None, *, go, ge, gapless,
             cap, track, pack, unroll, bt, interpret, nq=1):
    lq, alpha = prof_t.shape
    lt = targets_t.shape[0]
    # narrow dtypes (int8 transfers) are widened on-device: Mosaic's VMEM
    # tiling for sub-32-bit rows breaks the per-row tpk slicing
    tpk = pack_targets(targets_t, bt, unroll).astype(jnp.int32)
    nb, n_tiles, ub = tpk.shape
    offset = qoff is not None
    kernel = functools.partial(
        _kernel, lq=lq, lt=lt, n_tiles=n_tiles, go=go, ge=ge,
        unroll=unroll, bt=bt, gapless=gapless, cap=cap, track=track,
        pack=pack, offset=offset, nq=nq)
    out_shape = [jax.ShapeDtypeStruct((nb * 8, bt), jnp.int32)] * (
        3 if track else 1)
    out_specs = [pl.BlockSpec((8, bt), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * (3 if track else 1)
    in_specs = [
        pl.BlockSpec((lq, alpha), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_tiles, ub), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [prof_t, tpk]
    if nq > 1:
        # per-lane query select, pre-tiled to the packed (nb, U*BT) layout
        qspad = jnp.zeros((nb * bt,), jnp.int32).at[
            :qsel.shape[0]].set(qsel).reshape(nb, 1, 1, bt)
        qspad = jnp.broadcast_to(qspad, (nb, 1, unroll, bt)).reshape(
            nb, 1, ub)
        in_specs.append(pl.BlockSpec((1, 1, ub), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(qspad)
    if offset:
        qpad = jnp.zeros((nb * bt,), jnp.int32).at[
            :qoff.shape[0]].set(qoff).reshape(nb, 1, bt)
        in_specs.append(pl.BlockSpec((1, 1, bt), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(qpad)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # long query buckets (Lq >= 4k) exceed the default 16M scoped-vmem
        # budget; v5e has 128M VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=[
            pltpu.VMEM((lq, bt), jnp.float32),
            pltpu.VMEM((lq, bt), jnp.float32),
            pltpu.VMEM((lq, bt), jnp.float32),
            pltpu.VMEM((lq, unroll * bt), jnp.float32),
            pltpu.VMEM((1, bt), jnp.float32),
            pltpu.VMEM((1, bt), jnp.int32),
            pltpu.VMEM((1, bt), jnp.int32),
            pltpu.VMEM((lq, bt), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    return [o.reshape(nb, 8, bt)[:, 0, :].reshape(-1) for o in outs]


def _prep(profile, targets_t, ge, gapless, bt, unroll):
    targets_t = jnp.asarray(targets_t)
    lt, b = targets_t.shape
    # ALWAYS pad the batch to a multiple of the full BT block BEFORE the
    # jit call: the jitted program's input signature then depends only on
    # (Lq bucket, Lt bucket, ceil(b/BT)), not on the raw candidate count —
    # per-size shapes each paid a fresh compile (tens of seconds through
    # the runtime tunnel; an align stage was observed compiling 100+
    # variants purely from varying batch sizes). Padded lanes replicate
    # column 0 and are sliced away by the caller.
    nb = -(-b // bt)
    if nb * bt != b:
        targets_t = jnp.pad(targets_t, ((0, 0), (0, nb * bt - b)),
                            mode="edge")
    eff_bt = bt
    profile = jnp.asarray(profile).astype(jnp.float32)
    prof_t = profile.T if gapless else (profile + jnp.float32(ge)).T
    return prof_t, targets_t, lt, b, eff_bt


def sw_pallas(profile, targets_t, go=11, ge=1, gapless=False, cap=255,
              interpret=False):
    """Batched SW (or gapless) scores + end positions for ONE query profile.

    profile:   (A, Lq) int — substitution column scores (PAD rows very
               negative). targets_t: (Lt, B) int — transposed target batch.
    Returns (score, qend, tend) int32 (B,), matching dp.sw_scan /
    dp.gapless_scan semantics.
    """
    lq = np.asarray(profile).shape[1]
    lt = np.asarray(targets_t).shape[0]
    if gapless:
        bound = cap
    else:
        bound = int(np.asarray(profile).max()) * lq
    pack = 0 <= bound < (1 << 24) // _pk_for(lt) - 1
    prof_t, tpk, lt, b, eff_bt = _prep(profile, targets_t, ge, gapless,
                                       DEFAULT_BT, DEFAULT_U)
    s, qe, te = _sw_exec((prof_t, tpk), go=go, ge=ge, gapless=gapless,
                         cap=cap, track=True, pack=pack, unroll=DEFAULT_U,
                         bt=eff_bt, interpret=interpret)
    return s[:b], qe[:b], te[:b]


def sw_pallas_offset(profile, targets_t, qoff, go=11, ge=1, cap=255,
                     interpret=False):
    """sw_pallas with a per-target-lane query START offset.

    Lane b's alignment is confined to profile columns >= qoff[b] (exact
    fresh-start boundary at qoff[b]). The reverse start-position pass uses
    this with the query's full reversed profile: each pair's reversed
    query prefix q[:qe+1][::-1] is the suffix of the reversed profile
    starting at (Lq_padded - 1 - qe). Reported qend is in full-profile
    coordinates (subtract qoff host-side)."""
    import numpy as _np
    lq = _np.asarray(profile).shape[1]
    lt = _np.asarray(targets_t).shape[0]
    bound = int(_np.asarray(profile).max()) * lq
    pack = 0 <= bound < (1 << 24) // _pk_for(lt) - 1
    prof_t, tpk, lt, b, eff_bt = _prep(profile, targets_t, ge, False,
                                       DEFAULT_BT, DEFAULT_U)
    qoff = jnp.asarray(qoff, jnp.int32)
    bp = tpk.shape[1]
    if qoff.shape[0] != bp:       # match the padded batch (one jit shape)
        qoff = jnp.pad(qoff, (0, bp - qoff.shape[0]))
    s, qe, te = _sw_exec((prof_t, tpk, qoff),
                         go=go, ge=ge, gapless=False, cap=cap, track=True,
                         pack=pack, unroll=DEFAULT_U, bt=eff_bt,
                         interpret=interpret)
    return s[:b], qe[:b], te[:b]


def sw_pallas_multi(prof_flat, targets_t, qsel, qoff=None, go=11, ge=1,
                    interpret=False):
    """Batched SW scores + end positions for MANY query profiles at once.

    prof_flat: (NQ*A, Lq) int — NQ query profiles stacked on the alphabet
               axis (query q's rows at [q*A, (q+1)*A); pad rows/columns very
               negative). A is fixed at 32 (ALPHA_PAD).
    targets_t: (Lt, B) int — transposed target batch.
    qsel:      (B,) int32 — per-lane query index into prof_flat.
    qoff:      optional (B,) int32 — per-lane query START offset (reverse
               start-position pass; see sw_pallas_offset).

    One compiled program covers every lane regardless of which query it
    aligns against: the substitution lookup becomes a (Lq, NQ*A) @
    (NQ*A, U*BT) MXU matmul with the one-hot row index qsel*A + char.
    This is the align-stage workhorse: the whole candidate set of a batch
    of queries runs in a handful of fixed-shape kernel calls instead of one
    dispatch per query (each dispatch through the TPU runtime tunnel costs
    ~25-90 ms, and each new shape a remote compile).

    Replaces the per-query loop of the reference's Alignment driver
    (src/alignment/Alignment.cpp:409-534) on TPU."""
    import numpy as _np
    nqa, lq = _np.asarray(prof_flat).shape
    nq = nqa // 32
    lt = _np.asarray(targets_t).shape[0]
    bound = int(_np.asarray(prof_flat).max()) * lq
    pack = 0 <= bound < (1 << 24) // _pk_for(lt) - 1
    prof_t, tpk, lt, b, eff_bt = _prep(prof_flat, targets_t, ge, False,
                                       DEFAULT_BT, DEFAULT_U)
    qsel = jnp.asarray(qsel, jnp.int32)
    if qoff is None:
        qoff = jnp.zeros_like(qsel)
    else:
        qoff = jnp.asarray(qoff, jnp.int32)
    bp = tpk.shape[1]
    if qoff.shape[0] != bp:
        qoff = jnp.pad(qoff, (0, bp - qoff.shape[0]))
    s, qe, te = _sw_exec((prof_t, tpk, qoff, qsel),
                         go=go, ge=ge, gapless=False, cap=255, track=True,
                         pack=pack, unroll=DEFAULT_U, bt=eff_bt,
                         interpret=interpret, nq=nq)
    return s[:b], qe[:b], te[:b]


def sw_pallas_score(profile, targets_t, go=11, ge=1, interpret=False):
    """Scores only (no end tracking) — the fast bulk-scan path."""
    prof_t, tpk, lt, b, eff_bt = _prep(profile, targets_t, ge, False,
                                       DEFAULT_BT, DEFAULT_U)
    (s,) = _sw_exec((prof_t, tpk), go=go, ge=ge, gapless=False,
                    cap=0, track=False, pack=False, unroll=DEFAULT_U,
                    bt=eff_bt, interpret=interpret)
    return s[:b]


def gapless_pallas_score(profile, targets_t, cap=255, interpret=False):
    """Gapless best-diagonal scores — the ungappedprefilter scan."""
    prof_t, tpk, lt, b, eff_bt = _prep(profile, targets_t, 0, True,
                                       DEFAULT_BT, DEFAULT_U)
    (s,) = _sw_exec((prof_t, tpk), go=0, ge=0, gapless=True,
                    cap=cap, track=False, pack=False, unroll=DEFAULT_U,
                    bt=eff_bt, interpret=interpret)
    return s[:b]
