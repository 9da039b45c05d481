"""Banded affine-gap extension alignment with Z-drop (ksw2-extz semantics).

The reference's nucleotide aligner delegates gapped extension to
ksw_extz2_sse (/root/reference/lib/ksw2/ksw2_extz2_sse.cpp, MIT; also
minimap2). For byte parity we reproduce that algorithm's exact observable
behavior, including its banding quirks:

  - anti-diagonal difference DP (u = H(r,t)-H(r-1,t), v = H(r,t)-H(r,t-1),
    x/y the gap-state differences), score offsets by 2*(q+e) with the
    max-cap at mat[0] + 2*(q+e);
  - per-row band [st0, en0] widened to 16-aligned [st, en]; cells in the
    rounded margin are updated with stale substitution scores and their
    direction bytes are reachable by the backtrack (faithful to the SSE
    implementation, NOT an idealized DP);
  - the 32-bit H row update with its lane-structured max scan (4-lane
    running max, lane-major tie resolution, en0 seeded first);
  - ksw_apply_zdrop's max/Z-drop bookkeeping and ksw_backtrack's state
    machine with left-aligned gaps.

This is the exact-score path (no KSW_EZ_APPROX_MAX), flags limited to
SCORE_ONLY/EXTZ_ONLY as used by BandedNucleotideAligner.
"""

import numpy as np

KSW_NEG_INF = -0x40000000

SCORE_ONLY = 0x01
EXTZ_ONLY = 0x40


class ExtzResult:
    __slots__ = ("max", "max_q", "max_t", "mqe", "mqe_t", "mte", "mte_q",
                 "score", "zdropped", "cigar")

    def __init__(self):
        self.max = 0
        self.max_q = self.max_t = self.mqe_t = self.mte_q = -1
        self.score = self.mqe = self.mte = KSW_NEG_INF
        self.zdropped = 0
        self.cigar = []          # list of (op, length); op 0=M 1=I 2=D


def _apply_zdrop(ez, H, r, t, zdrop, e):
    """ksw_apply_zdrop (ksw2.h:186), is_rot variant."""
    if H > ez.max:
        ez.max = H
        ez.max_t = t
        ez.max_q = r - t
    elif t >= ez.max_t and r - t >= ez.max_q:
        tl = t - ez.max_t
        ql = (r - t) - ez.max_q
        l = tl - ql if tl > ql else ql - tl
        if zdrop >= 0 and ez.max - H > zdrop + l * e:
            ez.zdropped = 1
            return True
    return False


def _push_cigar(cigar, op, length):
    if cigar and cigar[-1][0] == op:
        cigar[-1] = (op, cigar[-1][1] + length)
    else:
        cigar.append((op, length))


def _backtrack(p_rows, off, off_end, i0, j0):
    """ksw_backtrack (ksw2.h:145), is_rot=1, is_rev=0, with_N=0.

    p_rows[r] is the direction byte array for row r covering
    [off[r], off_end[r]]; i = target index, j = query index.
    """
    cigar = []
    i, j = i0, j0
    state = 0
    while i >= 0 and j >= 0:
        r = i + j
        force_state = -1
        if i < off[r]:
            force_state = 2
        if i > off_end[r]:
            force_state = 1
        tmp = int(p_rows[r][i - off[r]]) if force_state < 0 else 0
        if state == 0:
            state = tmp & 7
        elif not (tmp >> (state + 2)) & 1:
            state = 0
        if state == 0:
            state = tmp & 7
        if force_state >= 0:
            state = force_state
        if state == 0:
            _push_cigar(cigar, 0, 1)
            i -= 1
            j -= 1
        elif state == 1 or state == 3:
            _push_cigar(cigar, 2, 1)
            i -= 1
        else:
            _push_cigar(cigar, 1, 1)
            j -= 1
    if i >= 0:
        _push_cigar(cigar, 2, i + 1)
    if j >= 0:
        _push_cigar(cigar, 1, j + 1)
    cigar.reverse()
    return cigar


def extz2(query, target, mat, m, q, e, w, zdrop, flag):
    """Port of ksw_extz2_sse. query/target: int arrays (residue numbers),
    mat: flat m*m int list, q/e gap open/extend, w band, zdrop Z-drop."""
    ez = ExtzResult()
    qlen = len(query)
    tlen = len(target)
    if m <= 0 or qlen <= 0 or tlen <= 0:
        return ez
    with_cigar = not (flag & SCORE_ONLY)
    qe = q + e
    qe2 = 2 * qe
    sc_mch = int(mat[0])
    sc_mis = int(mat[1])
    max_cap = sc_mch + qe2
    if w < 0:
        w = max(tlen, qlen)
    wl = wr = w
    tlen_16 = (tlen + 15) // 16 * 16
    qlen_16 = (qlen + 15) // 16 * 16

    min_sc = min(int(v) for v in mat)
    if -min_sc > 2 * qe:
        return ez

    # buffers (kcalloc zero-init, incl. the 16-byte padding regions)
    u = np.zeros(tlen_16, dtype=np.int64)
    v = np.zeros(tlen_16, dtype=np.int64)
    x = np.zeros(tlen_16, dtype=np.int64)
    y = np.zeros(tlen_16, dtype=np.int64)
    # s/sf get 16 slack cells: the reference's 16-wide score stores can run
    # past tlen_16 (into adjacent buffers); we give them scratch space
    s = np.zeros(tlen_16 + 16, dtype=np.int64)
    sf = np.zeros(tlen_16 + 16, dtype=np.int64)
    sf[:tlen] = np.asarray(target, dtype=np.int64)
    qr = np.zeros(qlen_16 + 16, dtype=np.int64)    # reversed query, 0-padded
    qr[:qlen] = np.asarray(query, dtype=np.int64)[::-1]
    H = np.full(tlen_16, KSW_NEG_INF, dtype=np.int64)

    p_rows = [None] * (qlen + tlen - 1) if with_cigar else None
    off = np.zeros(qlen + tlen - 1, dtype=np.int64)
    off_end = np.zeros(qlen + tlen - 1, dtype=np.int64)

    last_st = last_en = -1
    mat_arr = np.asarray(mat, dtype=np.int64).reshape(m, m)

    for r in range(qlen + tlen - 1):
        st, en = 0, tlen - 1
        if st < r - qlen + 1:
            st = r - qlen + 1
        if en > r:
            en = r
        st = max(st, (r - wr + 1) >> 1)       # arithmetic shift = floor
        en = min(en, (r + wl) >> 1)
        if st > en:
            ez.zdropped = 1
            break
        st0, en0 = st, en
        st = st // 16 * 16
        en = (en + 16) // 16 * 16 - 1
        # boundary conditions
        if st > 0:
            if last_st <= st - 1 <= last_en:
                x1 = int(x[st - 1])
                v1 = int(v[st - 1])
            else:
                x1 = v1 = 0
        else:
            x1 = 0
            v1 = q if r else 0
        if en >= r:
            y[r] = 0
            u[r] = q if r else 0
        # substitution scores for [st0 .. st0-aligned 16-block covering en0];
        # cells in [st, st0) keep stale values (loop fission starts at st0)
        s_hi = st0 + ((en0 - st0) // 16 + 1) * 16
        trange = np.arange(st0, s_hi)
        qchars = qr[(qlen - 1 - r) + trange]
        tchars = sf[trange]
        wild = (qchars == m - 1) | (tchars == m - 1)
        s[st0:s_hi] = np.where(wild, 0,
                               np.where(qchars == tchars, sc_mch, sc_mis))
        # core loop over the 16-rounded [st, en]
        n = en - st + 1
        xt1 = np.concatenate(([x1], x[st:en]))
        vt1 = np.concatenate(([v1], v[st:en]))
        zv = s[st:en + 1] + qe2
        a = xt1 + vt1
        b = y[st:en + 1] + u[st:en + 1]
        if with_cigar:
            d = (a > zv).astype(np.int64)             # 1 if a wins
            zv = np.maximum(zv, a)
            d = np.where(b > zv, 2, d)
        else:
            zv = np.maximum(zv, a)
        zv = np.maximum(zv, b)
        zv = np.minimum(zv, max_cap)
        ut_old = u[st:en + 1].copy()
        u[st:en + 1] = zv - vt1
        v[st:en + 1] = zv - ut_old
        zq = zv - q
        a = a - zq
        b = b - zq
        if with_cigar:
            amask = a > 0
            x[st:en + 1] = np.where(amask, a, 0)
            d |= np.where(amask, 0x08, 0)
            bmask = b > 0
            y[st:en + 1] = np.where(bmask, b, 0)
            d |= np.where(bmask, 0x10, 0)
            p_rows[r] = d
            off[r] = st
            off_end[r] = en
        else:
            x[st:en + 1] = np.maximum(a, 0)
            y[st:en + 1] = np.maximum(b, 0)

        # exact 32-bit H row + max scan (lane-structured tie-breaks)
        if r > 0:
            if en0 > 0:
                H[en0] = H[en0 - 1] + u[en0] - qe
            else:
                H[en0] = H[en0] + v[en0] - qe
            max_H = int(H[en0])
            max_t = en0
            en1 = st0 + (en0 - st0) // 4 * 4
            if en1 > st0:
                tr = np.arange(st0, en1)
                H[st0:en1] += v[st0:en1] - qe
                hb = H[st0:en1].reshape(-1, 4)
                lanes_max = np.full(4, max_H, dtype=np.int64)
                lanes_t = np.full(4, max_t, dtype=np.int64)
                base = tr.reshape(-1, 4)[:, 0]
                for lane in range(4):
                    col = hb[:, lane]
                    better = col > lanes_max[lane]
                    if better.any():
                        # running strict max keeps the FIRST achieving row
                        runmax = np.maximum.accumulate(col)
                        mx = int(runmax[-1])
                        if mx > lanes_max[lane]:
                            first = int(np.argmax(col == mx))
                            lanes_max[lane] = mx
                            lanes_t[lane] = base[first]
                for i_ in range(4):
                    if max_H < lanes_max[i_]:
                        max_H = int(lanes_max[i_])
                        max_t = int(lanes_t[i_]) + i_
            for t in range(en1, en0):
                H[t] += v[t] - qe
                if H[t] > max_H:
                    max_H = int(H[t])
                    max_t = t
        else:
            H[0] = v[0] - qe - qe
            max_H = int(H[0])
            max_t = 0
        # update ez
        if en0 == tlen - 1 and H[en0] > ez.mte:
            ez.mte = int(H[en0])
            ez.mte_q = r - en
        if r - st0 == qlen - 1 and H[st0] > ez.mqe:
            ez.mqe = int(H[st0])
            ez.mqe_t = st0
        if _apply_zdrop(ez, max_H, r, max_t, zdrop, e):
            break
        if r == qlen + tlen - 2 and en0 == tlen - 1:
            ez.score = int(H[tlen - 1])
        last_st, last_en = st, en

    if with_cigar:
        if not ez.zdropped and not (flag & EXTZ_ONLY):
            ez.cigar = _backtrack(p_rows, off, off_end, tlen - 1, qlen - 1)
        elif ez.max_t >= 0 and ez.max_q >= 0:
            ez.cigar = _backtrack(p_rows, off, off_end, ez.max_t, ez.max_q)
    return ez


# ---------------------------------------------------------------------------
# batched extz2: the same DP vectorized ACROSS PAIRS (VERDICT r2 next-7).
# Semantics bit-identical to extz2 (cross-checked in tests/test_ksw2_batch);
# per-row numpy ops run on (B, W) windows instead of one pair at a time,
# which removes the per-pair Python row loop that made blastn-mode search
# intractable at scale. Score path only needs (u,v,x,y,H); the cigar path
# additionally stores per-row direction bytes for the oracle backtracker.
# ---------------------------------------------------------------------------

_NATIVE = None


def _native_lib():
    """Compile-once native batch core (native/ksw2_batch.cpp, OpenMP over
    pairs); returns the ctypes lib or None."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE or None
    import ctypes
    import hashlib
    import os
    import pathlib
    import subprocess
    _NATIVE = False
    cpp = pathlib.Path(__file__).resolve().parents[2] / "native" \
        / "ksw2_batch.cpp"
    if not cpp.exists():
        return None
    cache = pathlib.Path(os.environ.get(
        "MMSEQS2_TPU_CACHE", os.path.expanduser("~/.cache/mmseqs2_tpu")))
    try:
        cache.mkdir(parents=True, exist_ok=True)
        h = hashlib.sha256(cpp.read_bytes()).hexdigest()[:16]
        so = cache / f"ksw2_batch_{h}.so"
        if not so.exists():
            r = subprocess.run(
                ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", str(cpp),
                 "-o", str(so)], capture_output=True)
            if r.returncode != 0:
                return None
        lib = ctypes.CDLL(str(so))
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.extz2_batch_c.restype = ctypes.c_int
        lib.extz2_batch_c.argtypes = [i64p] * 4 + [ctypes.c_int64, i64p] \
            + [ctypes.c_int64] * 6 + [i64p] * 3 + [ctypes.c_int64]
        _NATIVE = lib
        return lib
    except Exception:
        return None


def _extz2_batch_native(queries, targets, mat, m, q, e, w, zdrop, flag,
                        lib):
    import ctypes
    B = len(queries)
    qcat = (np.concatenate([np.asarray(x, np.int64) for x in queries])
            if B else np.zeros(0, np.int64))
    tcat = (np.concatenate([np.asarray(x, np.int64) for x in targets])
            if B else np.zeros(0, np.int64))
    qoff = np.concatenate([[0], np.cumsum([len(x) for x in queries])]
                          ).astype(np.int64)
    toff = np.concatenate([[0], np.cumsum([len(x) for x in targets])]
                          ).astype(np.int64)
    mat_a = np.asarray(mat, np.int64)
    out = np.zeros(B * 9, np.int64)
    cap = max(int(qoff[-1] + toff[-1]) + 16 * B, 1024)
    coff = np.zeros(B + 1, np.int64)

    def p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    while True:
        cig = np.zeros(cap * 2, np.int64)
        rc = lib.extz2_batch_c(p(qcat), p(qoff), p(tcat), p(toff), B,
                               p(mat_a), m, q, e, w, zdrop, flag, p(out),
                               p(cig), p(coff), cap)
        if rc == 0:
            break
        cap *= 2
    results = []
    for b in range(B):
        ez = ExtzResult()
        (ez.max, ez.max_q, ez.max_t, ez.mqe, ez.mqe_t, ez.mte, ez.mte_q,
         ez.score, ez.zdropped) = (int(v) for v in out[b * 9:(b + 1) * 9])
        lo, hi = int(coff[b]), int(coff[b + 1])
        ez.cigar = [(int(cig[i * 2]), int(cig[i * 2 + 1]))
                    for i in range(lo, hi)]
        results.append(ez)
    return results


def extz2_batch(queries, targets, mat, m, q, e, w, zdrop, flag):
    """Batched ksw_extz2 over pairs; returns [ExtzResult, ...].

    queries/targets: lists of int arrays. All pairs share (mat, m, q, e,
    w, zdrop, flag). Dispatch: native OpenMP core (compile-once) ->
    vectorized numpy -> per-pair oracle."""
    B = len(queries)
    if B == 0:
        return []
    lib = _native_lib()
    if lib is not None and w >= 0:
        return _extz2_batch_native(queries, targets, mat, m, q, e, w,
                                   zdrop, flag, lib)
    if w < 0 or B == 1:
        return [extz2(queries[b], targets[b], mat, m, q, e, w, zdrop, flag)
                for b in range(B)]
    results = [None] * B
    ez0 = ExtzResult()

    qlen = np.array([len(x) for x in queries], np.int64)
    tlen = np.array([len(x) for x in targets], np.int64)
    min_sc = min(int(v_) for v_ in mat)
    for b in range(B):
        if qlen[b] <= 0 or tlen[b] <= 0 or m <= 0 or -min_sc > 2 * (q + e):
            results[b] = ExtzResult()
    live = np.array([results[b] is None for b in range(B)])
    if not live.any():
        return results

    with_cigar = not (flag & SCORE_ONLY)
    qe = q + e
    qe2 = 2 * qe
    sc_mch = int(mat[0])
    sc_mis = int(mat[1])
    max_cap = sc_mch + qe2
    W = (2 * w + 2 + 31) // 16 * 16 + 16     # 16-aligned band + round slack

    T16 = int(((tlen.max() + 15) // 16) * 16)
    Q16 = int(((qlen.max() + 15) // 16) * 16)
    n_rows = int((qlen + tlen).max() - 1)

    # window gathers read [st, st+W); pad every state row by W slack
    u = np.zeros((B, T16 + W), np.int64)
    v = np.zeros((B, T16 + W), np.int64)
    x = np.zeros((B, T16 + W), np.int64)
    y = np.zeros((B, T16 + W), np.int64)
    s = np.zeros((B, T16 + 16 + 2 * W), np.int64)
    sf = np.zeros((B, T16 + 16 + 2 * W), np.int64)
    qr = np.zeros((B, Q16 + 16 + 2 * W), np.int64)
    H = np.full((B, T16 + W), KSW_NEG_INF, np.int64)
    for b in range(B):
        sf[b, :tlen[b]] = np.asarray(targets[b], np.int64)
        qr[b, :qlen[b]] = np.asarray(queries[b], np.int64)[::-1]

    alive = live.copy()
    zdropped = np.zeros(B, bool)
    e_max = np.zeros(B, np.int64)
    e_max_q = np.full(B, -1, np.int64)
    e_max_t = np.full(B, -1, np.int64)
    e_mqe = np.full(B, KSW_NEG_INF, np.int64)
    e_mqe_t = np.full(B, -1, np.int64)
    e_mte = np.full(B, KSW_NEG_INF, np.int64)
    e_mte_q = np.full(B, -1, np.int64)
    e_score = np.full(B, KSW_NEG_INF, np.int64)
    last_st = np.full(B, -1, np.int64)
    last_en = np.full(B, -1, np.int64)
    if with_cigar:
        d_all = np.zeros((n_rows, B, W), np.int8)
        off_a = np.zeros((B, n_rows), np.int64)
        off_end_a = np.zeros((B, n_rows), np.int64)

    aw = np.arange(W, dtype=np.int64)[None, :]
    bidx = np.arange(B)[:, None]

    for r in range(n_rows):
        act = alive & (r < qlen + tlen - 1)
        if not act.any():
            break
        st0 = np.maximum(np.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
        en0 = np.minimum(np.minimum(tlen - 1, r), (r + w) >> 1)
        bust = act & (st0 > en0)
        if bust.any():
            zdropped |= bust
            alive &= ~bust
            act &= ~bust
            if not act.any():
                break
        st0 = np.where(act, st0, 0)
        en0 = np.where(act, en0, 0)
        st = st0 // 16 * 16
        en = (en0 + 16) // 16 * 16 - 1
        # boundary x1/v1 (exact last-band containment check)
        stm1 = st - 1
        in_last = (last_st <= stm1) & (stm1 <= last_en)
        x1 = np.where((st > 0) & in_last,
                      x[bidx[:, 0], np.maximum(stm1, 0)], 0)
        v1 = np.where(st > 0,
                      np.where(in_last,
                               v[bidx[:, 0], np.maximum(stm1, 0)], 0),
                      q if r else 0)
        x1 = np.where(st > 0, x1, 0)
        # en >= r: y[r] = 0; u[r] = q if r else 0  (per pair, within band)
        setr = act & (en >= r) & (r < T16 + W)
        if setr.any():
            y[setr, r] = 0
            u[setr, r] = q if r else 0

        # substitution scores from st0 (stale cells below st0 keep values)
        s_hi_rel = ((en0 - st0) // 16 + 1) * 16       # width from st0
        tix = st0[:, None] + aw                       # absolute t
        qix = (qlen[:, None] - 1 - r) + tix
        qch = np.take_along_axis(qr, np.maximum(qix, 0), 1)
        qch = np.where(qix >= 0, qch, 0)
        tch = np.take_along_axis(sf, tix, 1)
        wild = (qch == m - 1) | (tch == m - 1)
        news = np.where(wild, 0, np.where(qch == tch, sc_mch, sc_mis))
        smask = act[:, None] & (aw < s_hi_rel[:, None])
        solds = np.take_along_axis(s, tix, 1)
        np.put_along_axis(s, tix, np.where(smask, news, solds), 1)

        # core difference-DP over the 16-rounded [st, en] window
        widx = st[:, None] + aw
        wmask = act[:, None] & (aw <= (en - st)[:, None])
        uw = np.take_along_axis(u, widx, 1)
        vw = np.take_along_axis(v, widx, 1)
        xw = np.take_along_axis(x, widx, 1)
        yw = np.take_along_axis(y, widx, 1)
        swv = np.take_along_axis(s, widx, 1)
        # xt1/vt1: shifted by one with the boundary scalar at slot 0
        xt1 = np.concatenate([x1[:, None], xw[:, :-1]], 1)
        vt1 = np.concatenate([v1[:, None], vw[:, :-1]], 1)
        zv = swv + qe2
        a = xt1 + vt1
        bb = yw + uw
        if with_cigar:
            d = (a > zv).astype(np.int64)
            zv = np.maximum(zv, a)
            d = np.where(bb > zv, 2, d)
        zv = np.maximum(np.maximum(zv, a), bb)
        zv = np.minimum(zv, max_cap)
        u_new = zv - vt1
        v_new = zv - uw
        zq = zv - q
        a = a - zq
        bb = bb - zq
        if with_cigar:
            amask = a > 0
            x_new = np.where(amask, a, 0)
            d |= np.where(amask, 0x08, 0)
            bmask = bb > 0
            y_new = np.where(bmask, bb, 0)
            d |= np.where(bmask, 0x10, 0)
        else:
            x_new = np.maximum(a, 0)
            y_new = np.maximum(bb, 0)
        np.put_along_axis(u, widx, np.where(wmask, u_new, uw), 1)
        np.put_along_axis(v, widx, np.where(wmask, v_new, vw), 1)
        np.put_along_axis(x, widx, np.where(wmask, x_new, xw), 1)
        np.put_along_axis(y, widx, np.where(wmask, y_new, yw), 1)
        if with_cigar:
            d_all[r] = d.astype(np.int8)
            off_a[:, r] = np.where(act, st, off_a[:, r])
            off_end_a[:, r] = np.where(act, en, off_end_a[:, r])

        # H row + lane-structured max scan (exact ksw2 tie-breaks)
        uw2 = np.take_along_axis(u, widx, 1)
        vw2 = np.take_along_axis(v, widx, 1)
        Hw = np.take_along_axis(H, widx, 1)
        if r > 0:
            en0r = np.clip(en0 - st, 0, W - 1)       # en0 slot in window
            # H[en0-1] is the previous row's value and can sit BELOW the
            # current window (en0 == st): read the absolute H array
            en0v = H[np.arange(B), np.maximum(en0 - 1, 0)]
            u_en0 = np.take_along_axis(uw2, en0r[:, None], 1)[:, 0]
            v_en0 = np.take_along_axis(vw2, en0r[:, None], 1)[:, 0]
            H_en0_old = np.take_along_axis(Hw, en0r[:, None], 1)[:, 0]
            H_en0 = np.where(en0 > 0, en0v + u_en0 - qe,
                             H_en0_old + v_en0 - qe)
            max_H = H_en0.copy()
            max_t = en0.copy()
            # rows st0..en1 get H[t] += v[t] - qe; lane scan over 4-blocks
            st0r = st0 - st
            en1 = st0 + (en0 - st0) // 4 * 4
            nlanes = (en1 - st0) // 4                 # 4-blocks per pair
            relm = aw - st0r[:, None]                 # index rel. to st0
            upd = act[:, None] & (relm >= 0) & (aw < (en1 - st)[:, None])
            Hn = np.where(upd, Hw + vw2 - qe, Hw)
            # scatter H_en0 into the window image
            np.put_along_axis(Hn, en0r[:, None],
                              np.where(act, H_en0,
                                       np.take_along_axis(
                                           Hn, en0r[:, None], 1)[:, 0]
                                       )[:, None], 1)
            # per-lane strict running max, first occurrence, lane-major
            if int(nlanes.max()) > 0:
                nb4 = int(nlanes.max())
                g4 = st0r[:, None] + np.arange(nb4 * 4)[None, :]
                g4c = np.minimum(g4, W - 1)
                Hl = np.take_along_axis(Hn, g4c, 1).reshape(B, nb4, 4)
                rowok = (np.arange(nb4)[None, :, None]
                         < nlanes[:, None, None])
                Hl = np.where(rowok, Hl, KSW_NEG_INF)
                lane_mx = Hl.max(axis=1)              # (B, 4)
                first = np.argmax(
                    Hl == lane_mx[:, None, :], axis=1)  # (B, 4) first row
                lane_t = st0[:, None] + first * 4      # base t of block
                # sequential lane-major resolution vs (max_H from en0)
                for lane in range(4):
                    better = act & (lane_mx[:, lane] > max_H)
                    max_t = np.where(better, lane_t[:, lane] + lane, max_t)
                    max_H = np.where(better, lane_mx[:, lane], max_H)
            # tail cells en1..en0-1 sequential (<= 3 per pair)
            for k in range(3):
                tk = en1 + k
                sel = act & (tk < en0)
                if not sel.any():
                    continue
                tkr = np.clip(tk - st, 0, W - 1)
                hv = (np.take_along_axis(Hn, tkr[:, None], 1)[:, 0])
                hv2 = hv + np.take_along_axis(
                    vw2, tkr[:, None], 1)[:, 0] - qe
                np.put_along_axis(Hn, tkr[:, None],
                                  np.where(sel, hv2, hv)[:, None], 1)
                better = sel & (hv2 > max_H)
                max_H = np.where(better, hv2, max_H)
                max_t = np.where(better, tk, max_t)
            np.put_along_axis(H, widx, np.where(wmask, Hn, Hw), 1)
        else:
            H0 = vw2[:, 0] - qe - qe                 # st == 0 at r == 0
            Hn = Hw.copy()
            Hn[:, 0] = np.where(act, H0, Hn[:, 0])
            np.put_along_axis(H, widx, np.where(wmask, Hn, Hw), 1)
            max_H = H0
            max_t = np.zeros(B, np.int64)
            H_en0 = H0

        # ez updates
        selt = act & (en0 == tlen - 1) & (H_en0 > e_mte)
        e_mte = np.where(selt, H_en0, e_mte)
        e_mte_q = np.where(selt, r - en, e_mte_q)
        H_st0 = np.take_along_axis(H, np.clip(st0, 0, T16 + W - 1)[:, None],
                                   1)[:, 0]
        selq = act & (r - st0 == qlen - 1) & (H_st0 > e_mqe)
        e_mqe = np.where(selq, H_st0, e_mqe)
        e_mqe_t = np.where(selq, st0, e_mqe_t)
        # apply_zdrop
        gt = act & (max_H > e_max)
        e_max_t = np.where(gt, max_t, e_max_t)
        e_max_q = np.where(gt, r - max_t, e_max_q)
        e_max = np.where(gt, max_H, e_max)
        chk = act & ~gt & (max_t >= e_max_t) & (r - max_t >= e_max_q)
        tl_ = max_t - e_max_t
        ql_ = (r - max_t) - e_max_q
        ll = np.abs(tl_ - ql_)
        drop = chk & (zdrop >= 0) & (e_max - max_H > zdrop + ll * e)
        zdropped |= drop
        alive &= ~drop
        fin = act & ~drop & (r == qlen + tlen - 2) & (en0 == tlen - 1)
        e_score = np.where(fin, H_en0, e_score)
        last_st = np.where(act, st, last_st)
        last_en = np.where(act, en, last_en)

    for b in range(B):
        if results[b] is not None:
            continue
        ez = ExtzResult()
        ez.max = int(e_max[b])
        ez.max_q = int(e_max_q[b])
        ez.max_t = int(e_max_t[b])
        ez.mqe, ez.mqe_t = int(e_mqe[b]), int(e_mqe_t[b])
        ez.mte, ez.mte_q = int(e_mte[b]), int(e_mte_q[b])
        ez.score = int(e_score[b])
        ez.zdropped = int(zdropped[b])
        if with_cigar:
            rows_b = d_all[:, b, :]       # row r's band bytes from off_a
            if not ez.zdropped and not (flag & EXTZ_ONLY):
                ez.cigar = _backtrack(rows_b, off_a[b], off_end_a[b],
                                      int(tlen[b]) - 1, int(qlen[b]) - 1)
            elif ez.max_t >= 0 and ez.max_q >= 0:
                ez.cigar = _backtrack(rows_b, off_a[b], off_end_a[b],
                                      ez.max_t, ez.max_q)
        results[b] = ez
    return results
