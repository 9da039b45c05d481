"""Stage functions of the device k-mer prefilter pipeline.

Shared between the single-chip path (prefilter/device.py) and the
target-sharded multi-chip path (parallel/sharded_prefilter.py). Semantics
per stage are documented in prefilter/device.py; the host oracle is
prefilter/query_matcher.py (reference: src/prefiltering/QueryMatcher.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .query_matcher import UCHAR_MAX

I32_MAX = np.int32(2147483647)
BIG = np.int32(0x40000000)


def bucket(n: int, lo: int = 1024) -> int:
    c = lo
    while c < n:
        c *= 2
    return c


def _shift1(x, fill):
    return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])


def fast_cumsum(x, block: int = 2048):
    """Inclusive cumsum for long 1-D arrays via two-level blocking.

    XLA lowers a 1-D cumsum on TPU to a serial HBM scan; reshaping to
    (rows, block) scans the lane dimension vectorized across sublanes,
    ~10x faster for multi-million-element arrays."""
    n = x.shape[0]
    if n <= 4 * block:
        return jnp.cumsum(x)
    nb = -(-n // block)
    xp = jnp.pad(x, (0, nb * block - n)).reshape(nb, block)
    within = jnp.cumsum(xp, axis=1)
    carry = jnp.concatenate([jnp.zeros(1, x.dtype),
                             jnp.cumsum(within[:, -1])[:-1]])
    return (within + carry[:, None]).reshape(-1)[:n]


def seg_expand(counts, cum, cap):
    """Variable-length segment expansion: element e of the output belongs
    to segment seg[e] and is its within[e]-th member. `cum` is the
    inclusive cumsum of `counts`. Entries at or past cum[-1] are invalid.

    Returns (seg, within, valid, total). The scatter-marks/cumsum trick
    avoids any data-dependent shape: output is fixed at `cap`."""
    total = cum[-1]
    marks = jnp.zeros(cap + 1, jnp.int32).at[jnp.minimum(cum, cap)].add(
        1, mode="drop")
    seg = fast_cumsum(marks)[:cap]
    k_ar = jnp.arange(cap, dtype=jnp.int32)
    valid = k_ar < total
    seg = jnp.minimum(seg, counts.shape[0] - 1)
    within = k_ar - (cum[seg] - counts[seg])
    return seg, within, valid, total


def lut_count_ge(cnt, vmin, rows, cutoff):
    """#{j : score(rows[i], j) >= cutoff[i]} via the per-row suffix-count
    LUT `cnt` (S, V). Cutoffs below vmin count everything; above vmax
    count nothing (matches SubKmerScores.count_ge)."""
    V = cnt.shape[1]
    c = cutoff - vmin
    inr = c < V
    cc = jnp.clip(c, 0, V - 1)
    return jnp.where(inr, cnt[rows, cc], 0)


def stage_zero(q_pad, qlens, thr_win, tables, offsets32,
               *, pat, steps, mults, caps, x_index):
    """Device similar-k-mer generation + CSR posting lookup — the whole
    host stage-0 (KmerGenerator::generateKmerList, KmerGenerator.cpp:30-110
    + IndexTable lookup) as one traced program against device-resident
    sub-k-mer score tables.

    q_pad: (B, lq) i32 query letters (pad with x_index); qlens: (B,);
    thr_win: (B, Wmax) i32 per-window bias-adjusted k-mer threshold;
    tables: per divide step (scores (S,S) i16 desc-sorted, idx (S,S) i32,
    cnt (S,V) i32 suffix-count LUT, vmin, powers tuple);
    offsets32: (alpha^k + 1,) i32 CSR offsets of the target k-mer index.
    pat: spaced-pattern offsets; steps: divide widths (reference
    setDivideStrategy, KmerGenerator.cpp:41-88); mults: little-endian
    positional multiplier per step; caps: static expansion cap per level
    (last = final code capacity).

    Enumeration order is window-major, prefix-major within a window —
    identical to the host generator, so downstream stable sorts see the
    same candidate order. The reference's per-window MAX_RESULT clamp
    (2^23) is not applied here: a batch reaching it overflows caps[-1]
    and the caller falls back to the host oracle.

    Returns (starts, counts, qpos, qid, code_total) where the first four
    are (caps[-1],) CSR lists feeding stage_candidates, and code_total
    detects cap overflow."""
    B, lq = q_pad.shape
    Wmax = thr_win.shape[1]
    span = int(pat[-1]) + 1
    w_ar = jnp.arange(Wmax, dtype=jnp.int32)
    gidx = w_ar[:, None] + jnp.asarray(pat, jnp.int32)[None, :]
    letters = q_pad[:, gidx]                      # (B, Wmax, k)
    valid_w = ((w_ar[None, :] + span <= qlens[:, None])
               & (letters != x_index).all(axis=2))
    BW = B * Wmax
    valid_w = valid_w.reshape(BW)
    thr = thr_win.reshape(BW)

    n_steps = len(steps)
    subs, highest = [], []
    off = 0
    for si, step in enumerate(steps):
        scores_s, idx_s, cnt_s, vmin_s, powers_s = tables[si]
        sub = jnp.zeros(BW, jnp.int32)
        lets = letters[:, :, off:off + step].reshape(BW, step)
        for j in range(step):
            sub = sub + lets[:, j] * np.int32(powers_s[j])
        subs.append(sub)
        highest.append(scores_s[sub, 0].astype(jnp.int32))
        off += step
    rest = [jnp.zeros(BW, jnp.int32) for _ in range(n_steps)]
    for i in range(n_steps - 1, 0, -1):
        rest[i - 1] = highest[i] + rest[i]

    # level 0
    scores0, idx0, cnt0_t, vmin0, _ = tables[0]
    S0 = scores0.shape[1]
    cnt = lut_count_ge(cnt0_t, vmin0, subs[0], thr - rest[0])
    cnt = jnp.where(valid_w, cnt, 0)
    cum = fast_cumsum(cnt)
    win, j, valid, _ = seg_expand(cnt, cum, caps[0])
    level_totals = [cum[-1]]
    score = jnp.where(valid, scores0[subs[0][win], j].astype(jnp.int32), 0)
    code = idx0[subs[0][win], j] * np.int32(mults[0])

    for si in range(1, n_steps):
        scores_s, idx_s, cnt_s, vmin_s, _ = tables[si]
        rs = subs[si][win]
        cutoff = thr[win] - score - rest[si][win]
        cnt_i = jnp.where(valid, lut_count_ge(cnt_s, vmin_s, rs, cutoff), 0)
        cum_i = fast_cumsum(cnt_i)
        cand, jj, valid_i, _ = seg_expand(cnt_i, cum_i, caps[si])
        level_totals.append(cum_i[-1])
        rsr = rs[cand]
        score = jnp.where(
            valid_i, score[cand] + scores_s[rsr, jj].astype(jnp.int32), 0)
        code = code[cand] + idx_s[rsr, jj] * np.int32(mults[si])
        win = win[cand]
        valid = valid_i

    qid = win // np.int32(Wmax)
    qpos = win - qid * np.int32(Wmax)
    code = jnp.clip(code, 0, offsets32.shape[0] - 2)
    starts = offsets32[code]
    counts = jnp.where(valid, offsets32[code + 1] - starts, 0)
    return starts, counts, qpos, qid, jnp.stack(level_totals)


def _sort_dup_packed(qtid, diag, nt, tb=None):
    """Packed-key sort + double-diagonal detection (see stage_candidates).
    qtid: (H,) i32 packed keys, I32_MAX for invalid; diag: (H,) i32.
    Packing is `qid*nt+id` when `tb` is None (legacy in-program packing),
    else `qid<<tb | id` — the shift form keeps the target count OUT of
    the compiled program's statics, so one executable serves every DB
    whose (nt-1).bit_length() rounds to the same tb bucket instead of
    paying a multi-minute XLA sort compile per DB size.
    Returns (qtid, diag, valid, hqid, ids, cand) in sorted order."""
    qtid, diag = jax.lax.sort((qtid, diag), num_keys=1, is_stable=True)
    valid = qtid != I32_MAX
    if tb is None:
        hqid = jnp.where(valid, qtid // np.int32(nt), I32_MAX)
        ids = jnp.where(valid, qtid % np.int32(nt), I32_MAX)
    else:
        hqid = jnp.where(valid, qtid >> tb, I32_MAX)
        ids = jnp.where(valid, qtid & np.int32((1 << tb) - 1), I32_MAX)
    d8 = diag & 0xFF
    first_of_id = qtid != _shift1(qtid, -1)
    dup = jnp.where(first_of_id, d8 == 0, d8 == _shift1(d8, 0)) & valid
    # "last dup wins" scan over 2 packed i32s: (dup<<8|d8, qtid)
    fd = jnp.where(dup, 256, 0) | d8

    def combine(a, b):
        af, aq = a
        bf, bq = b
        take_b = bf >= 256
        return (jnp.where(take_b, bf, af), jnp.where(take_b, bq, aq))

    pf, pq = jax.lax.associative_scan(combine, (fd, qtid))
    pf = _shift1(pf, 0)
    pq = _shift1(pq, -1)
    run_dup = (pf >= 256) & ((pf & 0xFF) == d8) & (pq == qtid)
    cand = dup & ~run_dup
    return qtid, diag, valid, hqid, ids, cand


def _compact_candidates(cand, hqid, ids, diag, *, c_cap):
    """Front-compact candidate triples into fixed c_cap slots."""
    n_cand = jnp.sum(cand.astype(jnp.int32))
    pos = fast_cumsum(cand.astype(jnp.int32)) - 1
    wpos = jnp.where(cand & (pos < c_cap), pos, c_cap)
    cqid = jnp.full(c_cap + 1, I32_MAX, jnp.int32).at[wpos].set(
        hqid, mode="drop")[:c_cap]
    cid = jnp.full(c_cap + 1, I32_MAX, jnp.int32).at[wpos].set(
        ids, mode="drop")[:c_cap]
    cdiag = jnp.zeros(c_cap + 1, jnp.int32).at[wpos].set(
        diag, mode="drop")[:c_cap]
    cvalid = jnp.arange(c_cap) < jnp.minimum(n_cand, c_cap)
    return cqid, cid, cdiag, cvalid, n_cand


def stage_candidates_pre(qtid, diag, *, c_cap, tb):
    """stage_candidates with the posting expansion done HOST-side.

    The expansion (starts[trip]+within / entries gathers) is contiguous-run
    structured, which numpy does at memcpy speed in the prep thread pool,
    while XLA pays ~20 ns per random-gather element — measured 207 ms of a
    285 ms stage_candidates at h_cap=2M. Inputs are the shift-packed
    qid<<tb|id key (I32_MAX padding) and u16 diagonal per expansion; the
    device picks up at the sort. Semantically identical to
    stage_candidates' packed branch (same sort, dup-detect scan,
    compaction)."""
    valid0 = qtid != I32_MAX
    total = jnp.sum(valid0.astype(jnp.int32))
    qtid, diag, valid, hqid, ids, cand = _sort_dup_packed(
        qtid, diag.astype(jnp.int32), None, tb=tb)
    cqid, cid, cdiag, cvalid, n_cand = _compact_candidates(
        cand, hqid, ids, diag, c_cap=c_cap)
    return cqid, cid, cdiag, cvalid, n_cand, total


def stage_candidates(starts, counts, qpos, qid, entries_seq, entries_pos,
                     *, h_cap, c_cap, nt=None):
    """Posting expansion + (qid,id) sort + double-diagonal detection +
    compaction. Returns (cqid, cid, cdiag, cvalid, n_cand, total).

    `nt` (static target count) enables the packed fast path: the
    (qid, id) pair becomes ONE i32 key qid*nt+id, so the h_cap-sized
    stable sort carries 2 arrays with 1 key instead of 4 arrays with 2
    keys, and the duplicate-run scan carries 2 i32 arrays instead of 4 —
    the sort over h_cap is the most expensive op in the whole prefilter
    pipeline (XLA TPU sort cost scales with total carried bytes). All
    packing stays in i32: x64 is disabled and TPUs emulate i64."""
    # -- expansion
    cum = fast_cumsum(counts)
    trip, within, valid, total = seg_expand(counts, cum, h_cap)
    ent = jnp.where(valid, starts[trip] + within, 0)
    ids = entries_seq[ent]
    tpos = entries_pos[ent].astype(jnp.int32)    # u16 packed entries
    diag = (qpos[trip] - tpos) & 0xFFFF
    hqid = qid[trip]

    # packed path requires qid*nt+id < 2^31; callers guarantee B*nt
    # bounds via the static nt (B <= 128 in the flush loop)
    if nt is not None and nt > 0:
        qtid = jnp.where(valid, hqid * np.int32(nt) + ids, I32_MAX)
        qtid, diag, valid, hqid, ids, cand = _sort_dup_packed(qtid, diag, nt)
    else:
        ids = jnp.where(valid, ids, I32_MAX)
        hqid = jnp.where(valid, hqid, I32_MAX)
        # -- stable sort by (qid, id)
        hqid, ids, diag, valid = jax.lax.sort(
            (hqid, ids, diag, valid.astype(jnp.int32)), num_keys=2,
            is_stable=True)
        valid = valid.astype(bool)

        # -- double-diagonal detection
        d8 = diag & 0xFF
        first_of_id = (hqid != _shift1(hqid, -1)) \
            | (ids != _shift1(ids, -1))
        dup = jnp.where(first_of_id, d8 == 0, d8 == _shift1(d8, 0)) & valid

        def combine(a, b):
            av, aq, ai, ad = a
            bv, bq, bi, bd = b
            return (av | bv, jnp.where(bv, bq, aq), jnp.where(bv, bi, ai),
                    jnp.where(bv, bd, ad))

        pv, pq, pi, pd = jax.lax.associative_scan(
            combine, (dup, hqid, ids, d8))
        pv = _shift1(pv, False)
        pq = _shift1(pq, -1)
        pi = _shift1(pi, -1)
        pd = _shift1(pd, -1)
        run_dup = pv & (pq == hqid) & (pi == ids) & (pd == d8)
        cand = dup & ~run_dup

    # -- compaction
    cqid, cid, cdiag, cvalid, n_cand = _compact_candidates(
        cand, hqid, ids, diag, c_cap=c_cap)
    return cqid, cid, cdiag, cvalid, n_cand, total


def _ln_ladder(ln_max):
    """Window-length branch ladder: 128, 256, ... capped at ln_max."""
    lns = [min(128, ln_max)]
    while lns[-1] < ln_max:
        lns.append(min(lns[-1] * 2, ln_max))
    return lns


def _chunked_rescore(score_chunk_for, t_offsets, t_lens, q_lens,
                     *, ln_max, chunk):
    """Shared chunk driver for the diagonal rescorers.

    Candidates are length-sorted (one extra lax.sort + inverse scatter,
    ~10 ms at c_cap=128k) so each chunk runs a lax.switch branch whose
    gather width matches its LONGEST window: rescore gather volume tracks
    the actual window lengths instead of always paying ln_max (measured
    ~3x at ln_max=1024 with ~350-residue targets). score_chunk_for(ln)
    returns the (qid_k, qs_k, base_k, n_k) -> (chunk,) scorer for width
    ln."""
    lns = _ln_ladder(ln_max)

    def rescore(qid_c, id_c, diag_c, valid_c, cap, n_valid=None):
        """n_valid: traced count of front-compacted valid entries; chunks
        beyond it are skipped (cost scales with real work, not capacity)."""
        qid_s = jnp.where(valid_c, qid_c, 0)
        id_s = jnp.where(valid_c, id_c, 0)
        d = ((diag_c + 0x8000) & 0xFFFF) - 0x8000       # signed i16
        qs = jnp.maximum(d, 0)
        ts = jnp.maximum(-d, 0)
        n = jnp.minimum(t_lens[id_s] - ts, q_lens[qid_s] - qs)
        n = jnp.where(valid_c, jnp.maximum(n, 0), 0)
        base = t_offsets[id_s] + ts

        C = qid_s.shape[0]
        gidx = jnp.arange(C, dtype=jnp.int32)
        if len(lns) > 1:
            # length-sort; invalids keyed I32_MAX so they stay at the
            # back and the n_valid chunk skip keeps working
            key = jnp.where(valid_c, n, I32_MAX)
            _, qid_s, qs, base, n, order = jax.lax.sort(
                (key, qid_s, qs, base, n, gidx), num_keys=1)
        else:
            order = gidx

        branches = [score_chunk_for(ln) for ln in lns]
        lns_arr = jnp.asarray(lns, jnp.int32)

        def chunk_fn(args):
            if len(lns) == 1:
                return branches[0](args)
            mx = jnp.max(args[3])
            return jax.lax.switch(
                jnp.searchsorted(lns_arr, mx), branches, args)

        nchunk = -(-C // chunk)
        padded = [jnp.pad(x, (0, nchunk * chunk - C))
                  for x in (qid_s, qs, base, n)]
        stacked = [x.reshape(nchunk, chunk) for x in padded]
        if n_valid is None:
            sc = jax.lax.map(chunk_fn, tuple(stacked)).reshape(-1)[:C]
        else:
            n_act = jnp.minimum((n_valid + chunk - 1) // chunk, nchunk)

            def body(i, out):
                row = chunk_fn(tuple(x[i] for x in stacked))
                return jax.lax.dynamic_update_index_in_dim(out, row, i, 0)

            sc = jax.lax.fori_loop(
                0, n_act, body,
                jnp.zeros((nchunk, chunk), jnp.int32)).reshape(-1)[:C]
        if len(lns) > 1:
            sc = jnp.zeros(C, sc.dtype).at[order].set(sc)   # unsort
        if cap:
            sc = jnp.minimum(sc, UCHAR_MAX)
        return jnp.where(valid_c, jnp.maximum(sc, 0), 0)

    return rescore


def make_rescore(t_cat, t_offsets, t_lens, prof, q_lens,
                 *, lq_max, ln_max, chunk):
    """Batched ungapped diagonal rescorer over (qid, id, diag) triples.

    Max-subarray via the cumsum/cummin prefix identity (no sequential scan).
    """
    prof_flat = prof.reshape(-1)
    alpha = prof.shape[2]

    def score_chunk_for(ln):
        def score_chunk(args):
            qid_k, qs_k, base_k, n_k = args
            l = jnp.arange(ln, dtype=jnp.int32)[None, :]
            active = l < n_k[:, None]
            tc = t_cat[jnp.where(active, base_k[:, None] + l, 0)].astype(
                jnp.int32)                       # i8 packed residues
            qrow = jnp.minimum(qs_k[:, None] + l, lq_max - 1)
            s = prof_flat[(qid_k[:, None] * lq_max + qrow) * alpha + tc]
            s = jnp.where(active, s, 0)
            cums = jnp.cumsum(s, axis=1)
            minpre = jnp.minimum(
                0, jnp.concatenate(
                    [jnp.zeros((s.shape[0], 1), s.dtype),
                     jax.lax.cummin(cums, axis=1)[:, :-1]], axis=1))
            run = jnp.where(active, cums - minpre, 0)
            return jnp.max(run, axis=1)
        return score_chunk

    return _chunked_rescore(score_chunk_for, t_offsets, t_lens, q_lens,
                            ln_max=ln_max, chunk=chunk)


def make_rescore_from_letters(t_cat, t_offsets, t_lens, q_pad, corr,
                              submat, q_lens, *, lq_max, ln_max, chunk):
    """make_rescore without a materialized per-query profile: the score of
    (query row, target residue) is submat[q_letter, t_letter] + corr[row]
    — two small-table gathers instead of one from a (B, lq, A) profile,
    so the profile never crosses the host->device tunnel."""
    alpha = submat.shape[1]
    submat_flat = submat.reshape(-1).astype(jnp.int32)
    q_flat = q_pad.reshape(-1)
    corr_flat = corr.reshape(-1)

    def score_chunk_for(ln):
        def score_chunk(args):
            qid_k, qs_k, base_k, n_k = args
            l = jnp.arange(ln, dtype=jnp.int32)[None, :]
            active = l < n_k[:, None]
            tc = t_cat[jnp.where(active, base_k[:, None] + l, 0)].astype(
                jnp.int32)
            qrow = qid_k[:, None] * lq_max + jnp.minimum(
                qs_k[:, None] + l, lq_max - 1)
            ql = q_flat[qrow]
            s = submat_flat[ql * alpha + tc] + corr_flat[qrow]
            s = jnp.where(active, s, 0)
            cums = jnp.cumsum(s, axis=1)
            minpre = jnp.minimum(
                0, jnp.concatenate(
                    [jnp.zeros((s.shape[0], 1), s.dtype),
                     jax.lax.cummin(cums, axis=1)[:, :-1]], axis=1))
            run = jnp.where(active, cums - minpre, 0)
            return jnp.max(run, axis=1)
        return score_chunk

    return _chunked_rescore(score_chunk_for, t_offsets, t_lens, q_lens,
                            ln_max=ln_max, chunk=chunk)


def stage_keepmax(cqid, cid, cscore, cvalid, *, c_cap):
    """keepMaxScoreElementOnly: per (qid,id) keep the max score, first on
    ties in scan order. Returns is_best mask."""
    first_c = ((cqid != _shift1(cqid, -1)) | (cid != _shift1(cid, -1))) \
        & cvalid
    seg = jnp.cumsum(first_c.astype(jnp.int32)) - 1
    seg = jnp.where(cvalid, seg, c_cap - 1)
    segmax = jax.ops.segment_max(jnp.where(cvalid, cscore, -1), seg,
                                 num_segments=c_cap)
    at_max = cvalid & (cscore == segmax[seg])
    gidx = jnp.arange(c_cap, dtype=jnp.int32)
    segfirst = jax.ops.segment_min(jnp.where(at_max, gidx, I32_MAX), seg,
                                   num_segments=c_cap)
    return at_max & (segfirst[seg] == gidx)


def stage_hist(cqid, cscore, is_best, *, n_q, c_cap):
    """Per-query 256-bin score histogram over the per-id best scores."""
    hseg = jnp.where(is_best, cqid * 256 + cscore, n_q * 256)
    hist = jax.ops.segment_sum(jnp.ones(c_cap, jnp.int32), hseg,
                               num_segments=n_q * 256 + 1)[:-1]
    return hist.reshape(n_q, 256)


def threshold_from_hist(hist, max_hits, min_diag_thr):
    """computeScoreThreshold (QueryMatcher.h:211-221): largest s in [1,255]
    whose descending-cumulative count reaches max_hits, else 0."""
    cum_desc = jnp.cumsum(hist[:, ::-1], axis=1)[:, ::-1]
    s_idx = jnp.arange(256)
    ok = (cum_desc >= max_hits) & (s_idx[None, :] >= 1)
    thr0 = jnp.max(jnp.where(ok, s_idx[None, :], 0), axis=1)
    thr = jnp.maximum(thr0, min_diag_thr)
    truncated = thr >= UCHAR_MAX
    return thr, truncated


def stage_select(cqid, cid, cdiag, cscore, cvalid, is_best, thr, identity,
                 *, c_cap, max_hits, out_sz, rank_cap=None):
    """Filter (score>=thr, not identity), rank per query in (capped score
    desc, id asc) order, keep rank < rank_cap, compact to out_sz slots.
    Returns (kqid, kid, kdiag, kscore, kvalid) in selection-sorted order."""
    qthr = thr[jnp.where(cvalid, cqid, 0)]
    is_ident = cid == identity[jnp.where(cvalid, cqid, 0)]
    sel = is_best & (cscore >= qthr) & ~is_ident
    # packed 2-key i32 sort: (qid<<8 | 255-score, id) — the (qid, id)
    # pair is unique post-keepmax so (key1, key2) is unique and
    # stability is irrelevant; 3 carried arrays instead of 5. i32 only:
    # x64 is off and TPUs emulate i64. Needs n_q < 2^23 (flush batches
    # are <=128 queries).
    key = jnp.where(sel, cqid * 256 + (255 - cscore), I32_MAX)
    key, sid2, sdiag2 = jax.lax.sort(
        (key, jnp.where(sel, cid, I32_MAX), cdiag), num_keys=2)
    ssel = key != I32_MAX
    sq = jnp.where(ssel, key // 256, I32_MAX)
    ss = jnp.where(ssel, key & 0xFF, 0)
    gidx = jnp.arange(c_cap, dtype=jnp.int32)
    qfirst = jnp.concatenate([jnp.ones(1, bool), sq[1:] != sq[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(qfirst, gidx, 0))
    rank = gidx - seg_start
    if rank_cap is None:
        avail = max_hits - (identity[jnp.where(ssel, sq, 0)] >= 0)
    else:
        avail = rank_cap
    keep = ssel & (rank < avail)

    kpos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    wk = jnp.where(keep & (kpos < out_sz), kpos, out_sz)
    kqid = jnp.full(out_sz + 1, I32_MAX, jnp.int32).at[wk].set(
        sq, mode="drop")[:out_sz]
    kid = jnp.full(out_sz + 1, I32_MAX, jnp.int32).at[wk].set(
        sid2, mode="drop")[:out_sz]
    kdiag = jnp.zeros(out_sz + 1, jnp.int32).at[wk].set(
        sdiag2, mode="drop")[:out_sz]
    kscore = jnp.zeros(out_sz + 1, jnp.int32).at[wk].set(
        255 - ss, mode="drop")[:out_sz]
    n_keep = jnp.sum(keep.astype(jnp.int32))
    kvalid = jnp.arange(out_sz) < n_keep
    return kqid, kid, kdiag, kscore, kvalid


def stage_finalize(kqid, kid, kdiag, final_score, kvalid):
    """Final per-query ordering: score desc, id asc."""
    return jax.lax.sort(
        (jnp.where(kvalid, kqid, I32_MAX),
         jnp.where(kvalid, BIG - final_score, I32_MAX), kid, kdiag,
         final_score, kvalid.astype(jnp.int32)),
        num_keys=3, is_stable=True)
