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


def stage_candidates(starts, counts, qpos, qid, entries_seq, entries_pos,
                     *, h_cap, c_cap):
    """Posting expansion + (qid,id) sort + double-diagonal detection +
    compaction. Returns (cqid, cid, cdiag, cvalid, n_cand, total)."""
    # -- expansion
    cum = jnp.cumsum(counts)
    total = cum[-1]
    marks = jnp.zeros(h_cap + 1, jnp.int32).at[jnp.minimum(cum, h_cap)].add(
        1, mode="drop")
    trip = jnp.cumsum(marks)[:h_cap]
    k_arange = jnp.arange(h_cap, dtype=jnp.int32)
    valid = k_arange < total
    trip = jnp.minimum(trip, starts.shape[0] - 1)
    within = k_arange - (cum[trip] - counts[trip])
    ent = jnp.where(valid, starts[trip] + within, 0)
    ids = jnp.where(valid, entries_seq[ent], I32_MAX)
    tpos = entries_pos[ent].astype(jnp.int32)    # u16 packed entries
    diag = (qpos[trip] - tpos) & 0xFFFF
    hqid = jnp.where(valid, qid[trip], I32_MAX)

    # -- stable sort by (qid, id)
    hqid, ids, diag, valid = jax.lax.sort(
        (hqid, ids, diag, valid.astype(jnp.int32)), num_keys=2,
        is_stable=True)
    valid = valid.astype(bool)

    # -- double-diagonal detection
    d8 = diag & 0xFF
    first_of_id = (hqid != _shift1(hqid, -1)) | (ids != _shift1(ids, -1))
    dup = jnp.where(first_of_id, d8 == 0, d8 == _shift1(d8, 0)) & valid

    def combine(a, b):
        av, aq, ai, ad = a
        bv, bq, bi, bd = b
        return (av | bv, jnp.where(bv, bq, aq), jnp.where(bv, bi, ai),
                jnp.where(bv, bd, ad))

    pv, pq, pi, pd = jax.lax.associative_scan(combine, (dup, hqid, ids, d8))
    pv = _shift1(pv, False)
    pq = _shift1(pq, -1)
    pi = _shift1(pi, -1)
    pd = _shift1(pd, -1)
    run_dup = pv & (pq == hqid) & (pi == ids) & (pd == d8)
    cand = dup & ~run_dup

    # -- compaction
    n_cand = jnp.sum(cand.astype(jnp.int32))
    pos = jnp.cumsum(cand.astype(jnp.int32)) - 1
    wpos = jnp.where(cand & (pos < c_cap), pos, c_cap)
    cqid = jnp.full(c_cap + 1, I32_MAX, jnp.int32).at[wpos].set(
        hqid, mode="drop")[:c_cap]
    cid = jnp.full(c_cap + 1, I32_MAX, jnp.int32).at[wpos].set(
        ids, mode="drop")[:c_cap]
    cdiag = jnp.zeros(c_cap + 1, jnp.int32).at[wpos].set(
        diag, mode="drop")[:c_cap]
    cvalid = jnp.arange(c_cap) < n_cand
    return cqid, cid, cdiag, cvalid, n_cand, total


def make_rescore(t_cat, t_offsets, t_lens, prof, q_lens,
                 *, lq_max, ln_max, chunk):
    """Batched ungapped diagonal rescorer over (qid, id, diag) triples.

    Max-subarray via the cumsum/cummin prefix identity (no sequential scan).
    """
    prof_flat = prof.reshape(-1)
    alpha = prof.shape[2]

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

        def score_chunk(args):
            qid_k, qs_k, base_k, n_k = args
            l = jnp.arange(ln_max, dtype=jnp.int32)[None, :]
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

        C = qid_s.shape[0]
        nchunk = -(-C // chunk)
        padded = [jnp.pad(x, (0, nchunk * chunk - C))
                  for x in (qid_s, qs, base, n)]
        stacked = [x.reshape(nchunk, chunk) for x in padded]
        if n_valid is None:
            sc = jax.lax.map(score_chunk, tuple(stacked)).reshape(-1)[:C]
        else:
            n_act = jnp.minimum((n_valid + chunk - 1) // chunk, nchunk)

            def body(i, out):
                row = score_chunk(tuple(x[i] for x in stacked))
                return jax.lax.dynamic_update_index_in_dim(out, row, i, 0)

            sc = jax.lax.fori_loop(
                0, n_act, body,
                jnp.zeros((nchunk, chunk), jnp.int32)).reshape(-1)[:C]
        if cap:
            sc = jnp.minimum(sc, UCHAR_MAX)
        return jnp.where(valid_c, jnp.maximum(sc, 0), 0)

    return rescore


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
    sq, ss, sid2, sdiag2, ssel = jax.lax.sort(
        (jnp.where(sel, cqid, I32_MAX), 255 - cscore, cid, cdiag,
         sel.astype(jnp.int32)), num_keys=3, is_stable=True)
    ssel = ssel.astype(bool)
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
