"""Device-resident batched k-mer prefilter (the QueryMatcher hot path on TPU).

Reference semantics: src/prefiltering/QueryMatcher.cpp (matchQuery :103-241,
match :243-376, getResult :401-458), CacheFriendlyOperations.cpp
(findDuplicates :38-180), UngappedAlignment.cpp (diagonal rescore, 255 cap).
The host oracle is prefilter/query_matcher.py; tests cross-check hit-for-hit.

TPU-first design (SURVEY.md §7.3): instead of the reference's per-query
OpenMP loop with radix-binned byte arrays, a whole *batch* of queries is
matched in one jitted XLA program over static-capacity buffers:

  1. posting-list expansion   — scatter-ones + cumsum over the prefix-summed
                                counts (no per-element binary search)
  2. (qid, id)-stable sort    — replaces radix binning (lax.sort, 2 keys)
  3. double-diagonal detect   — vectorized compares + associative "last
                                duplicate wins" scan (the byte-array quirk:
                                an id's first entry with u8 diag 0 counts)
  4. compaction               — cumsum + scatter
  5. ungapped diagonal rescore— gather target windows; max-subarray via
                                cumsum/cummin prefix identity (no sequential
                                scan):  run[l] = cum[l] - min(0, cummin[l-1])
  6. keepMaxScoreElementOnly  — segment_max + segment_min tie-break
  7. adaptive score threshold — per-query 256-bin histogram (segment_sum)
  8. top-K selection + final (score desc, id asc) ordering — one more sort

The host prepares per-window similar-k-mer triples (KmerGenerator) and the
CSR (starts, counts) lookups; everything after that runs on device. The
rare rescoreHits truncation path (score threshold saturated at 255,
QueryMatcher.cpp:184-214) is detected on device and those queries fall back
to the host oracle.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.encode import calc_local_aa_bias
from .device_stages import (BIG, I32_MAX, bucket as _bucket, make_rescore,
                            stage_candidates, stage_finalize, stage_hist,
                            stage_keepmax, stage_select, threshold_from_hist)
from .kmer_index import extract_kmers
from .query_matcher import UCHAR_MAX, USHRT_MAX


# --------------------------------------------------------------------------
# jitted core
# --------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("h_cap", "c_cap", "n_q", "lq_max", "ln_max",
                     "max_hits", "min_diag_thr", "chunk", "out_sz"))
def _device_match(starts, counts, qpos, qid,          # (K,) triples
                  entries_seq, entries_pos,           # (E,) index entries
                  t_cat, t_offsets, t_lens,           # target store
                  prof, q_lens, identity,             # (B,Lq,A), (B,), (B,)
                  *, h_cap, c_cap, n_q, lq_max, ln_max, max_hits,
                  min_diag_thr, chunk, out_sz):
    cqid, cid, cdiag, cvalid, n_cand, total = stage_candidates(
        starts, counts, qpos, qid, entries_seq, entries_pos,
        h_cap=h_cap, c_cap=c_cap)
    rescore = make_rescore(t_cat, t_offsets, t_lens, prof, q_lens,
                           lq_max=lq_max, ln_max=ln_max, chunk=chunk)
    cscore = rescore(cqid, cid, cdiag, cvalid, cap=True, n_valid=n_cand)
    is_best = stage_keepmax(cqid, cid, cscore, cvalid, c_cap=c_cap)
    hist = stage_hist(cqid, cscore, is_best, n_q=n_q, c_cap=c_cap)
    thr, truncated = threshold_from_hist(hist, max_hits, min_diag_thr)
    kqid, kid, kdiag, kscore, kvalid = stage_select(
        cqid, cid, cdiag, cscore, cvalid, is_best, thr, identity,
        c_cap=c_cap, max_hits=max_hits, out_sz=out_sz)
    n_keep = jnp.sum(kvalid.astype(jnp.int32))

    # exact (uncapped) scores for saturated kept hits (getResult :430-436)
    sat = kvalid & (kscore >= UCHAR_MAX)
    exact = rescore(kqid, kid, kdiag, sat, cap=False, n_valid=n_keep)
    final_score = jnp.where(sat, exact, kscore)

    oq, _, oid, odiag, ofs, oval = stage_finalize(
        kqid, kid, kdiag, final_score, kvalid)
    return (oq, oid, odiag, ofs, oval.astype(bool), n_cand, n_keep,
            truncated, total)


@functools.partial(
    jax.jit,
    static_argnames=("h_cap", "c_cap", "n_q", "lq_max", "ln_max", "chunk"))
def _device_candidates(starts, counts, qpos, qid,
                       entries_seq, entries_pos,
                       t_cat, t_offsets, t_lens,
                       prof, q_lens,
                       *, h_cap, c_cap, n_q, lq_max, ln_max, chunk):
    """Stages 1-6 only: per-(query,id) best-scoring candidates, compacted.
    Split/out-of-core mode merges these host-side (prefilter/split_merge)."""
    cqid, cid, cdiag, cvalid, n_cand, total = stage_candidates(
        starts, counts, qpos, qid, entries_seq, entries_pos,
        h_cap=h_cap, c_cap=c_cap)
    rescore = make_rescore(t_cat, t_offsets, t_lens, prof, q_lens,
                           lq_max=lq_max, ln_max=ln_max, chunk=chunk)
    cscore = rescore(cqid, cid, cdiag, cvalid, cap=True, n_valid=n_cand)
    is_best = stage_keepmax(cqid, cid, cscore, cvalid, c_cap=c_cap)
    pos = jnp.cumsum(is_best.astype(jnp.int32)) - 1
    n_best = jnp.sum(is_best.astype(jnp.int32))
    wk = jnp.where(is_best, pos, c_cap)
    bq = jnp.full(c_cap + 1, I32_MAX, jnp.int32).at[wk].set(
        cqid, mode="drop")[:c_cap]
    bi = jnp.full(c_cap + 1, I32_MAX, jnp.int32).at[wk].set(
        cid, mode="drop")[:c_cap]
    bd = jnp.zeros(c_cap + 1, jnp.int32).at[wk].set(
        cdiag, mode="drop")[:c_cap]
    bs = jnp.zeros(c_cap + 1, jnp.int32).at[wk].set(
        cscore, mode="drop")[:c_cap]
    return bq, bi, bd, bs, n_best, n_cand


@functools.partial(jax.jit,
                   static_argnames=("lq_max", "ln_max", "chunk"))
def _device_exact(t_cat, t_offsets, t_lens, prof, q_lens,
                  qid, ids, diag, valid, *, lq_max, ln_max, chunk):
    rescore = make_rescore(t_cat, t_offsets, t_lens, prof, q_lens,
                           lq_max=lq_max, ln_max=ln_max, chunk=chunk)
    return rescore(qid, ids, diag, valid, cap=False)


# --------------------------------------------------------------------------
# host driver
# --------------------------------------------------------------------------

class DevicePrefilter:
    """Batched device QueryMatcher. Holds the index on device; `match_batch`
    takes a batch of numeric queries and returns per-query hit lists
    identical to QueryMatcher.match()."""

    H_CAP_MAX = 1 << 25        # 32M expanded hits per device call

    def __init__(self, index_table, seed, ungapped, kmer_thr, kmer_size,
                 max_hits, aa_bias_corr=True, bias_scale=1.0,
                 min_diag_score_thr=15, generator=None,
                 take_only_best_kmer=False, host_fallback=None,
                 device_upload=True):
        self.index = index_table
        self.seed = seed
        self.ungapped = ungapped
        self.kmer_thr = kmer_thr
        self.k = kmer_size
        self.max_hits = max_hits
        self.aa_bias_corr = aa_bias_corr
        self.bias_scale = bias_scale
        self.min_diag_thr = min_diag_score_thr
        self.generator = generator
        self.take_only_best = take_only_best_kmer
        self.host_fallback = host_fallback   # QueryMatcher oracle
        self.x_index = seed.alphabet_size - 1

        seqs = index_table.masked_seqs
        if hasattr(seqs, "cat"):          # index_io.CatSeqs packed layout
            t_lens = (seqs.lens.astype(np.int32) if len(seqs)
                      else np.zeros(1, np.int32))
        else:
            t_lens = np.array([len(s) for s in seqs] or [0],
                              dtype=np.int32)
        self.n_targets = len(seqs)
        self.max_t_len = int(t_lens.max()) if len(seqs) else 1
        if not device_upload:
            # stage-0-only role (e.g. ShardedPrefilter holds the per-shard
            # device arrays itself; the full index stays host-side)
            return
        t_offsets = np.concatenate([[0], np.cumsum(t_lens)]).astype(np.int32)
        # packed device layout (IndexTable.h:25-30 parity: 6 B/entry —
        # u32 seq id + u16 position — and 1 B/residue sequence store)
        if hasattr(seqs, "cat"):
            t_cat = seqs.cat.astype(np.int8)
        else:
            t_cat = (np.concatenate(seqs) if len(seqs) else
                     np.zeros(0, np.uint8)).astype(np.int8)
        self.d_entries_seq = jnp.asarray(np.append(
            index_table.entries_seq, 0).astype(np.int32))
        self.d_entries_pos = jnp.asarray(np.append(
            index_table.entries_pos, 0).astype(np.uint16))
        self.d_t_cat = jnp.asarray(np.append(t_cat, 0).astype(np.int8))
        self.d_t_offsets = jnp.asarray(t_offsets[:-1] if len(seqs)
                                       else np.zeros(1, np.int32))
        self.d_t_lens = jnp.asarray(t_lens)

    # -- host-side stage 0: windows -> similar k-mer triples ---------------
    def query_triples(self, q_num, comp_bias, generator=None):
        """(kmer codes, qpos) for one query, reference enumeration order.

        Whole-query vectorized similar-k-mer generation (the reference's
        per-window KmerGenerator::generateKmerList loop, QueryMatcher.cpp
        :255-284, batched as flat numpy segment ops — see
        kmer_generator._expand_batch)."""
        idx_all, pos_all, has_x = extract_kmers(
            q_num, self.index.offsets_pat, self.index.span,
            self.index.alpha, self.x_index)
        keep = ~has_x
        pos = pos_all[keep]
        if len(pos) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int32)
        if self.take_only_best:
            return idx_all[keep], pos.astype(np.int32)
        gen = generator if generator is not None else self.generator
        # per-window composition-bias threshold adjustment
        # (QueryMatcher.cpp:260-271 rounding)
        bias_f = comp_bias[pos[:, None] + self.index.offsets_pat[None, :]
                           ].sum(axis=1)
        bias = np.trunc(np.where(bias_f < 0.0, bias_f - 0.5,
                                 bias_f + 0.5)).astype(np.int64)
        thr = np.maximum(self.kmer_thr - bias, 0)
        windows = q_num[pos[:, None]
                        + self.index.offsets_pat[None, :]].astype(np.int64)
        codes, win_of = gen.generate_all(windows, thr, pos)
        return codes, pos[win_of].astype(np.int32)

    def prepare_query(self, q_num, rescore_profile=None, generator=None):
        """Host stage for one query: returns (starts, counts, qpos, prof)."""
        if rescore_profile is not None:
            comp_bias = np.zeros(len(q_num), np.float32)
            prof = rescore_profile.astype(np.int32)
        else:
            if self.aa_bias_corr:
                comp_bias = calc_local_aa_bias(
                    q_num, self.seed.sub_matrix, self.seed.pback,
                    self.bias_scale)
            else:
                comp_bias = np.zeros(len(q_num), np.float32)
            corr = np.trunc(np.where(comp_bias < 0.0, comp_bias / 4 - 0.5,
                                     comp_bias / 4 + 0.5)).astype(np.int32)
            prof = (self.ungapped.sub_matrix[q_num, :].astype(np.int32)
                    + corr[:, None])
        codes, qpos = self.query_triples(q_num, comp_bias, generator)
        s, c = self.index.lists(codes)
        # drop empty posting lists host-side: most similar k-mers miss the
        # index entirely (sparse k-mer space), and shipping them to the
        # device costs transfer + expansion capacity for nothing
        nz = c > 0
        return (s[nz].astype(np.int32), c[nz].astype(np.int32), qpos[nz],
                prof)

    def candidates_batch(self, prepared, qlens):
        """Split-mode building block: per-query candidate fragments.

        prepared: list of (starts, counts, qpos) per query against THIS
        index split; qlens list. Returns per-query (local ids, diags u16,
        capped scores, {pos->exact score for saturated}) — stages 1-6 on
        device (prefilter/split_merge.py finalizes across splits)."""
        B = len(prepared)
        starts = np.concatenate([p[0] for p in prepared])
        counts = np.concatenate([p[1] for p in prepared])
        qpos = np.concatenate([p[2] for p in prepared])
        qid = np.concatenate([np.full(len(p[2]), b, np.int32)
                              for b, p in enumerate(prepared)])
        profs = [p[3] for p in prepared]
        total = int(counts.sum())
        if total == 0 or self.n_targets == 0:
            return [(np.zeros(0, np.int64), np.zeros(0, np.uint16),
                     np.zeros(0, np.int64), {}) for _ in range(B)]

        lq_max = _bucket(max(qlens), 64)
        alpha = self.ungapped.alphabet_size
        prof_pad = np.full((B, lq_max, alpha), -128, np.int32)
        for b in range(B):
            prof_pad[b, :qlens[b], :profs[b].shape[1]] = profs[b]
        ln_max = _bucket(min(lq_max, self.max_t_len), 64)
        K = len(starts)
        k_cap = _bucket(max(K, 1))
        h_cap = _bucket(max(total, 1), 4096)
        pad = k_cap - K
        starts = np.pad(starts, (0, pad))
        counts = np.pad(counts, (0, pad))
        qpos = np.pad(qpos, (0, pad))
        qid = np.pad(qid, (0, pad), constant_values=B - 1)
        d_prof = jnp.asarray(prof_pad)
        d_qlens = jnp.asarray(np.array(qlens, np.int32))

        # c_cap = h_cap: n_cand <= total always holds, so one static shape
        # per bucket — no grow-retry recompiles (each XLA compile costs
        # tens of seconds through the runtime tunnel)
        c_cap = h_cap
        bq, bi, bd, bs, n_best, n_cand = _device_candidates(
            jnp.asarray(starts), jnp.asarray(counts),
            jnp.asarray(qpos), jnp.asarray(qid),
            self.d_entries_seq, self.d_entries_pos,
            self.d_t_cat, self.d_t_offsets, self.d_t_lens,
            d_prof, d_qlens,
            h_cap=h_cap, c_cap=c_cap, n_q=B, lq_max=lq_max,
            ln_max=ln_max, chunk=min(4096, c_cap))
        n = int(n_best)
        bq = np.asarray(bq)[:n]
        bi = np.asarray(bi)[:n]
        bd = np.asarray(bd)[:n]
        bs = np.asarray(bs)[:n]

        # exact scores for saturated candidates, while this split's
        # sequence store is resident
        sat = bs >= UCHAR_MAX
        exacts = {}
        if sat.any():
            sq, si, sd = bq[sat], bi[sat], bd[sat]
            m = _bucket(len(sq), 256)
            va = np.zeros(m, bool)
            va[:len(sq)] = True
            ex = np.asarray(_device_exact(
                self.d_t_cat, self.d_t_offsets, self.d_t_lens,
                d_prof, d_qlens,
                jnp.asarray(np.pad(sq, (0, m - len(sq)))),
                jnp.asarray(np.pad(si, (0, m - len(si)))),
                jnp.asarray(np.pad(sd, (0, m - len(sd)))),
                jnp.asarray(va), lq_max=lq_max, ln_max=ln_max,
                chunk=min(4096, m)))[:len(sq)]
            for j in range(len(sq)):
                exacts.setdefault(int(sq[j]), {})[
                    (int(si[j]), int(sd[j]))] = int(ex[j])

        out = []
        for b in range(B):
            sel = bq == b
            out.append((bi[sel].astype(np.int64),
                        bd[sel].astype(np.uint16),
                        bs[sel].astype(np.int64),
                        exacts.get(b, {})))
        return out

    def match_batch(self, queries, identity_ids, rescore_profiles=None,
                    generators=None):
        """queries: list of numeric query arrays. Returns list of hit-tuple
        lists [(local target id, prefScore, diagonal i32), ...]."""
        B = len(queries)
        starts_l, counts_l, qpos_l, qid_l = [], [], [], []
        profs, qlens = [], []
        for b, q_num in enumerate(queries):
            rp = rescore_profiles[b] if rescore_profiles else None
            gen = generators[b] if generators else None
            s, c, qpos, prof = self.prepare_query(q_num, rp, gen)
            starts_l.append(s)
            counts_l.append(c)
            qpos_l.append(qpos)
            qid_l.append(np.full(len(qpos), b, np.int32))
            profs.append(prof)
            qlens.append(len(q_num))

        starts = np.concatenate(starts_l)
        counts = np.concatenate(counts_l)
        qpos = np.concatenate(qpos_l)
        qid = np.concatenate(qid_l)
        total = int(counts.sum())
        results = [[] for _ in range(B)]
        for b in range(B):
            if identity_ids[b] >= 0:
                results[b].append((identity_ids[b], USHRT_MAX, 0))
        if total == 0 or self.n_targets == 0:
            return results

        lq_max = _bucket(max(qlens), 64)
        alpha = self.ungapped.alphabet_size
        prof_pad = np.full((B, lq_max, alpha), -128, np.int32)
        for b in range(B):
            prof_pad[b, :qlens[b], :profs[b].shape[1]] = profs[b]
        ln_max = _bucket(min(lq_max, self.max_t_len), 64)

        K = len(starts)
        k_cap = _bucket(max(K, 1))
        h_cap = _bucket(max(total, 1), 4096)
        if h_cap > self.H_CAP_MAX:
            if B == 1:
                # single over-budget query: host oracle handles it
                if self.host_fallback is None:
                    raise MemoryError(
                        f"query hit volume {total} exceeds device capacity")
                gen = generators[0] if generators else None
                if gen is not None:
                    self.host_fallback.generator = gen
                rp = rescore_profiles[0] if rescore_profiles else None
                return [self.host_fallback.match(
                    queries[0], identity_ids[0], diagonal_scoring=True,
                    rescore_profile=rp)]
            mid = B // 2
            def sub(sl):
                return self.match_batch(
                    queries[sl], identity_ids[sl],
                    rescore_profiles[sl] if rescore_profiles else None,
                    generators[sl] if generators else None)
            return sub(slice(0, mid)) + sub(slice(mid, B))
        pad = k_cap - K
        starts = np.pad(starts, (0, pad))
        counts = np.pad(counts, (0, pad))
        qpos = np.pad(qpos, (0, pad))
        qid = np.pad(qid, (0, pad), constant_values=B - 1)
        out_sz = _bucket(B * self.max_hits, 256)

        c_cap = h_cap          # n_cand <= total: single compile per bucket
        (oq, oid, odiag, ofs, oval, n_cand, n_keep, truncated,
         tot) = _device_match(
            jnp.asarray(starts), jnp.asarray(counts), jnp.asarray(qpos),
            jnp.asarray(qid), self.d_entries_seq, self.d_entries_pos,
            self.d_t_cat, self.d_t_offsets, self.d_t_lens,
            jnp.asarray(prof_pad),
            jnp.asarray(np.array(qlens, np.int32)),
            jnp.asarray(np.array(identity_ids, np.int32)),
            h_cap=h_cap, c_cap=c_cap, n_q=B, lq_max=lq_max,
            ln_max=ln_max, max_hits=self.max_hits,
            min_diag_thr=self.min_diag_thr,
            chunk=min(4096, c_cap), out_sz=out_sz)
        oq = np.asarray(oq)
        oid = np.asarray(oid)
        odiag = np.asarray(odiag)
        ofs = np.asarray(ofs)
        oval = np.asarray(oval)
        truncated = np.asarray(truncated)

        for i in range(len(oq)):
            if not oval[i]:
                continue
            b = int(oq[i])
            if truncated[b]:
                continue
            results[b].append((int(oid[i]), int(ofs[i]),
                               int(np.int16(np.uint16(odiag[i])))))
        if truncated.any() and self.host_fallback is not None:
            for b in np.nonzero(truncated)[0]:
                gen = generators[b] if generators else None
                if gen is not None:
                    self.host_fallback.generator = gen
                rp = rescore_profiles[b] if rescore_profiles else None
                results[b] = self.host_fallback.match(
                    queries[b], identity_ids[b], diagonal_scoring=True,
                    rescore_profile=rp)
        return results
