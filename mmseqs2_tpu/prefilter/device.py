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
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.aot_cache import aot_call, source_hash
from ..ops.encode import calc_local_aa_bias
from ..utils.jaxcache import enable_jax_compile_cache
from .device_stages import (BIG, I32_MAX, bucket as _bucket, fast_cumsum,
                            make_rescore, make_rescore_from_letters,
                            stage_candidates, stage_candidates_pre,
                            stage_finalize, stage_hist, stage_keepmax,
                            stage_select, stage_zero, threshold_from_hist)
from .kmer_index import extract_kmers
from .query_matcher import UCHAR_MAX, USHRT_MAX


# --------------------------------------------------------------------------
# jitted core
# --------------------------------------------------------------------------

def _match_tail(rescore, cqid, cid, cdiag, cvalid, n_cand, total, identity,
                *, c_cap, n_q, max_hits, min_diag_thr, out_sz):
    """Stages 5-8 shared by every match program: rescore, keepmax,
    histogram threshold, top-K selection, exact saturated scores, final
    ordering, output packing."""
    cscore = rescore(cqid, cid, cdiag, cvalid, cap=True, n_valid=n_cand)
    is_best = stage_keepmax(cqid, cid, cscore, cvalid, c_cap=c_cap)
    hist = stage_hist(cqid, cscore, is_best, n_q=n_q, c_cap=c_cap)
    thr, truncated = threshold_from_hist(hist, max_hits, min_diag_thr)
    kqid, kid, kdiag, kscore, kvalid = stage_select(
        cqid, cid, cdiag, cscore, cvalid, is_best, thr, identity,
        c_cap=c_cap, max_hits=max_hits, out_sz=out_sz)
    n_keep = jnp.sum(kvalid.astype(jnp.int32))

    # exact (uncapped) scores for saturated kept hits (getResult :430-436)
    # — skipped entirely when nothing saturated (the common case on real
    # queries; the pass costs ~60 ms of window gathers per flush)
    sat = kvalid & (kscore >= UCHAR_MAX)
    n_sat = jnp.sum(sat.astype(jnp.int32))
    exact = jax.lax.cond(
        n_sat > 0,
        lambda: rescore(kqid, kid, kdiag, sat, cap=False, n_valid=n_keep),
        lambda: kscore)
    final_score = jnp.where(sat, exact, kscore)

    oq, _, oid, odiag, ofs, oval = stage_finalize(
        kqid, kid, kdiag, final_score, kvalid)
    # pack outputs into TWO arrays: each host fetch through the runtime
    # tunnel pays high fixed latency, so 9 per-array reads become 2
    big = jnp.stack([oq, oid, odiag, ofs, oval.astype(jnp.int32)])
    small = jnp.concatenate([
        jnp.stack([n_cand, n_keep, total.astype(jnp.int32)]),
        truncated.astype(jnp.int32)])
    return big, small


@functools.partial(
    jax.jit,
    static_argnames=("h_cap", "c_cap", "n_q", "lq_max", "ln_max",
                     "max_hits", "min_diag_thr", "chunk", "out_sz", "nt"))
def _device_match(starts, counts, qpos, qid,          # (K,) triples
                  entries_seq, entries_pos,           # (E,) index entries
                  t_cat, t_offsets, t_lens,           # target store
                  prof, q_lens, identity,             # (B,Lq,A), (B,), (B,)
                  *, h_cap, c_cap, n_q, lq_max, ln_max, max_hits,
                  min_diag_thr, chunk, out_sz, nt=None):
    # fixed-shape callers ship qpos as u16 and qid as u8 (–30% transfer
    # bytes through the ~60 MB/s tunnel); widen on device
    qpos = qpos.astype(jnp.int32)
    qid = qid.astype(jnp.int32)
    cqid, cid, cdiag, cvalid, n_cand, total = stage_candidates(
        starts, counts, qpos, qid, entries_seq, entries_pos,
        h_cap=h_cap, c_cap=c_cap, nt=nt)
    rescore = make_rescore(t_cat, t_offsets, t_lens, prof, q_lens,
                           lq_max=lq_max, ln_max=ln_max, chunk=chunk)
    return _match_tail(rescore, cqid, cid, cdiag, cvalid, n_cand, total,
                       identity, c_cap=c_cap, n_q=n_q, max_hits=max_hits,
                       min_diag_thr=min_diag_thr, out_sz=out_sz)


@functools.partial(
    jax.jit,
    static_argnames=("c_cap", "n_q", "lq_max", "ln_max",
                     "max_hits", "min_diag_thr", "chunk", "out_sz", "tb"))
def _device_match_pre(qtid, diag,                     # (H,) expansions
                      t_cat, t_offsets, t_lens,       # target store
                      q_pad, corr, submat, q_lens, identity,
                      *, c_cap, n_q, lq_max, ln_max, max_hits,
                      min_diag_thr, chunk, out_sz, tb):
    """Match program for HOST-expanded flushes: the posting expansion
    (contiguous-run numpy gathers, done in the prep thread pool) ships as
    shift-packed (qid<<tb|id, u16 diag) pairs; the device starts at the
    sort and rescores from query letters + bias correction (no profile
    transfer). Replaces _device_match for plain sequence queries — the
    XLA random gathers of the on-device expansion were ~70% of
    stage_candidates. `tb` is the id bit width, NOT the target count:
    one executable serves every DB size in the same 2^tb bucket (the
    2M-wide packed sort costs ~4 min of XLA compile per set of statics,
    AOT-cached thereafter)."""
    cqid, cid, cdiag, cvalid, n_cand, total = stage_candidates_pre(
        qtid, diag, c_cap=c_cap, tb=tb)
    # materialize the per-query rescore profile ON DEVICE (one row-gather
    # from the 32x32 submat + the bias-correction broadcast): the rescore
    # then pays 2 gathers/cell like the profile path — the letters-based
    # rescore's 4 gathers/cell cost more than the saved (B,Lq,A) transfer
    prof = (submat[q_pad.astype(jnp.int32)]
            + corr.astype(jnp.int32)[:, :, None])
    rescore = make_rescore(t_cat, t_offsets, t_lens, prof, q_lens,
                           lq_max=lq_max, ln_max=ln_max, chunk=chunk)
    return _match_tail(rescore, cqid, cid, cdiag, cvalid, n_cand, total,
                       identity, c_cap=c_cap, n_q=n_q, max_hits=max_hits,
                       min_diag_thr=min_diag_thr, out_sz=out_sz)


@functools.partial(
    jax.jit,
    static_argnames=("pat", "steps", "mults", "caps", "vmins", "steppowers",
                     "x_index"))
def _device_stage0(q_pad, qlens, thr_win, tabs, offsets32,
                   *, pat, steps, mults, caps, vmins, steppowers, x_index):
    """Stage-0 as its own program: the only per-flush host->device payload
    is the padded query letters plus per-window thresholds (~100 KB for 64
    queries) — the sub-k-mer score tables, CSR offsets, and index entries
    are device-resident. Kept separate from the match program: fusing the
    two blows up the XLA TPU backend's compile time (hours) while two
    programs with a device-array handoff compile in seconds each."""
    tables = [tabs[i] + (vmins[i], steppowers[i]) for i in range(len(steps))]
    starts, counts, qpos, qid, level_totals = stage_zero(
        q_pad, qlens, thr_win, tables, offsets32,
        pat=pat, steps=steps, mults=mults, caps=caps, x_index=x_index)
    # exact expansion total in two i32 halves (counts can sum past 2^31
    # when a batch needs splitting; i64 is emulated on TPU)
    tot_hi = jnp.sum(counts >> 16)
    tot_lo = jnp.sum(counts & 0xFFFF)
    return starts, counts, qpos, qid, jnp.concatenate(
        [level_totals.astype(jnp.int32), jnp.stack([tot_hi, tot_lo])])


@functools.partial(
    jax.jit,
    static_argnames=("h_cap", "c_cap", "n_q", "lq_max", "ln_max",
                     "max_hits", "min_diag_thr", "chunk", "out_sz", "nt"))
def _device_match_letters(starts, counts, qpos, qid,
                          entries_seq, entries_pos,
                          t_cat, t_offsets, t_lens,
                          q_pad, corr, submat, q_lens, identity,
                          *, h_cap, c_cap, n_q, lq_max, ln_max, max_hits,
                          min_diag_thr, chunk, out_sz, nt=None):
    """_device_match with the rescore profile derived on device from the
    query letters + bias correction (no (B,Lq,A) profile transfer)."""
    cqid, cid, cdiag, cvalid, n_cand, total = stage_candidates(
        starts, counts, qpos, qid, entries_seq, entries_pos,
        h_cap=h_cap, c_cap=c_cap, nt=nt)
    rescore = make_rescore_from_letters(
        t_cat, t_offsets, t_lens, q_pad, corr, submat, q_lens,
        lq_max=lq_max, ln_max=ln_max, chunk=chunk)
    return _match_tail(rescore, cqid, cid, cdiag, cvalid, n_cand, total,
                       identity, c_cap=c_cap, n_q=n_q, max_hits=max_hits,
                       min_diag_thr=min_diag_thr, out_sz=out_sz)


def _aot(fn_jit, name, args, **static):
    """Route a jitted prefilter program through the AOT executable cache
    (ops/aot_cache): a fresh process otherwise re-traces each shape for
    seconds before the XLA disk cache even applies. CPU backend (tests)
    keeps the plain jit path."""
    if jax.default_backend() == "cpu":
        return fn_jit(*args, **static)
    from . import device_stages as _ds
    key = (name, _SRC_HASH, source_hash(_ds.__file__),
           tuple(sorted(static.items())))
    return aot_call(
        lambda: fn_jit.lower(*args, **static).compile(),
        key, args, lambda *a: fn_jit(*a, **static))


_SRC_HASH = source_hash(__file__)
_TABLE_CACHE = {}


def _pow2(n: int) -> int:
    """Next power of two >= n (shape-bucket helper; each distinct static
    shape keys a minutes-long XLA compile of the match program)."""
    return 1 << max(int(n) - 1, 0).bit_length()


def _build_table_device(sub_matrix, alpha, k):
    """Device-built ExtendedSubstitutionMatrix: score-desc sorted sub-k-mer
    rows + suffix-count LUT, resident in HBM (reference precomputes the
    same ScoreMatrix host-side, ExtendedSubstitutionMatrix.cpp). Returns
    ((scores i16 (S,S), idx i32 (S,S), cnt i32 (S,V)), vmin, powers)."""
    key = (sub_matrix[:alpha, :alpha].tobytes(), alpha, k,
           jax.default_backend())
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    S = alpha ** k
    powers = (alpha ** np.arange(k)).astype(np.int64)
    digits = np.stack([((np.arange(S) // powers[i]) % alpha)
                       for i in range(k)]).astype(np.int32)
    be = np.zeros(S, np.int64)
    for i in range(k):
        be = be * alpha + digits[i]
    mat = sub_matrix[:alpha, :alpha].astype(np.int32)
    vmin = int(mat.min()) * k
    V = int(mat.max()) * k - vmin + 1

    @jax.jit
    def build(mat_d, dig, be_d):
        s = jnp.zeros((S, S), jnp.int32)
        for i in range(k):
            s = s + mat_d[dig[i][:, None], dig[i][None, :]]
        # score desc, tie lexicographic: same composite key as
        # SubKmerScores.ensure_rows; keys are unique so argsort order
        # is deterministic
        key_ = (-s) * np.int32(S) + be_d[None, :]
        order = jnp.argsort(key_, axis=1).astype(jnp.int32)
        ss = jnp.take_along_axis(s, order, axis=1).astype(jnp.int16)
        hist = jnp.zeros((S, V), jnp.int32).at[
            jnp.arange(S)[:, None], s - vmin].add(1)
        cnt = jnp.cumsum(hist[:, ::-1], axis=1)[:, ::-1]
        return ss, order, cnt

    ss, order, cnt = build(jnp.asarray(mat), jnp.asarray(digits),
                           jnp.asarray(be.astype(np.int32)))
    out = ((ss, order, cnt), vmin, tuple(int(p) for p in powers))
    _TABLE_CACHE[key] = out
    return out


def _build_offsets32_device(index_table):
    """Upload the k-mer CSR offsets as i32, shipping only the non-empty
    (code, count) pairs and rebuilding the dense offsets with a device
    scatter + cumsum (the dense int64 offsets are ~512 MB; the tunnel
    moves ~60 MB/s)."""
    tsz = int(index_table.table_size)
    if getattr(index_table, "sparse", False):
        nz = np.asarray(index_table.uniq_kmers, np.int64)
        cnts = np.diff(index_table.offsets).astype(np.int32)
    else:
        diff = np.diff(index_table.offsets)
        nz = np.nonzero(diff)[0]
        cnts = diff[nz].astype(np.int32)

    @jax.jit
    def build(nz_d, c_d):
        arr = jnp.zeros(tsz + 1, jnp.int32).at[nz_d + 1].add(
            c_d, mode="drop")
        return fast_cumsum(arr)

    return build(jnp.asarray(nz.astype(np.int32)), jnp.asarray(cnts))


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
        enable_jax_compile_cache()
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
        # u32 seq id + u16 position — and 1 B/residue sequence store).
        # Upload the mmapped index views AS-IS (dtype-converting copies of
        # the 152M-entry SwissProt-scale arrays cost ~15 s host time; every
        # device gather into them is in-bounds by construction, so no pad
        # slot is needed — XLA clamps OOB gathers anyway)
        if hasattr(seqs, "cat"):
            t_cat = seqs.cat.view(np.int8)       # residues < 128: free view
        else:
            t_cat = (np.concatenate(seqs) if len(seqs) else
                     np.zeros(0, np.uint8)).astype(np.int8, copy=False)
        eseq = np.asarray(index_table.entries_seq)
        epos = np.asarray(index_table.entries_pos)
        if len(eseq) == 0:
            eseq, epos = np.zeros(1, np.int32), np.zeros(1, np.uint16)
        if len(t_cat) == 0:
            t_cat = np.zeros(1, np.int8)
        self.d_entries_seq = jnp.asarray(
            eseq.astype(np.int32, copy=False))
        self.d_entries_pos = jnp.asarray(
            epos.astype(np.uint16, copy=False))
        self.d_t_cat = jnp.asarray(t_cat)
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
        """Host stage for one query.

        Returns (starts, counts, qpos, prof[, corr, ids, diag]): the
        7-tuple form (plain sequence queries) additionally carries the
        i8 bias correction and the HOST-side posting expansion — target
        ids (i32) and u16 diagonals per expanded match, in expansion
        order. The expansion is contiguous-run gathers that numpy does at
        memcpy speed here in the prep thread pool, feeding
        _device_match_pre (profile queries keep the 4-tuple device
        expansion path)."""
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
        s, c, qpos = s[nz].astype(np.int32), c[nz].astype(np.int32), qpos[nz]
        if rescore_profile is not None:
            return (s, c, qpos, prof)
        ids, diag = self._expand_host(s, c, qpos)
        return (s, c, qpos, prof, corr.astype(np.int8), ids, diag)

    def _expand_host(self, starts, counts, qpos):
        """Posting expansion for one query: (ids i32, diag u16) per
        expanded (query window, index entry) match, expansion order."""
        total = int(counts.sum())
        if total == 0:
            return np.zeros(0, np.int32), np.zeros(0, np.uint16)
        trip = np.repeat(np.arange(len(counts), dtype=np.int32), counts)
        offs = np.concatenate([[0], np.cumsum(counts[:-1],
                                              dtype=np.int64)])
        within = np.arange(total, dtype=np.int64) - offs[trip]
        ent = starts[trip].astype(np.int64) + within
        ids = np.asarray(self.index.entries_seq)[ent].astype(np.int32,
                                                            copy=False)
        tpos = np.asarray(self.index.entries_pos)[ent]   # u16; upcasts
        diag = ((qpos[trip].astype(np.int32, copy=False) - tpos)
                & 0xFFFF).astype(np.uint16)
        return ids, diag

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
        bq, bi, bd, bs, n_best, n_cand = _aot(
            _device_candidates, "dc",
            (jnp.asarray(starts), jnp.asarray(counts),
             jnp.asarray(qpos), jnp.asarray(qid),
             self.d_entries_seq, self.d_entries_pos,
             self.d_t_cat, self.d_t_offsets, self.d_t_lens,
             d_prof, d_qlens),
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

    # fixed-shape flush geometry: _run_device batches queries so every
    # device call compiles to the SAME program (one executable per
    # process, vs one per power-of-two hit-volume bucket). B_PAD*2^tb must
    # stay < 2^31 for the shift-packed candidate sort (nt up to ~8M
    # targets at B_PAD=128; bigger DBs take the unpacked path /
    # auto-split). H_CAP stays at 2M: the packed sort's XLA compile time
    # is superlinear in width (~4 min at 2^21, >35 min at 2^22).
    B_PAD = 128
    H_CAP_FIXED = 1 << 21
    C_CAP_FIXED = 1 << 17

    # device stage-0 geometry (match_batch_seq): queries padded to
    # (B_PAD, LQ0); similar-k-mer expansion levels capped per CAPS*
    # H0 at 2^21: the packed candidate sort's XLA TPU compile time grows
    # superlinearly with width (~4 min at 2^21, >10 min at 2^22); results
    # are disk-cached, and volume overflow falls back to batch splitting
    LQ0 = 512
    H0_CAP = 1 << 21
    C0_CAP = 1 << 17
    CAPS2 = (1 << 22, 1 << 23)
    CAPS3 = (1 << 21, 1 << 22, 1 << 23)

    def _ensure_stage0(self):
        """Build/upload the device-resident stage-0 tables once: sorted
        sub-k-mer score tables, suffix-count LUTs, i32 CSR offsets.
        Returns True when the device stage-0 path is usable."""
        s = getattr(self, "_stage0", None)
        if s is not None:
            return s
        ok = (not self.take_only_best and self.generator is not None
              and hasattr(self, "d_entries_seq")
              and getattr(self.index, "offsets", None) is not None)
        if ok:
            # Opt-in (MMSEQS2_TPU_STAGE0=1): on the current chip XLA's
            # elementwise gathers run at ~12 ns/element, so the on-device
            # expansion (~40M gathers/flush) loses to the vectorized host
            # stage-0 + packed transfers (42 vs 15 ms/query measured on
            # the 50k bench index). The path is kept correct + tested as
            # the design point for a Pallas row-DMA expansion kernel.
            ok = os.environ.get("MMSEQS2_TPU_STAGE0", "") == "1"
        if ok:
            from .kmer_generator import KmerGenerator
            ok = (type(self.generator) is KmerGenerator
                  and int(self.index.table_size)
                  == self.generator.alpha ** self.k)
        if not ok:
            self._stage0 = False
            return False
        gen = self.generator
        steps = tuple(gen.steps)
        tabs, vmins, powers = [], [], []
        for st in steps:
            (arrs, vmin, pw) = _build_table_device(
                self.seed.sub_matrix, gen.alpha, st)
            tabs.append(arrs)
            vmins.append(vmin)
            powers.append(pw)
        offs = np.concatenate([[0], np.cumsum(steps)])[:-1]
        self._s0_steps = steps
        self._s0_tabs = tuple(tabs)
        self._s0_vmins = tuple(vmins)
        self._s0_steppowers = tuple(powers)
        self._s0_mults = tuple(int(gen.powers[o]) for o in offs)
        self._s0_offsets32 = _build_offsets32_device(self.index)
        self._s0_pat = tuple(int(x) for x in self.index.offsets_pat)
        self._d_submat = jnp.asarray(
            self.ungapped.sub_matrix.astype(np.int32))
        self._stage0 = True
        return True

    def match_batch_seq(self, queries, identity_ids):
        """match_batch for plain sequence queries with stage-0 on device:
        ships ~(B, 512) letters + per-window thresholds, nothing else."""
        return self.match_batch_seq_wait(
            self.match_batch_seq_async(queries, identity_ids))

    def match_batch_seq_async(self, queries, identity_ids):
        """Dispatch half of match_batch_seq: host prep + both device
        programs, NO result fetch. Returns a pending handle for
        match_batch_seq_wait — callers can dispatch flush N+1 before
        fetching flush N so device compute overlaps host work (every
        fetch through the runtime tunnel blocks ~35 ms+)."""
        B = len(queries)
        results = [[] for _ in range(B)]
        for b in range(B):
            if identity_ids[b] >= 0:
                results[b].append((identity_ids[b], USHRT_MAX, 0))
        if self.n_targets == 0:
            return {"done": results}
        n_q = self.B_PAD
        lq = self.LQ0
        span = int(self.index.span)
        Wmax = lq - span + 1
        q_pad = np.full((n_q, lq), self.x_index, np.int32)
        corr = np.zeros((n_q, lq), np.int32)
        thr_win = np.full((n_q, Wmax), 1 << 29, np.int32)
        qlens_pad = np.ones(n_q, np.int32)
        idents = np.full(n_q, -1, np.int32)
        idents[:B] = identity_ids
        pat_np = np.asarray(self._s0_pat)
        for b, q in enumerate(queries):
            L = len(q)
            q_pad[b, :L] = q
            qlens_pad[b] = L
            if self.aa_bias_corr:
                cb = calc_local_aa_bias(q, self.seed.sub_matrix,
                                        self.seed.pback, self.bias_scale)
            else:
                cb = np.zeros(L, np.float32)
            corr[b, :L] = np.trunc(np.where(cb < 0.0, cb / 4 - 0.5,
                                            cb / 4 + 0.5)).astype(np.int32)
            nw = L - span + 1
            if nw > 0:
                bias_f = cb[np.arange(nw)[:, None]
                            + pat_np[None, :]].sum(axis=1)
                bias = np.trunc(np.where(bias_f < 0.0, bias_f - 0.5,
                                         bias_f + 0.5))
                thr_win[b, :nw] = np.maximum(
                    self.kmer_thr - bias, 0).astype(np.int32)
        ln_max = _bucket(min(lq, self.max_t_len), 64)
        out_sz = _bucket(n_q * self.max_hits, 256)
        nt = (self.n_targets
              if n_q * max(self.n_targets, 1) < (1 << 31) else None)
        caps = self.CAPS3 if len(self._s0_steps) == 3 else self.CAPS2
        d_q_pad = jnp.asarray(q_pad)
        d_qlens = jnp.asarray(qlens_pad)
        starts, counts, qposd, qidd, s0_small = _aot(
            _device_stage0, "s0",
            (d_q_pad, d_qlens, jnp.asarray(thr_win),
             self._s0_tabs, self._s0_offsets32),
            pat=self._s0_pat, steps=self._s0_steps, mults=self._s0_mults,
            caps=caps, vmins=self._s0_vmins,
            steppowers=self._s0_steppowers, x_index=self.x_index)
        big, small = _aot(
            _device_match_letters, "ml",
            (starts, counts, qposd, qidd,
             self.d_entries_seq, self.d_entries_pos,
             self.d_t_cat, self.d_t_offsets, self.d_t_lens,
             d_q_pad, jnp.asarray(corr), self._d_submat, d_qlens,
             jnp.asarray(idents)),
            h_cap=self.H0_CAP, c_cap=self.C0_CAP, n_q=n_q, lq_max=lq,
            ln_max=ln_max, max_hits=self.max_hits,
            min_diag_thr=self.min_diag_thr, chunk=4096, out_sz=out_sz,
            nt=nt)
        return {"queries": queries, "identity_ids": identity_ids,
                "results": results, "big": big, "small": small,
                "s0_small": s0_small, "caps": caps, "n_q": n_q}

    def match_batch_seq_wait(self, pend):
        """Fetch + post-process a match_batch_seq_async dispatch."""
        if "done" in pend:
            return pend["done"]
        queries = pend["queries"]
        identity_ids = pend["identity_ids"]
        results = pend["results"]
        caps = pend["caps"]
        n_q = pend["n_q"]
        B = len(queries)
        big = np.asarray(pend["big"])
        small = np.asarray(pend["small"])
        s0_small = np.asarray(pend["s0_small"])
        n_levels = len(self._s0_steps)
        n_cand = int(small[0])
        total = (int(s0_small[n_levels]) << 16) + int(s0_small[n_levels + 1])
        levels = s0_small[:n_levels]
        truncated = small[3:3 + n_q].astype(bool)
        overflow = (n_cand > self.C0_CAP or total > self.H0_CAP
                    or any(int(levels[i]) > caps[i]
                           for i in range(n_levels)))
        if overflow:
            if B > 1:
                mid = B // 2
                return (self.match_batch_seq(queries[:mid],
                                             identity_ids[:mid])
                        + self.match_batch_seq(queries[mid:],
                                               identity_ids[mid:]))
            if self.host_fallback is not None:
                return [self.host_fallback.match(
                    queries[0], identity_ids[0], diagonal_scoring=True)]
            raise MemoryError("stage-0 expansion exceeds device caps")
        oq, oid, odiag, ofs, oval = big
        sel = np.nonzero(oval.astype(bool))[0]
        oqs, oids, ofss = oq[sel], oid[sel], ofs[sel]
        diags = np.int16(odiag[sel].astype(np.uint16))
        bounds = np.searchsorted(oqs, np.arange(B + 1))
        for b in range(B):
            if truncated[b]:
                continue
            for i in range(int(bounds[b]), int(bounds[b + 1])):
                results[b].append((int(oids[i]), int(ofss[i]),
                                   int(diags[i])))
        if truncated[:B].any() and self.host_fallback is not None:
            for b in np.nonzero(truncated[:B])[0]:
                results[b] = self.host_fallback.match(
                    queries[b], identity_ids[b], diagonal_scoring=True)
        return results

    def match_batch(self, queries, identity_ids, rescore_profiles=None,
                    generators=None, prepared=None, fixed_shape=False):
        """queries: list of numeric query arrays. Returns list of hit-tuple
        lists [(local target id, prefScore, diagonal i32), ...].

        `prepared`: optional precomputed per-query stage-0 results
        (starts, counts, qpos, prof) — _run_device streams these so the
        flush decision can see actual expansion volumes. `fixed_shape`:
        pad the batch to (B_PAD, H_CAP_FIXED, C_CAP_FIXED) so every flush
        reuses one compiled program."""
        return self.match_batch_wait(self.match_batch_async(
            queries, identity_ids, rescore_profiles, generators,
            prepared, fixed_shape))

    def match_batch_async(self, queries, identity_ids,
                          rescore_profiles=None, generators=None,
                          prepared=None, fixed_shape=False):
        """Dispatch half of match_batch (see match_batch_seq_async for the
        pipelining contract)."""
        B = len(queries)
        if (prepared is None and rescore_profiles is None
                and generators is None
                and all(len(q) <= self.LQ0 for q in queries)
                and self._ensure_stage0()):
            if B <= self.B_PAD:
                return self.match_batch_seq_async(queries, identity_ids)
            out = []
            for lo in range(0, B, self.B_PAD):
                out += self.match_batch_seq(
                    queries[lo:lo + self.B_PAD],
                    identity_ids[lo:lo + self.B_PAD])
            return {"done": out}
        if prepared is None:
            prepared = [
                self.prepare_query(
                    q, rescore_profiles[b] if rescore_profiles else None,
                    generators[b] if generators else None)
                for b, q in enumerate(queries)]
        starts = np.concatenate([p[0] for p in prepared])
        counts = np.concatenate([p[1] for p in prepared])
        qpos = np.concatenate([p[2] for p in prepared])
        qid = np.concatenate([np.full(len(p[2]), b, np.int32)
                              for b, p in enumerate(prepared)])
        profs = [p[3] for p in prepared]
        qlens = [len(q) for q in queries]
        total = int(counts.sum())
        results = [[] for _ in range(B)]
        for b in range(B):
            if identity_ids[b] >= 0:
                results[b].append((identity_ids[b], USHRT_MAX, 0))
        if total == 0 or self.n_targets == 0:
            return {"done": results}

        # plain sequence queries whose prep carries the host expansion
        # take the pre-expanded program (device starts at the sort; no
        # profile transfer) whenever the packed qid<<tb|id key fits i32
        if (rescore_profiles is None and generators is None
                and all(len(p) >= 7 for p in prepared)
                and max(B, self.B_PAD) << self._tb() < (1 << 31)):
            return self._match_pre_async(queries, identity_ids, prepared,
                                         fixed_shape, results, total)

        # fixed shape only pays off when flushes are large: padding a
        # toy batch to H_CAP_FIXED would turn a 1k-element sort into a
        # 2M-element one. Small workloads take the bucketed path.
        use_fixed = (fixed_shape and B <= self.B_PAD
                     and (1 << 16) < total <= self.H_CAP_FIXED
                     and self.B_PAD * max(self.n_targets, 1) < (1 << 31))
        n_q = self.B_PAD if use_fixed else B
        lq_max = _bucket(max(qlens), 64)
        if use_fixed:
            lq_max = max(lq_max, 512)
        alpha = self.ungapped.alphabet_size
        prof_pad = np.full((n_q, lq_max, alpha), -128, np.int32)
        for b in range(B):
            prof_pad[b, :qlens[b], :profs[b].shape[1]] = profs[b]
        ln_max = _bucket(min(lq_max, self.max_t_len), 64)

        K = len(starts)
        k_cap = _bucket(max(K, 1))
        if use_fixed:
            k_cap = max(k_cap, 1 << 20)   # remainder flushes reuse shape
        h_cap = self.H_CAP_FIXED if use_fixed \
            else _bucket(max(total, 1), 4096)
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
                return {"done": [self.host_fallback.match(
                    queries[0], identity_ids[0], diagonal_scoring=True,
                    rescore_profile=rp)]}
            return {"done": self._split_batch(queries, identity_ids,
                                              rescore_profiles, generators,
                                              prepared, fixed_shape)}
        pad = k_cap - K
        starts = np.pad(starts, (0, pad))
        counts = np.pad(counts, (0, pad))
        qpos = np.pad(qpos, (0, pad))
        qid = np.pad(qid, (0, pad), constant_values=n_q - 1)
        out_sz = _bucket(n_q * self.max_hits, 256)
        idents = np.full(n_q, -1, np.int32)
        idents[:B] = identity_ids
        qlens_pad = np.ones(n_q, np.int32)
        qlens_pad[:B] = qlens
        if max(qlens) < (1 << 16) and n_q <= 255:
            qpos = qpos.astype(np.uint16)     # widened on device
            qid = qid.astype(np.uint8)

        # packed-key candidate sort needs n_q*nt < 2^31
        nt = self.n_targets if n_q * max(self.n_targets, 1) < (1 << 31) \
            else None
        c_cap = self.C_CAP_FIXED if use_fixed else h_cap
        big, small = _aot(
            _device_match, "dm",
            (jnp.asarray(starts), jnp.asarray(counts), jnp.asarray(qpos),
             jnp.asarray(qid), self.d_entries_seq, self.d_entries_pos,
             self.d_t_cat, self.d_t_offsets, self.d_t_lens,
             jnp.asarray(prof_pad),
             jnp.asarray(qlens_pad), jnp.asarray(idents)),
            h_cap=h_cap, c_cap=c_cap, n_q=n_q, lq_max=lq_max,
            ln_max=ln_max, max_hits=self.max_hits,
            min_diag_thr=self.min_diag_thr,
            chunk=min(4096, c_cap), out_sz=out_sz, nt=nt)
        return {"queries": queries, "identity_ids": identity_ids,
                "rescore_profiles": rescore_profiles,
                "generators": generators, "prepared": prepared,
                "fixed_shape": fixed_shape, "results": results,
                "big": big, "small": small, "n_q": n_q, "c_cap": c_cap}

    def _get_d_submat(self):
        d = getattr(self, "_d_submat", None)
        if d is None:
            d = self._d_submat = jnp.asarray(
                self.ungapped.sub_matrix.astype(np.int32))
        return d

    def _tb(self):
        """Bit width of the target-id field in the shift-packed sort key,
        bucketed to even widths so one compiled program serves a whole
        range of DB sizes (the static is tb, not nt)."""
        b = max(int(self.n_targets - 1).bit_length(), 1)
        return (b + 1) & ~1          # round up to even: <=2 buckets/4x

    def _match_pre_async(self, queries, identity_ids, prepared,
                         fixed_shape, results, total):
        """Dispatch a host-expanded flush (see _device_match_pre)."""
        B = len(queries)
        qlens = [len(q) for q in queries]
        use_fixed = (fixed_shape and B <= self.B_PAD
                     and (1 << 16) < total <= self.H_CAP_FIXED)
        n_q = self.B_PAD if use_fixed else B
        h_cap = self.H_CAP_FIXED if use_fixed \
            else _bucket(max(total, 1), 4096)
        if h_cap > self.H_CAP_MAX:
            if B == 1:
                if self.host_fallback is None:
                    raise MemoryError(
                        f"query hit volume {total} exceeds device capacity")
                return {"done": [self.host_fallback.match(
                    queries[0], identity_ids[0], diagonal_scoring=True)]}
            return {"done": self._split_batch(queries, identity_ids, None,
                                              None, prepared, fixed_shape)}
        c_cap = self.C_CAP_FIXED if use_fixed else h_cap
        # power-of-two shape buckets: every static here keys a compiled
        # program (~4 min XLA compile each), so keep the bucket set tiny
        lq_max = max(_pow2(max(qlens)), 512)
        ln_max = _pow2(max(min(lq_max, self.max_t_len), 128))
        tb = self._tb()
        qtid = np.full(h_cap, I32_MAX, np.int32)
        diag = np.zeros(h_cap, np.uint16)
        off = 0
        for b, p in enumerate(prepared):
            n = len(p[5])
            qtid[off:off + n] = p[5] + np.int32(b << tb)
            diag[off:off + n] = p[6]
            off += n
        q_pad = np.full((n_q, lq_max), self.x_index, np.uint8)
        corr = np.zeros((n_q, lq_max), np.int8)
        for b, q in enumerate(queries):
            L = qlens[b]
            q_pad[b, :L] = q
            corr[b, :L] = prepared[b][4]
        qlens_pad = np.ones(n_q, np.int32)
        qlens_pad[:B] = qlens
        idents = np.full(n_q, -1, np.int32)
        idents[:B] = identity_ids
        out_sz = _bucket(n_q * self.max_hits, 256)
        big, small = _aot(
            _device_match_pre, "mp",
            (jnp.asarray(qtid), jnp.asarray(diag),
             self.d_t_cat, self.d_t_offsets, self.d_t_lens,
             jnp.asarray(q_pad), jnp.asarray(corr), self._get_d_submat(),
             jnp.asarray(qlens_pad), jnp.asarray(idents)),
            c_cap=c_cap, n_q=n_q, lq_max=lq_max, ln_max=ln_max,
            max_hits=self.max_hits, min_diag_thr=self.min_diag_thr,
            chunk=min(4096, c_cap), out_sz=out_sz, tb=tb)
        return {"queries": queries, "identity_ids": identity_ids,
                "rescore_profiles": None, "generators": None,
                "prepared": prepared, "fixed_shape": fixed_shape,
                "results": results, "big": big, "small": small,
                "n_q": n_q, "c_cap": c_cap}

    def match_batch_wait(self, pend):
        """Fetch + post-process a match_batch_async dispatch."""
        if "done" in pend:
            return pend["done"]
        if "s0_small" in pend:
            return self.match_batch_seq_wait(pend)
        queries = pend["queries"]
        identity_ids = pend["identity_ids"]
        rescore_profiles = pend["rescore_profiles"]
        generators = pend["generators"]
        results = pend["results"]
        n_q, c_cap = pend["n_q"], pend["c_cap"]
        B = len(queries)
        big = np.asarray(pend["big"])
        small = np.asarray(pend["small"])
        oq, oid, odiag, ofs, oval = big
        n_cand, truncated = int(small[0]), small[3:3 + n_q].astype(bool)
        if n_cand > c_cap:
            # candidate overflow past the fixed compaction cap: re-run
            # split so no candidate is dropped (rare: C_CAP_FIXED holds
            # ~0.1M per-diagonal double-hits per flush)
            if B > 1:
                return self._split_batch(
                    queries, identity_ids, rescore_profiles, generators,
                    pend["prepared"], pend["fixed_shape"])
            if self.host_fallback is not None:
                gen = generators[0] if generators else None
                if gen is not None:
                    self.host_fallback.generator = gen
                rp = rescore_profiles[0] if rescore_profiles else None
                return [self.host_fallback.match(
                    queries[0], identity_ids[0], diagonal_scoring=True,
                    rescore_profile=rp)]
            raise MemoryError(f"candidate volume {n_cand} exceeds c_cap")

        sel = np.nonzero(oval.astype(bool) & (oq < B))[0]
        oqs, oids, ofss = oq[sel], oid[sel], ofs[sel]
        diags = np.int16(odiag[sel].astype(np.uint16))
        bounds = np.searchsorted(oqs, np.arange(B + 1))
        for b in range(B):
            if truncated[b]:
                continue
            for i in range(int(bounds[b]), int(bounds[b + 1])):
                results[b].append((int(oids[i]), int(ofss[i]),
                                   int(diags[i])))
        if truncated[:B].any() and self.host_fallback is not None:
            for b in np.nonzero(truncated[:B])[0]:
                gen = generators[b] if generators else None
                if gen is not None:
                    self.host_fallback.generator = gen
                rp = rescore_profiles[b] if rescore_profiles else None
                results[b] = self.host_fallback.match(
                    queries[b], identity_ids[b], diagonal_scoring=True,
                    rescore_profile=rp)
        return results

    def _split_batch(self, queries, identity_ids, rescore_profiles,
                     generators, prepared, fixed_shape):
        B = len(queries)
        mid = B // 2

        def sub(sl):
            return self.match_batch(
                queries[sl], identity_ids[sl],
                rescore_profiles[sl] if rescore_profiles else None,
                generators[sl] if generators else None,
                prepared[sl] if prepared else None,
                fixed_shape)
        return sub(slice(0, mid)) + sub(slice(mid, B))
