"""Batched gapped aligner: device SW score/endpoint kernels + host backtrace.

TPU-first shape of the reference Matcher/SmithWaterman stack
(/root/reference/src/alignment/Matcher.cpp:62-160,
 /root/reference/src/alignment/StripedSmithWaterman.cpp):

  1. forward pass: all candidate targets of a query are padded into length
     buckets and scored by one batched `sw_scan` (score, qEnd, tEnd);
  2. gates (E-value, optimistic coverage from end positions) mirror
     ssw_align_private's early returns;
  3. reverse pass: per-pair reversed prefixes q[:qEnd+1], t[:tEnd+1] are
     re-batched and scanned once more for start positions;
  4. the backtrace for accepted pairs runs host-side via the banded DP
     (ops/banded.py), exactly like the reference's banded_sw stage.

Modes mirror Matcher: SCORE_ONLY(0) stops after 1, SCORE_COV(1) after 3,
SCORE_COV_SEQID(2) runs all stages. Identity hits take the scoreIdentical
shortcut (including its int16 score accumulator).
"""

from dataclasses import dataclass

import numpy as np

from ..ops import dp
from ..ops.banded import banded_align_scores
from ..ops.encode import (bucket_length, calc_local_aa_bias, round_bias_i8,
                          make_query_profile)
from . import util

SCORE_ONLY = 0
SCORE_COV = 1
SCORE_COV_SEQID = 2

ALPHA_PAD = 32
PAD_LETTER = ALPHA_PAD - 1


@dataclass
class AlnResult:
    db_key: int
    score: int          # bit score (rounded int)
    raw_score: int
    seq_id: float
    eval: float
    q_start: int
    q_end: int
    q_len: int
    db_start: int
    db_end: int
    db_len: int
    qcov: float = 0.0
    dbcov: float = 0.0
    aln_length: int = 0
    backtrace: str = ""

    def to_line(self, add_backtrace: bool) -> str:
        return util.result_to_line(self, add_backtrace)


@dataclass
class QueryContext:
    q_num: np.ndarray           # numeric residues (int)
    comp_bias_i8: np.ndarray    # int8 per position
    profile: np.ndarray         # (ALPHA_PAD, Lq_bucket) int32, bias included
    bias: int                   # |min(mat)| + |min(comp bias)|  (gapless cap)


def _lane_pad(n: int) -> int:
    """Canonical lane counts: 512 (one BT block, small/toy runs) or 4096
    (eight blocks, bulk runs) — exactly two batch shapes per length bucket
    instead of one compile per candidate-count."""
    return 512 if n <= 512 else 4096


def sort_results(results):
    """Matcher::compareHits: eval asc, bit score desc, dbLen asc, key asc."""
    results.sort(key=lambda r: (r.eval, -r.score, r.db_len, r.db_key))
    return results


class Aligner:
    def __init__(self, submat, gap_open: int, gap_extend: int, evaluer,
                 comp_bias_corr: bool = True, comp_bias_scale: float = 1.0,
                 corr_score_weight: float = 0.0):
        self.submat = submat
        self.mat = submat.sub_matrix.astype(np.int32)
        self.go = int(gap_open)
        self.ge = int(gap_extend)
        if self.go < self.ge:
            raise ValueError("gap_open < gap_extend unsupported by the "
                             "prefix-cummax lazy-F closure")
        self.evaluer = evaluer
        self.comp_bias_corr = comp_bias_corr
        self.comp_bias_scale = comp_bias_scale
        self.corr_score_weight = float(corr_score_weight)
        self.mat_min = int(self.mat[: submat.alphabet_size,
                                    : submat.alphabet_size].min())

    # -- query setup ---------------------------------------------------------

    def _bucket_min(self) -> int:
        """Minimum length bucket. On TPU every distinct jitted shape pays
        ~3s of per-process overhead (Mosaic lowering + remote executable
        load through the runtime tunnel) even on a persistent-cache hit, so
        buckets are clamped to >= 512: short queries/targets pad into ONE
        canonical shape and the padded cells (microseconds of device time)
        replace whole seconds of per-shape fixed cost."""
        return 512 if self._use_pallas() else 32

    def init_query(self, q_num: np.ndarray) -> QueryContext:
        if self.comp_bias_corr:
            cb = calc_local_aa_bias(q_num, self.mat, self.submat.pback,
                                    self.comp_bias_scale)
            cb_i8 = round_bias_i8(cb)
            comp_bias_min = min(0, int(cb_i8.min()) if len(cb_i8) else 0)
        else:
            cb_i8 = np.zeros(len(q_num), dtype=np.int8)
            comp_bias_min = 0
        bias = abs(self.mat_min) + abs(comp_bias_min)
        profile = make_query_profile(
            q_num, self.mat, cb_i8, alpha_pad=ALPHA_PAD,
            pad_len=bucket_length(len(q_num), self._bucket_min()))
        return QueryContext(q_num, cb_i8, profile, bias)

    def init_profile_query(self, prof_entry) -> QueryContext:
        """Query context for a DBTYPE_HMM_PROFILE entry.

        ssw_init profile branch (StripedSmithWaterman.cpp:1388-1407): the
        column scores are the profile's alignment scores (pssm/4, X row 0),
        no composition bias, and the byte-kernel bias is |min| over the 20
        amino-acid rows only.
        """
        from ..profile.io import alignment_profile
        L = prof_entry.length
        prof = alignment_profile(prof_entry, alpha_pad=ALPHA_PAD,
                                 alphabet_size=self.submat.alphabet_size)
        bias = abs(min(0, int(prof[:20, :L].min()))) if L else 0
        pad = bucket_length(L, self._bucket_min()) - L
        if pad:
            prof = np.pad(prof, ((0, 0), (0, pad)),
                          constant_values=-(1 << 20))
        q_num = prof_entry.query_num.astype(np.int64)
        cb_i8 = np.zeros(L, dtype=np.int8)
        return QueryContext(q_num, cb_i8, prof.astype(np.int32), bias)

    # -- identity shortcut ---------------------------------------------------

    def score_identical(self, ctx: QueryContext, t_num, mode):
        """SmithWaterman::scoreIdentical including the int16 accumulator."""
        L = len(ctx.q_num)
        # profile_word_linear[t][pos]: ctx.profile columns cover both the
        # sequence (mat + bias) and profile (pssm/4) cases
        per_pos = ctx.profile[np.asarray(t_num), np.arange(L)]
        raw = int(np.cumsum(per_pos.astype(np.int16), dtype=np.int16)[-1]) \
            if L else 0
        ev = self.evaluer.compute_evalue(raw, L)
        return AlnResult(
            db_key=-1, score=int(self.evaluer.compute_bit_score(raw) + 0.5),
            raw_score=raw, seq_id=1.0, eval=ev,
            q_start=0 if mode != SCORE_ONLY else -1, q_end=L - 1, q_len=L,
            db_start=0 if mode != SCORE_ONLY else -1, db_end=L - 1, db_len=L,
            qcov=1.0, dbcov=1.0, aln_length=L, backtrace="M" * L)

    # -- batched device scans -------------------------------------------------

    @staticmethod
    def _use_pallas():
        import jax
        return jax.default_backend() != "cpu"

    def _batch_scan(self, profiles, qidx, t_list):
        """sw_scan over a ragged target list.

        profiles: (NQ, A, Lq) int32; qidx: (len(t_list),) into profiles.
        All dims are padded to power-of-two/bucket sizes so the jit cache
        stays small (XLA compiles once per distinct shape). Single-profile
        batches take the Pallas kernel on TPU (ops/pallas_sw.py).
        """
        import jax.numpy as jnp
        n = len(t_list)
        if n == 0:
            z = np.zeros(0, np.int32)
            return z, z.copy(), z.copy()
        if profiles.shape[0] == 1 and n >= 8 and self._use_pallas():
            from ..ops.pallas_sw import sw_pallas
            Lt = bucket_length(max(len(t) for t in t_list))
            tb = np.full((Lt, n), PAD_LETTER, dtype=np.int32)
            for c, t in enumerate(t_list):
                tb[: len(t), c] = t
            s, qe, te = sw_pallas(jnp.asarray(profiles[0]), jnp.asarray(tb),
                                  go=self.go, ge=self.ge)
            return np.asarray(s), np.asarray(qe), np.asarray(te)
        Lt = bucket_length(max(len(t) for t in t_list))
        # coarse x4 batch buckets: every distinct (Bp, nqp, lq, Lt) combo
        # pays a trace + compile on the TPU runtime, so keep the grid tiny
        Bp = 32
        while Bp < n:
            Bp *= 4
        tb = np.full((Bp, Lt), PAD_LETTER, dtype=np.int32)
        for r, t in enumerate(t_list):
            tb[r, : len(t)] = t
        qp = np.zeros(Bp, np.int32)
        qp[:n] = qidx
        nq = profiles.shape[0]
        nqp = 32
        while nqp < nq:
            nqp *= 4
        if nqp != nq:
            profiles = np.concatenate(
                [profiles, np.zeros((nqp - nq,) + profiles.shape[1:],
                                    profiles.dtype)])
        s, qe, te = dp.sw_scan(jnp.asarray(profiles), jnp.asarray(qp),
                               jnp.asarray(tb), self.go, self.ge)
        return (np.asarray(s)[:n], np.asarray(qe)[:n], np.asarray(te)[:n])

    # -- multi-query fixed-shape scan (TPU) -----------------------------------

    MULTI_NQ = 16          # query profiles stacked per kernel call
    MULTI_LANES = 16384    # target lanes per kernel call (32 x BT blocks;
                           # underfull chunks only pad to the lane bucket,
                           # so big chunks cost nothing when groups are
                           # small but quarter the dispatch count at scale)

    def _multi_scan(self, entries):
        """Scan (query, target) pairs through the multi-query Pallas kernel.

        entries: list of (ref, qkey, profile (A, lqb) int32, target_seq,
        qoff). Pairs are grouped by (query-length bucket, target-length
        bucket), chunked to <= MULTI_NQ distinct profiles and MULTI_LANES
        lanes, and every chunk is padded to the SAME canonical shape — so a
        whole align stage compiles O(#length-buckets) programs instead of
        one per (query, batch-size) combination, and dispatches all chunks
        asynchronously before the first synchronizing read-back.

        Returns {ref: (score, qend, tend)} (qend in full-profile
        coordinates; callers subtract qoff for the reverse pass)."""
        from ..ops.pallas_sw import sw_pallas_multi
        LANES = self.MULTI_LANES
        groups = {}
        for e in entries:
            key = (e[2].shape[1],
                   bucket_length(max(len(e[3]), 1), self._bucket_min()))
            groups.setdefault(key, []).append(e)
        pending = []
        for (lqb, ltb), items in groups.items():
            # NQ shrinks with query length: the stacked profile costs
            # nq*A MACs/cell on the MXU and (lqb, nq*A) VMEM; long-query
            # buckets are rare and stay effectively per-query
            NQ = (self.MULTI_NQ if lqb <= 1024
                  else 8 if lqb <= 2048 else 1)
            i = 0
            while i < len(items):
                profs, slot, refs = [], {}, []
                tb = np.full((ltb, LANES), PAD_LETTER, np.int8)
                qsel = np.zeros(LANES, np.int32)
                qoffs = np.zeros(LANES, np.int32)
                lane = 0
                while i < len(items) and lane < LANES:
                    ref, qkey, prof, seq, qo = items[i]
                    if qkey not in slot:
                        if len(profs) == NQ:
                            break
                        slot[qkey] = len(profs)
                        profs.append(prof)
                    tb[: len(seq), lane] = seq
                    qsel[lane] = slot[qkey]
                    qoffs[lane] = qo
                    refs.append(ref)
                    lane += 1
                    i += 1
                lanes_used = lane
                pf = np.full((NQ * ALPHA_PAD, lqb), -(1 << 20), np.int32)
                pf[: len(profs) * ALPHA_PAD] = np.concatenate(profs, axis=0)
                import jax.numpy as jnp
                out = sw_pallas_multi(pf, tb[:, :_lane_pad(lanes_used)],
                                      qsel[:_lane_pad(lanes_used)],
                                      qoff=qoffs[:_lane_pad(lanes_used)],
                                      go=self.go, ge=self.ge)
                # ONE stacked D2H fetch per chunk: each read through the
                # runtime tunnel pays ~25 ms latency, and three per chunk
                # dominated the align stage at 500k-target scale
                pending.append((refs, jnp.stack(out)))
        result = {}
        for refs, out in pending:
            s, qe, te = np.asarray(out)
            for lane, ref in enumerate(refs):
                result[ref] = (int(s[lane]), int(qe[lane]), int(te[lane]))
        return result

    # -- main entry -----------------------------------------------------------

    def align_query(self, ctx: QueryContext, target_keys, target_seqs,
                    target_lens, identity_flags, mode=SCORE_COV_SEQID,
                    cov_mode=0, cov_thr=0.0, eval_thr=1e-3,
                    seq_id_mode=util.SEQ_ID_ALN_LEN):
        """Align one query against candidate targets; returns AlnResult list
        in input order. Acceptance/early-exit is the caller's job (it depends
        on result order and maxAccept/maxReject)."""
        return self.align_batch(
            [(ctx, target_keys, target_seqs, target_lens, identity_flags)],
            mode=mode, cov_mode=cov_mode, cov_thr=cov_thr,
            eval_thr=eval_thr, seq_id_mode=seq_id_mode)[0]

    def align_batch(self, jobs, mode=SCORE_COV_SEQID, cov_mode=0,
                    cov_thr=0.0, eval_thr=1e-3,
                    seq_id_mode=util.SEQ_ID_ALN_LEN):
        """Align MANY queries in few device calls.

        jobs: list of (ctx, target_keys, target_seqs, target_lens,
        identity_flags). All (query, target) pairs across jobs are grouped
        by (query-length bucket, target-length bucket) so forward and
        reverse scans run once per shape group instead of once per query —
        the per-call dispatch latency and per-shape trace cost dominated
        the align stage wall time at scale. Returns per-job AlnResult
        lists in input order; semantics identical to align_query."""
        use_pallas = self._use_pallas()
        per_results = []
        per_sw = []
        fwd_groups = {}
        fwd_entries = []
        for j, (ctx, keys, seqs, lens, ident) in enumerate(jobs):
            results = [None] * len(keys)
            sw_idx = []
            for i, isid in enumerate(ident):
                if isid:
                    res = self.score_identical(ctx, seqs[i], mode)
                    res.db_key = keys[i]
                    res.db_len = int(lens[i])
                    results[i] = res
                else:
                    sw_idx.append(i)
            per_results.append(results)
            per_sw.append(sw_idx)
            lqb = ctx.profile.shape[1]
            if use_pallas:
                # TPU: every pair goes through the multi-query kernel —
                # one canonical shape per (Lq, Lt) bucket pair
                for i in sw_idx:
                    fwd_entries.append(
                        ((j, i), j, ctx.profile, seqs[i], 0))
                continue
            # CPU fallback: queries with >= 8 same-bucket targets get
            # their own group; small leftovers share stacked dp.sw_scan
            cnt = {}
            for i in sw_idx:
                ltb = bucket_length(max(len(seqs[i]), 1))
                cnt[ltb] = cnt.get(ltb, 0) + 1
            for i in sw_idx:
                ltb = bucket_length(max(len(seqs[i]), 1))
                key = ((j, ltb) if cnt[ltb] >= 8
                       else ("mix", lqb, ltb))
                g = fwd_groups.setdefault(
                    key, {"profs": [], "slot": {}, "qidx": [], "tl": [],
                          "ref": []})
                if j not in g["slot"]:
                    g["slot"][j] = len(g["profs"])
                    g["profs"].append(ctx.profile)
                g["qidx"].append(g["slot"][j])
                g["tl"].append(seqs[i])
                g["ref"].append((j, i))

        # 1. forward: score + end positions, one scan per shape group
        if use_pallas:
            fwd = self._multi_scan(fwd_entries)
        else:
            fwd = {}
            for g in fwd_groups.values():
                s, qe, te = self._batch_scan(
                    np.stack(g["profs"]), np.array(g["qidx"], np.int32),
                    g["tl"])
                for k, ref in enumerate(g["ref"]):
                    fwd[ref] = (int(s[k]), int(qe[k]), int(te[k]))

        # 2. gates; collect reverse-pass work across all jobs
        rev_targets, rev_ref, rev_qe = [], [], []
        rev_profiles = []          # dp.sw_scan fallback path only
        for j, (ctx, keys, seqs, lens, ident) in enumerate(jobs):
            qL = len(ctx.q_num)
            for i in per_sw[j]:
                raw, qe, te = fwd[(j, i)]
                tL = int(lens[i])
                ev = self.evaluer.compute_evalue(raw, qL)
                res = AlnResult(
                    db_key=keys[i],
                    score=int(self.evaluer.compute_bit_score(raw) + 0.5),
                    raw_score=raw, seq_id=0.0, eval=ev,
                    q_start=-1, q_end=qe, q_len=qL,
                    db_start=-1, db_end=te, db_len=tL,
                    aln_length=max(abs(qe + 1), abs(te + 1)))
                per_results[j][i] = res
                if te == -1 or mode == SCORE_ONLY:
                    if te != -1:
                        res.seq_id = util.estimate_seq_id_by_score_per_col(
                            raw, max(qe, 1), max(te, 1))
                    continue
                res.qcov = float(util.compute_cov(0, qe, qL))
                res.dbcov = float(util.compute_cov(0, te, tL))
                low_cov = not util.has_coverage(cov_thr, cov_mode,
                                                res.qcov, res.dbcov)
                if ev > eval_thr or low_cov:
                    continue  # ssw_align_private early return (mode 1, 2)
                if not use_pallas:
                    rev = ctx.profile[:, : qe + 1][:, ::-1]
                    pad = bucket_length(qe + 1) - rev.shape[1]
                    if pad:
                        rev = np.pad(rev, ((0, 0), (0, pad)),
                                     constant_values=-(1 << 20))
                    rev_profiles.append(np.ascontiguousarray(rev))
                rev_targets.append(seqs[i][: te + 1][::-1].copy())
                rev_qe.append(qe)
                rev_ref.append((j, i))

        # 3. reverse pass -> start positions. On device: per-query groups
        # through the offset-masked Pallas kernel (each pair's reversed
        # query prefix is a SUFFIX of the query's reversed profile, so one
        # shared profile + per-lane qoff replaces per-pair profile stacks
        # and the ~17x-slower dp.sw_scan).
        rev_out = {}
        if use_pallas:
            rev_entries = []
            rev_prof = {}
            rev_qoff = {}
            for k, (j, i) in enumerate(rev_ref):
                ctx = jobs[j][0]
                if j not in rev_prof:
                    rev_prof[j] = np.ascontiguousarray(ctx.profile[:, ::-1])
                qoff = ctx.profile.shape[1] - 1 - rev_qe[k]
                rev_qoff[k] = qoff
                rev_entries.append((k, j, rev_prof[j], rev_targets[k],
                                    qoff))
            for k, (rs, rqe2, rte2) in self._multi_scan(
                    rev_entries).items():
                rev_out[k] = (rs, rqe2 - rev_qoff[k], rte2)
        else:
            rev_groups = {}
            for k in range(len(rev_ref)):
                key = (rev_profiles[k].shape[1],
                       bucket_length(max(len(rev_targets[k]), 1)))
                rev_groups.setdefault(key, []).append(k)
            for idxs in rev_groups.values():
                # chunked: the per-pair profile stack is (NP, A, lq) and
                # would otherwise reach hundreds of MB per transfer
                for c0 in range(0, len(idxs), 256):
                    part = idxs[c0:c0 + 256]
                    rs, rqe2, rte2 = self._batch_scan(
                        np.stack([rev_profiles[k] for k in part]),
                        np.arange(len(part), dtype=np.int32),
                        [rev_targets[k] for k in part])
                    for m, k in enumerate(part):
                        rev_out[k] = (int(rs[m]), int(rqe2[m]),
                                      int(rte2[m]))

        for k, (j, i) in enumerate(rev_ref):
            ctx, keys, seqs, lens, ident = jobs[j]
            qL = len(ctx.q_num)
            res = per_results[j][i]
            rs, rqe, rte = rev_out[k]
            if rs != res.raw_score:
                raise RuntimeError(
                    f"forward/reverse SW score mismatch {rs} != "
                    f"{res.raw_score} (target {res.db_key})")
            res.q_start = res.q_end - rqe
            res.db_start = res.db_end - rte
            res.qcov = float(util.compute_cov(res.q_start, res.q_end, qL))
            res.dbcov = float(util.compute_cov(res.db_start, res.db_end,
                                               res.db_len))
            res.aln_length = max(abs(res.q_end - res.q_start),
                                 abs(res.db_end - res.db_start)) + 1
            low_cov = not util.has_coverage(cov_thr, cov_mode,
                                            res.qcov, res.dbcov)
            if mode == SCORE_COV:
                res.seq_id = util.estimate_seq_id_by_score_per_col(
                    res.raw_score, max(res.q_end - res.q_start, 1),
                    max(res.db_end - res.db_start, 1))
                continue
            if low_cov:
                continue   # alignStartPosBacktrace returns pre-banded

            # 4. backtrace (host banded DP) + real sequence identity
            t_num = seqs[i]
            t_win = t_num[res.db_start: res.db_end + 1]
            q_idx = np.arange(res.q_start, res.q_end + 1)
            s_win = ctx.profile[np.asarray(t_win)[None, :],
                                q_idx[:, None]]
            bt = banded_align_scores(t_win, s_win, res.raw_score,
                                     self.go, self.ge)
            res.backtrace = bt
            res.aln_length = len(bt)
            q_win = ctx.q_num[res.q_start:]
            t_win = t_num[res.db_start:]
            qi = ti = 0
            aa_ids = 0
            m_scores = []
            for op in bt:
                if op == 'M':
                    aa_ids += int(t_win[ti] == q_win[qi])
                    if self.corr_score_weight > 0.0:
                        # int8 per-column match score incl. bias
                        # (StripedSmithWaterman.cpp:1289-1292)
                        m_scores.append(np.int8(
                            ctx.profile[int(t_win[ti]),
                                        res.q_start + qi]))
                    qi += 1
                    ti += 1
                elif op == 'I':
                    qi += 1
                else:
                    ti += 1
            if self.corr_score_weight > 0.0:
                # neighbour-column score correlation bonus
                # (StripedSmithWaterman.cpp:1249-1253,1338-1362)
                sc = np.asarray(m_scores, dtype=np.int64)
                corr = sum(int((sc[lag:] * sc[:-lag]).sum())
                           for lag in (1, 2, 3, 4) if len(sc) > lag)
                new_raw = int(np.float32(res.raw_score)
                              + np.float32(corr)
                              * np.float32(self.corr_score_weight))
                res.raw_score = new_raw
                res.eval = self.evaluer.compute_evalue(new_raw, qL)
                res.score = int(
                    self.evaluer.compute_bit_score(new_raw) + 0.5)
            res.seq_id = float(util.compute_seq_id(
                seq_id_mode, aa_ids, qL, res.db_len, res.aln_length))
        return per_results
