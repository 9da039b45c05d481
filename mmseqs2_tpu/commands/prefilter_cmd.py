"""Exhaustive prefilter commands: `ungappedprefilter` / `gappedprefilter`.

Reference: src/prefiltering/ungappedprefilter.cpp (CPU path :349-485; the GPU
path this replaces on TPU :40-345). For every query the whole target DB is
scored on-device — gapless saturating-u8 diagonal scan or full gapped SW —
then hits above --min-ungapped-score (strictly greater) are kept, sorted by
(|score| desc, key asc), truncated to --max-seqs, and written as
`targetKey \t score \t 0` prefilter records.

The k-mer inverted-index `prefilter` lives in prefilter_kmer.py.
"""

import numpy as np

from ..align import util as autil
from ..align.aligner import Aligner, ALPHA_PAD, PAD_LETTER
from ..db import dbtype as dbt
from ..db.writer import DBWriter
from ..ops import dp
from ..ops.encode import bucket_length, make_query_profile
from ..ops.evalue import EvalueComputation
from ..utils import log
from .common import EncodedDB, get_sub_mat, open_seq_db

INT_MAX = 2147483647


def _write_hits(writer, query_key, hits, max_res):
    """hits: list of (target_key, score). Sort by |score| desc then key asc
    (hit_t::compareHitsByScoreAndId) and serialize."""
    hits.sort(key=lambda h: (-abs(h[1]), h[0]))
    buf = "".join(f"{k}\t{s}\t0\n" for k, s in hits[:max_res])
    writer.write(query_key, buf.encode())


def _target_buckets(tdb):
    buckets = {}
    for tid in range(tdb.size):
        buckets.setdefault(bucket_length(tdb.seq_len(tid)), []).append(tid)
    return buckets


def _pad_targets(tdb, tids, L):
    tb = np.full((len(tids), L), PAD_LETTER, dtype=np.int32)
    lens = np.zeros(len(tids), dtype=np.int32)
    for r, tid in enumerate(tids):
        s = tdb.seq_num(tid)
        tb[r, : len(s)] = s
        lens[r] = len(s)
    return tb, lens


def prefilter_exhaustive(par, mode):
    """mode 0: gapless (ungappedprefilter); 1: gapped SW (gappedprefilter)."""
    import jax.numpy as jnp

    qdb_path, tdb_path, out_path = par.filenames[:3]
    same_db = qdb_path == tdb_path
    submat = get_sub_mat(par)
    qreader = open_seq_db(qdb_path)
    treader = qreader if same_db else open_seq_db(tdb_path)
    qdb = EncodedDB(qreader, submat)
    tdb = qdb if same_db else EncodedDB(treader, submat)

    evaluer = EvalueComputation(treader.total_residues(), submat,
                                par.gap_open.aa, par.gap_extend.aa)
    aligner = Aligner(submat, par.gap_open.aa, par.gap_extend.aa, evaluer,
                      par.comp_bias_corr, par.comp_bias_corr_scale)

    writer = DBWriter(out_path, dbt.DBTYPE_PREFILTER_RES)
    buckets = _target_buckets(tdb)
    padded = {L: _pad_targets(tdb, tids, L) for L, tids in buckets.items()}

    chunk = max(1, (1 << 22) // max(1, max(buckets)))  # bound device memory
    for qid in range(qdb.size):
        query_key = qreader.get_db_key(qid)
        ctx = aligner.init_query(qdb.seq_num(qid))
        q_len = len(ctx.q_num)
        profile = jnp.asarray(ctx.profile[None])
        cap = 255 - ctx.bias
        hits = []
        # resident device index server (gpuserver): one request scores the
        # whole target DB without re-transferring it
        srv_scores = None
        if par.gpu:
            from ..server.device_server import query_server
            srv_scores = query_server(tdb_path, ctx.profile, cap, mode,
                                      par.gap_open.aa, par.gap_extend.aa)
            if srv_scores is None and qid == 0:
                log.warning("no gpuserver running for the target DB; "
                            "computing locally")
        if srv_scores is not None:
            all_ids = [tid for _, tids in buckets.items() for tid in tids]
            score_iter = [(tid, int(srv_scores[tid])) for tid in all_ids]
            for tid, score in score_iter:
                t_key = treader.get_db_key(tid)
                if not autil.can_be_covered(par.cov_thr, par.cov_mode,
                                            float(q_len),
                                            float(tdb.seq_len(tid))):
                    continue
                is_identity = (query_key == t_key
                               and (par.include_identity or same_db))
                if mode == 1:
                    if is_identity:
                        res = aligner.score_identical(ctx,
                                                      tdb.seq_num(tid), 0)
                        score = res.raw_score
                    ev = evaluer.compute_evalue(score, q_len)
                    has_eval = ev <= par.evalue
                else:
                    has_eval = True
                if is_identity or (score > par.min_ungapped_score
                                   and has_eval):
                    hits.append((t_key, score))
            _write_hits(writer, query_key, hits, par.max_seqs)
            continue
        for L, tids in buckets.items():
            tb, tlens = padded[L]
            for lo in range(0, len(tids), chunk):
                sub = slice(lo, lo + chunk)
                ids = tids[sub]
                block = jnp.asarray(tb[sub])
                n = block.shape[0]
                qidx = jnp.zeros(n, jnp.int32)
                import jax
                use_pallas = jax.default_backend() != "cpu"
                if mode == 0:
                    if use_pallas:
                        from ..ops.pallas_sw import sw_pallas
                        scores = np.asarray(sw_pallas(
                            profile[0], block.T, gapless=True, cap=cap)[0])
                    else:
                        caps = jnp.full(n, cap, jnp.int32)
                        scores = np.asarray(dp.gapless_scan(
                            profile, qidx, block, caps))
                elif use_pallas:
                    from ..ops.pallas_sw import sw_pallas
                    scores = np.asarray(sw_pallas(
                        profile[0], block.T, go=par.gap_open.aa,
                        ge=par.gap_extend.aa)[0])
                else:
                    scores, _, _ = dp.sw_scan(profile, qidx, block,
                                              par.gap_open.aa,
                                              par.gap_extend.aa)
                    scores = np.asarray(scores)
                for r, tid in enumerate(ids):
                    t_key = treader.get_db_key(tid)
                    if not autil.can_be_covered(par.cov_thr, par.cov_mode,
                                                float(q_len),
                                                float(tlens[r])):
                        continue
                    score = int(scores[r])
                    is_identity = (query_key == t_key
                                   and (par.include_identity or same_db))
                    if mode == 1:
                        if is_identity:
                            res = aligner.score_identical(ctx,
                                                          tdb.seq_num(tid), 0)
                            score = res.raw_score
                        ev = evaluer.compute_evalue(score, q_len)
                        has_eval = ev <= par.evalue
                    else:
                        has_eval = True
                    if is_identity or (score > par.min_ungapped_score
                                       and has_eval):
                        hits.append((t_key, score))
        _write_hits(writer, query_key, hits, par.max_seqs)
    writer.close()
    return 0


def ungappedprefilter(par, command):
    return prefilter_exhaustive(par, 0)


def gappedprefilter(par, command):
    par_mode = 1
    return prefilter_exhaustive(par, par_mode)


def prefilter(par, command):
    from .prefilter_kmer import prefilter_kmer
    return prefilter_kmer(par, command)
