"""Alignment-family extras: alignall, transitivealign, pairaln.

References: src/util/alignall.cpp (all-vs-all SW within result sets),
src/util/transitivealign.cpp (A->C inference through a center B with
backtrace composition + rescoring, then a swap-regroup to per-query
entries), src/util/pairaln.cpp (best-hit pairing per file-number).
"""

from collections import defaultdict

import numpy as np

from ..align import util as autil
from ..align.aligner import Aligner, sort_results
from ..db import dbtype as dbt
from ..db.reader import DBReader
from ..db.writer import DBWriter
from ..ops.evalue import EvalueComputation
from ..utils import log
from .align_cmd import check_criteria, init_sw_mode
from .common import EncodedDB, fast_atoi, get_sub_mat, open_seq_db
from .expandaln import Rec, parse_records, translate_result


def alignall(par, command):
    """All-vs-all SW inside each result entry's member set
    (reference src/util/alignall.cpp): output entry <setKey> holds
    "queryKey\\t<record>" lines for every passing ordered member pair."""
    from .align_cmd import SCORE_COV_SEQID

    tdb_path, res_path, out_path = par.filenames[:3]
    if par.add_backtrace:
        par.set("alignment_mode", 3)
    sw_mode = init_sw_mode(par.alignment_mode, par.cov_thr, par.min_seq_id)
    treader = open_seq_db(tdb_path)
    submat = get_sub_mat(par)
    tdb = EncodedDB(treader, submat)
    is_nucl = treader.base_type == dbt.DBTYPE_NUCLEOTIDES
    go = par.gap_open.nucl if is_nucl else par.gap_open.aa
    ge = par.gap_extend.nucl if is_nucl else par.gap_extend.aa
    evaluer = EvalueComputation(treader.total_residues(), submat, go, ge)
    aligner = Aligner(submat, go, ge, evaluer, par.comp_bias_corr,
                      par.comp_bias_corr_scale)
    res = DBReader(res_path)
    with DBWriter(out_path, dbt.DBTYPE_GENERIC_DB,
                  compressed=bool(par.compressed)) as w:
        for i in (int(x) for x in np.argsort(res.offsets, kind="stable")):
            set_key = res.get_db_key(i)
            keys = []
            for line in res.get_data(i).split(b"\n"):
                if line:
                    keys.append(fast_atoi(line.split(b"\t")[0]))
            ids = []
            for k in keys:
                tid = treader.get_id(k)
                if tid < 0:
                    log.die(f"Invalid query key {k} in result entry "
                            f"{set_key}.")
                ids.append(tid)
            out_lines = []
            for qk, qid in zip(keys, ids):
                ctx = aligner.init_query(tdb.seq_num(qid))
                q_len = tdb.seq_len(qid)
                cand = [(tk, tid) for tk, tid in zip(keys, ids)
                        if autil.can_be_covered(par.cov_thr, par.cov_mode,
                                                float(q_len),
                                                float(tdb.seq_len(tid)))]
                idents = [par.include_identity and tid == qid
                          for _, tid in cand]
                results = aligner.align_query(
                    ctx, [tk for tk, _ in cand],
                    [tdb.seq_num(tid) for _, tid in cand],
                    [tdb.seq_len(tid) for _, tid in cand],
                    idents, sw_mode, par.cov_mode, par.cov_thr, par.evalue,
                    par.seq_id_mode)
                for r, is_id in zip(results, idents):
                    if check_criteria(r, is_id, par.evalue, par.min_seq_id,
                                      par.min_aln_len, par.cov_mode,
                                      par.cov_thr):
                        out_lines.append(
                            f"{qk}\t" + r.to_line(par.add_backtrace))
            w.write(set_key, "".join(out_lines).encode())
    res.close()
    return 0


def _swap_rec(r: Rec, evaluer) -> Rec:
    """Matcher::result_t::swapResult (Matcher.h:97-119)."""
    s = Rec()
    raw = evaluer.compute_raw_score_from_bit_score(r.score)
    s.db_key = r.db_key
    s.score = r.score
    s.seq_id = r.seq_id
    s.eval = evaluer.compute_evalue(raw, r.db_len)
    s.q_start, s.q_end, s.q_len = r.db_start, r.db_end, r.db_len
    s.db_start, s.db_end, s.db_len = r.q_start, r.q_end, r.q_len
    s.backtrace = r.backtrace.translate(str.maketrans("ID", "DI"))
    s.aln_length = r.aln_length
    s.qcov, s.dbcov = r.dbcov, r.qcov
    return s


def transitivealign(par, command):
    """Infer A->C alignments through shared centers B
    (reference src/util/transitivealign.cpp): per entry B, swap B->A to
    A->B, compose with each B->C, rescore along the backtrace, then
    regroup all "A\\t<record>" lines into per-A entries."""
    seq_path, aln_path, out_path = par.filenames[:3]
    seqs = DBReader(seq_path)
    submat = get_sub_mat(par)
    enc = submat.make_aa2num_table()
    go, ge = par.gap_open.aa, par.gap_extend.aa
    evaluer = EvalueComputation(seqs.total_residues(), submat, go, ge)
    aln = DBReader(aln_path)
    groups = defaultdict(list)
    for i in (int(x) for x in np.argsort(aln.offsets, kind="stable")):
        aln_key = aln.get_db_key(i)
        results = parse_records(aln.get_data(i))
        for rec_i in results:
            qid = seqs.get_id(rec_i.db_key)
            if qid < 0:
                log.die(f"Invalid query key {rec_i.db_key} in alignment "
                        f"entry {aln_key}.")
            query_key = rec_i.db_key
            swapped = _swap_rec(rec_i, evaluer)
            qseq = seqs.get_data(qid)
            if query_key == aln_key:
                for rec_j in results:
                    groups[query_key].append(rec_j.to_line(True))
                continue
            out_results = []
            for rec_j in results:
                tid = seqs.get_id(rec_j.db_key)
                if tid < 0:
                    log.die(f"Invalid target key {rec_j.db_key} in "
                            f"alignment entry {aln_key}.")
                tseq = seqs.get_data(tid)
                if not autil.can_be_covered(par.cov_thr, par.cov_mode,
                                            float(swapped.q_len),
                                            float(rec_j.db_len)):
                    continue
                is_identity = qid == tid and par.include_identity
                if rec_i.db_key == rec_j.db_key:
                    # local substitution distance along the full diagonal
                    # (DistanceCalculator::computeSubstitutionDistance)
                    q_arr = enc[np.frombuffer(qseq[:rec_i.db_len],
                                              np.uint8)].astype(np.int64)
                    t_arr = enc[np.frombuffer(tseq[:rec_i.db_len],
                                              np.uint8)].astype(np.int64)
                    vals = submat.sub_matrix[q_arr, t_arr].astype(np.int64)
                    run = 0
                    best = 0
                    for v in vals:
                        run = max(0, run + int(v))
                        best = max(best, run)
                    r = Rec()
                    r.db_key = rec_j.db_key
                    r.db_len = rec_j.db_len
                    r.q_len = rec_j.db_len
                    r.score = int(evaluer.compute_bit_score(best))
                    r.eval = evaluer.compute_evalue(best, rec_j.db_len)
                    r.q_start = r.db_start = 0
                    r.q_end = r.db_end = rec_j.db_len - 1
                    r.seq_id = 1.0
                    r.aln_length = rec_j.db_len
                    r.backtrace = "M" * rec_j.db_len
                    r.qcov = r.dbcov = 1.0
                else:
                    r = translate_result(swapped, rec_j)
                    autil.rescore_backtrace(qseq, tseq, enc,
                                            submat.sub_matrix, evaluer,
                                            go, ge, r)
                if check_criteria(r, is_identity, par.evalue,
                                  par.min_seq_id, par.min_aln_len,
                                  par.cov_mode, par.cov_thr):
                    out_results.append(r)
            sort_results(out_results)
            groups[query_key].extend(r.to_line(True) for r in out_results)
    with DBWriter(out_path, aln.base_type,
                  compressed=bool(par.compressed)) as w:
        for key in sorted(groups):
            if groups[key]:
                w.write(key, "".join(groups[key]).encode())
    aln.close()
    seqs.close()
    return 0
