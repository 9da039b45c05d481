"""`fwbw` — Forward-Backward posterior alignment of prefilter/alignment hits.

Reference: /root/reference/src/alignment/Fwbw.cpp:1071-1190 (int fwbw).
For every (query, target) pair in the input alignment DB, computes the
posterior match-probability matrix (ops/fwbw.py on device) and the MAC
backtrace, emits a Matcher::result_t record with score = int(score_MAC),
eval = 0, and sorts per query by compareHits.
"""

import numpy as np

from ..align import util as autil
from ..align.aligner import AlnResult, sort_results
from ..db import dbtype as dbt
from ..db.reader import DBReader
from ..db.writer import DBWriter
from ..ops.fwbw import fwbw_align_batch
from ..utils import log
from .align_cmd import check_criteria
from .common import EncodedDB, fast_atoi, get_sub_mat, open_seq_db


def fwbw(par, command):
    q_path, t_path, aln_path, out_path = par.filenames[:4]
    qreader = open_seq_db(q_path)
    if qreader.base_type == dbt.DBTYPE_NUCLEOTIDES:
        log.die("Invalid datatype. Nucleotide.")
    same_db = q_path == t_path
    treader = qreader if same_db else open_seq_db(t_path)
    submat = get_sub_mat(par, score_bias=par.score_bias)
    qdb = EncodedDB(qreader, submat)
    tdb = qdb if same_db else EncodedDB(treader, submat)
    alns = DBReader(aln_path)
    mat = np.asarray(submat.sub_matrix, np.float32)

    go = -float(par.fwbw_gapopen)
    ge = -float(par.fwbw_gapextend)
    temp = float(par.temperature)
    mact = float(par.mact)

    with DBWriter(out_path, dbt.DBTYPE_ALIGNMENT_RES,
                  compressed=bool(par.compressed)) as writer:
        for i in range(alns.size):
            key = alns.get_db_key(i)
            qid = qreader.get_id(key)
            q_num = qdb.seq_num(qid)
            qlen = len(q_num)
            results = []
            t_keys, t_nums, smats = [], [], []
            for line in alns.get_data(i).split(b"\n"):
                if not line:
                    continue
                tkey = fast_atoi(line.split(b"\t")[0])
                tid = treader.get_id(tkey)
                t_num = tdb.seq_num(tid)
                # rows = target, cols = query (Fwbw.cpp initProfile)
                t_keys.append(tkey)
                t_nums.append(t_num)
                smats.append(mat[t_num[:, None], q_num[None, :]])
            if not t_keys:
                writer.write(key, b"")
                continue
            batch = fwbw_align_batch(
                smats, [len(t) for t in t_nums],
                [qlen] * len(t_nums), go=go, ge=ge, temp=temp, mact=mact)
            for tkey, t_num, a in zip(t_keys, t_nums, batch):
                tlen = len(t_num)
                bt = a["cigar"]
                aln_len = len(bt)
                aa_ids = sum(
                    1 for ti, qj in a["match_pairs"]
                    if t_num[ti] == q_num[qj])
                seq_id = autil.compute_seq_id(par.seq_id_mode, aa_ids,
                                              qlen, tlen, aln_len)
                res = AlnResult(
                    db_key=tkey, score=int(a["score_mac"]), raw_score=0,
                    seq_id=seq_id, eval=0.0,
                    q_start=a["q_start"], q_end=a["q_end"], q_len=qlen,
                    db_start=a["t_start"], db_end=a["t_end"], db_len=tlen,
                    qcov=autil.compute_cov(a["q_start"], a["q_end"], qlen),
                    dbcov=autil.compute_cov(a["t_start"], a["t_end"], tlen),
                    aln_length=aln_len, backtrace=bt)
                if check_criteria(res, False, par.evalue, par.min_seq_id,
                                  par.min_aln_len, par.cov_mode,
                                  par.cov_thr):
                    results.append(res)
            sort_results(results)
            out = "".join(r.to_line(True) for r in results)
            writer.write(key, out.encode())
    alns.close()
    qreader.close()
    if not same_db:
        treader.close()
    return 0
