"""`convertalis`: render an alignment DB as BLAST-tab (m8) / custom columns.

Reference: src/util/convertalignments.cpp. The default --format-output
"query,target,fident,alnlen,mismatch,gapopen,qstart,qend,tstart,tend,evalue,bits"
goes through the per-column renderer where floats print as "%.3f" and doubles
(evalue) as "%.3E" (SSTR, /root/reference/src/commons/Util.cpp:723-740).
mismatch/gapopen derivation at convertalignments.cpp:418-455;
Util::parseFastaHeader accession extraction at Util.cpp:147-229.
"""

import re

import numpy as np

from ..db.reader import DBReader
from ..utils import log

_DB_PREFIXES = [
    ("cl|", 3, 1), ("sp|", 3, 1), ("tr|", 3, 1), ("gb|", 3, 1),
    ("ref|", 4, 1), ("pdb|", 4, 1), ("bbs|", 4, 1), ("lcl|", 4, 1),
    ("pir||", 5, 1), ("prf||", 5, 1), ("gnl|", 4, 2), ("pat|", 4, 2),
    ("gi|", 3, 3),
]


def parse_fasta_header(header: str) -> str:
    """Util::parseFastaHeader: accession extraction from the first token."""
    token = header.split()[0] if header.split() else ""
    if not token:
        return ""
    offset = 10 if token.startswith("consensus_") else 0
    for prefix, plen, bar_pos in _DB_PREFIXES:
        if token.startswith(prefix, offset):
            start = offset + plen
            for _ in range(bar_pos - 1):
                end = token.find("|", start)
                if end == -1:
                    return ""
                start = end + 1
            end = token.find("|", start)
            if end == -1:
                return token[start:]
            return token[start:end]
    return token[offset:]


_CIGAR_RE = re.compile(r"(\d+)([MID])")


def expand_backtrace_stats(cigar: str):
    """alnLen, matchCount, gapOpenCount from a compressed backtrace."""
    aln_len = match_count = gap_open = 0
    for cnt, op in _CIGAR_RE.findall(cigar):
        c = int(cnt)
        aln_len += c
        if op == "M":
            match_count += c
        else:
            gap_open += 1
    return aln_len, match_count, gap_open


def expand_cigar(cigar: str) -> str:
    return "".join(op * int(cnt) for cnt, op in _CIGAR_RE.findall(cigar))


class AlnRecord:
    __slots__ = ("db_key", "score", "seq_id", "eval", "q_start", "q_end",
                 "q_len", "db_start", "db_end", "db_len", "backtrace")

    @classmethod
    def parse(cls, line: bytes):
        parts = line.split(b"\t")
        r = cls()
        r.db_key = int(parts[0])
        r.score = int(parts[1])
        r.seq_id = np.float32(float(parts[2]))
        r.eval = float(parts[3])
        r.q_start = int(parts[4])
        r.q_end = int(parts[5])
        r.q_len = int(parts[6])
        r.db_start = int(parts[7])
        r.db_end = int(parts[8])
        r.db_len = int(parts[9])
        # column counts (Matcher::parseAlignmentRecord): 10 plain, 11 with
        # backtrace, 14 with ORF positions, 15 with ORF positions+backtrace
        if len(parts) == 11:
            r.backtrace = parts[10].decode()
        elif len(parts) >= 15:
            r.backtrace = parts[14].decode()
        else:
            r.backtrace = ""
        return r

    @property
    def aln_length(self):
        # -1 start positions (score-only records) clamp to 0 before the
        # length computation (Matcher::parseAlignmentRecord:231-235)
        aq = 0 if self.q_start == -1 else self.q_start
        ad = 0 if self.db_start == -1 else self.db_start
        return max(abs(self.q_end - aq), abs(self.db_end - ad)) + 1


def _f3(x) -> str:
    return f"{np.float32(x):.3f}"


def convertalis(par, command):
    qdb_path, tdb_path, aln_path, out_path = par.filenames[:4]
    same_db = qdb_path == tdb_path
    qh = DBReader(qdb_path + "_h")
    th = qh if same_db else DBReader(tdb_path + "_h")
    aln = DBReader(aln_path)
    outcodes = [c for c in par.format_output.split(",") if c]

    need_seq = any(c in outcodes for c in
                   ("qseq", "tseq", "qaln", "taln", "qlen", "tlen"))
    qseq_db = DBReader(qdb_path) if need_seq else None
    tseq_db = (qseq_db if same_db else DBReader(tdb_path)) if need_seq else None

    evaluer = None
    if "raw" in outcodes:
        from ..ops.evalue import EvalueComputation
        from .common import get_sub_mat
        tr = DBReader(tdb_path)
        evaluer = EvalueComputation(tr.total_residues(), get_sub_mat(par),
                                    par.gap_open.aa, par.gap_extend.aa)
        tr.close()

    writer = None
    if par.db_output:
        # reference convertalignments.cpp:265,843 — --db-output writes one
        # GENERIC_DB entry per query instead of a flat file
        from ..db import dbtype as dbt
        from ..db.writer import DBWriter
        writer = DBWriter(out_path, dbt.DBTYPE_GENERIC_DB,
                          compressed=bool(par.compressed))
    out_lines = []
    # reference opens the result DB with LINEAR_ACCCESS: iterate in data
    # (offset) order, not key order (DBReader.h sort modes)
    order = np.argsort(aln.offsets, kind="stable")
    for i in (int(x) for x in order):
        query_key = aln.get_db_key(i)
        qhid = qh.get_id(query_key)
        query_id = parse_fasta_header(qh.get_data(qhid).decode())
        data = aln.get_data(i)
        q_lines = [] if writer is not None else out_lines
        for line in data.split(b"\n"):
            if not line:
                continue
            res = AlnRecord.parse(line)
            thid = th.get_id(res.db_key)
            target_id = parse_fasta_header(th.get_data(thid).decode())
            gap_open_count = 0
            aln_len = res.aln_length
            identical = 0
            if res.backtrace:
                aln_len, match_count, gap_open_count = \
                    expand_backtrace_stats(res.backtrace)
                identical = int(res.seq_id * np.float32(aln_len)
                                + np.float32(0.5))
                miss_match = match_count - identical
            else:
                adj_q = 0 if res.q_start == -1 else res.q_start
                adj_t = 0 if res.db_start == -1 else res.db_start
                best_match = np.float32(min(abs(res.q_end - adj_q),
                                            abs(res.db_end - adj_t)))
                miss_match = int(best_match * (np.float32(1.0) - res.seq_id)
                                 + np.float32(0.5))

            cols = []
            for code in outcodes:
                if code == "query":
                    cols.append(query_id)
                elif code == "target":
                    cols.append(target_id)
                elif code == "fident":
                    cols.append(_f3(res.seq_id))
                elif code == "pident":
                    cols.append(_f3(res.seq_id * np.float32(100)))
                elif code == "nident":
                    cols.append(str(identical))
                elif code == "alnlen":
                    cols.append(str(aln_len))
                elif code == "mismatch":
                    cols.append(str(miss_match))
                elif code == "gapopen":
                    cols.append(str(gap_open_count))
                elif code == "qstart":
                    cols.append(str(res.q_start + 1))
                elif code == "qend":
                    cols.append(str(res.q_end + 1))
                elif code == "qlen":
                    cols.append(str(res.q_len))
                elif code == "tstart":
                    cols.append(str(res.db_start + 1))
                elif code == "tend":
                    cols.append(str(res.db_end + 1))
                elif code == "tlen":
                    cols.append(str(res.db_len))
                elif code == "evalue":
                    cols.append(f"{res.eval:.3E}")
                elif code == "bits":
                    cols.append(str(res.score))
                elif code == "raw":
                    cols.append(str(int(
                        evaluer.compute_raw_score_from_bit_score(res.score)
                        + 0.5)))
                elif code == "qcov":
                    cols.append(_f3((res.q_end - res.q_start + 1)
                                    / np.float32(res.q_len)))
                elif code == "tcov":
                    cols.append(_f3((res.db_end - res.db_start + 1)
                                    / np.float32(res.db_len)))
                elif code == "qheader":
                    cols.append(qh.get_data(qhid).decode().rstrip("\n"))
                elif code == "theader":
                    cols.append(th.get_data(thid).decode().rstrip("\n"))
                elif code == "cigar":
                    cols.append(res.backtrace)
                elif code == "qseq":
                    cols.append(qseq_db.get_seq(
                        qseq_db.get_id(query_key)).decode())
                elif code == "tseq":
                    cols.append(tseq_db.get_seq(
                        tseq_db.get_id(res.db_key)).decode())
                elif code in ("qaln", "taln"):
                    bt = expand_cigar(res.backtrace)
                    if code == "qaln":
                        seq = qseq_db.get_seq(
                            qseq_db.get_id(query_key)).decode()
                        pos, gap_op = res.q_start, "I"
                    else:
                        seq = tseq_db.get_seq(
                            tseq_db.get_id(res.db_key)).decode()
                        pos, gap_op = res.db_start, "D"
                    frag = []
                    for op in bt:
                        if op == "M" or op == gap_op:
                            frag.append(seq[pos])
                            pos += 1
                        else:
                            frag.append("-")
                    cols.append("".join(frag))
                elif code == "empty":
                    cols.append("")
                else:
                    log.die(f"Unsupported --format-output key: {code}")
            q_lines.append("\t".join(cols) + "\n")
        if writer is not None:
            writer.write(query_key, "".join(q_lines).encode())
    if writer is not None:
        writer.close()
    else:
        with open(out_path, "w") as f:
            f.write("".join(out_lines))
    aln.close()
    qh.close()
    if th is not qh:
        th.close()
    return 0
