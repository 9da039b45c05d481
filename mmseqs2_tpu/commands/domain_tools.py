"""Domain annotation commands: apply, summarizetabs, extractdomains.

References: src/util/apply.cpp (per-entry subprocess map),
src/util/summarizetabs.cpp (greedy domain mapping over BLAST-tab results),
src/util/extractdomains.cpp (domain projection through an MSA).
"""

import os
import subprocess

import numpy as np

from ..db import dbtype as dbt
from ..db.reader import DBReader
from ..db.writer import DBWriter
from ..utils import log


def apply_cmd(par, command):
    """Pipe every entry through a user program; stdout becomes the output
    entry (reference src/util/apply.cpp). The child sees MMSEQS_ENTRY_NAME.

    Usage: apply <inDB> <outDB> -- <program> [args...]
    """
    db, out = par.filenames[:2]
    prog = par.filenames[2:]
    if not prog:
        log.die("apply needs a program to run: "
                "apply <inDB> <outDB> -- program [args]")
    env = dict(os.environ)
    with DBReader(db) as r, \
            DBWriter(out, dbt.DBTYPE_GENERIC_DB,
                     compressed=bool(par.compressed)) as w:
        # reference opens with SORT_BY_LENGTH: entry length descending,
        # ties by key-sorted id ascending (DBReader.h comparePairBySeqLength)
        order = sorted(range(r.size), key=lambda i: (-int(r.lengths[i]), i))
        for i in order:
            key = r.get_db_key(i)
            data = r.get_data(i)
            if not data:
                w.write(key, b"")
                continue
            env["MMSEQS_ENTRY_NAME"] = str(key)
            proc = subprocess.run(prog, input=data,
                                  capture_output=True, env=env)
            if proc.returncode != 0:
                # failed entries are skipped, not written (apply.cpp:339-347)
                log.warning(f"Entry {key} exited with error code "
                            f"{proc.returncode}!")
                continue
            w.write(key, proc.stdout)
    return 0


# ---------------------------------------------------------------------------
# summarizetabs


class Domain:
    __slots__ = ("query", "q_start", "q_end", "q_len",
                 "target", "t_start", "t_end", "t_len", "evalue")

    def __init__(self, query, q_start, q_end, q_len,
                 target, t_start, t_end, t_len, evalue):
        self.query, self.q_start, self.q_end, self.q_len = (
            query, q_start, q_end, q_len)
        self.target, self.t_start, self.t_end, self.t_len = (
            target, t_start, t_end, t_len)
        self.evalue = evalue

    def line(self) -> str:
        # C++ ostream with precision 6 == %.6g for the double E-value
        e = f"{self.evalue:.6g}"
        return (f"{self.query}\t{self.target}\t{self.q_start}\t{self.q_end}"
                f"\t{self.q_len}\t{self.t_start}\t{self.t_end}\t{self.t_len}"
                f"\t{e}")


def _map_domains(domains, overlap, min_cov, eval_thr):
    """Greedy accept by E-value order with query-coverage overlap check
    (reference summarizetabs.cpp mapDomains)."""
    result = []
    if not domains:
        return result
    covered = np.zeros(domains[0].q_len, dtype=bool)
    for d in domains:
        if d.q_start > d.q_len or d.q_end > d.q_len:
            log.warning("Query alignment start or end is greater than query "
                        f"length in set {d.query}! Skipping line.")
            continue
        if d.q_start > d.q_end:
            log.warning("Query alignment end is greater than start in set "
                        f"{d.query}! Skipping line.")
            continue
        pct_overlap = (covered[d.q_start:d.q_end].sum()
                       / np.float32(d.q_end - d.q_start + 1))
        if d.t_start > d.t_end:
            log.warning("Target alignment end is greater than start in set "
                        f"{d.query}! Skipping line.")
            continue
        if d.t_start > d.t_len or d.t_end > d.t_len:
            log.warning("Target alignment start or end is greater than "
                        f"target length in set {d.query}! Skipping line.")
            continue
        t_cov = np.float32(d.t_end - d.t_start + 1) / np.float32(d.t_len)
        if pct_overlap <= overlap and t_cov > min_cov and d.evalue < eval_thr:
            covered[d.q_start:d.q_end] = True
            result.append(d)
    return result


def summarizetabs(par, command):
    """Map non-overlapping domains from a BLAST-tab result DB
    (reference src/util/summarizetabs.cpp). Usage:
    summarizetabs <tabDB> <lengthFile> <outDB>."""
    tabdb, lengths_file, out = par.filenames[:3]
    overlap, cov, eval_thr = par.overlap, par.cov_thr, par.evalue
    # name -> length; the reference uses std::map::lower_bound, so a missing
    # key silently resolves to the next greater one — reproduce that
    pairs = []
    with open(lengths_file) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            pairs.append((parts[0], int(parts[1])))
    pairs.sort()
    names = [p[0] for p in pairs]
    import bisect

    def length_of(name):
        j = bisect.bisect_left(names, name)
        return pairs[j][1] if j < len(pairs) else None

    with DBReader(tabdb) as r, \
            DBWriter(out, dbt.DBTYPE_ALIGNMENT_RES,
                     compressed=bool(par.compressed)) as w:
        for i in r.linear_order():
            i = int(i)
            key = r.get_db_key(i)
            entries = []
            for line in r.get_data(i).decode().splitlines():
                if not line:
                    continue
                f = line.split("\t")
                q_len = length_of(str(key))
                if q_len is None:
                    log.warning("Missing query length! Skipping line.")
                    continue
                t_len = length_of(f[1])
                if t_len is None:
                    log.warning("Missing target length! Skipping line.")
                    continue
                entries.append(Domain(
                    str(key), int(f[6]) - 1, int(f[7]) - 1, q_len,
                    f[1], int(f[8]) - 1, int(f[9]) - 1, t_len, float(f[10])))
            if not entries:
                log.warning(f"Can not map any entries for entry {key}!")
                continue
            entries.sort(key=lambda d: d.evalue)  # stable, like stable_sort
            result = _map_domains(entries, overlap, cov, eval_thr)
            if not result:
                log.warning(f"Can not map any domains for entry {key}!")
                continue
            w.write(key, ("".join(d.line() + "\n" for d in result)).encode())
    return 0


# ---------------------------------------------------------------------------
# extractdomains


def _score_sub_alignment(query, target, q_start, q_end, t_start, t_end,
                         submat, aa2num):
    """Gapped sub-alignment rescore with flat -10/-1 gap costs
    (reference extractdomains.cpp scoreSubAlignment)."""
    raw = 0
    best = 0
    t_pos, q_pos = t_start, q_start
    S = submat.sub_matrix
    for _ in range(q_end - q_start):
        if t_pos >= t_end:
            break
        if q_pos < len(query) and query[q_pos] == ord("-"):
            raw = max(0, raw - 10)
            while q_pos < q_end and query[q_pos] == ord("-"):
                raw = max(0, raw - 1)
                q_pos += 1
                t_pos += 1
        if t_pos < len(target) and (target[t_pos] == ord("-")
                                    or chr(target[t_pos]).islower()):
            raw = max(0, raw - 10)
            while t_pos < t_end and target[t_pos] == ord("-"):
                raw = max(0, raw - 1)
                t_pos += 1
                q_pos += 1
            while t_pos < t_end and chr(target[t_pos]).islower():
                raw = max(0, raw - 1)
                t_pos += 1
        else:
            qr = aa2num[query[q_pos]] if q_pos < len(query) else 20
            tr = aa2num[target[t_pos]] if t_pos < len(target) else 20
            raw = max(0, raw + int(S[qr][tr]))
            q_pos += 1
            t_pos += 1
        best = max(best, raw)
    return best


def _compute_evalue(query_length, score):
    K, lam = 0.041, 0.267
    return K * 1 * query_length * np.exp(-lam * score)


def _map_msa(msa_bytes, domains, min_cov, eval_thr, submat, aa2num):
    from ..db.fasta import parse_fasta_header

    result = []
    query_seq = None
    # parse FASTA records out of the MSA text
    records = []
    name = comment = None
    seq_parts = []
    for line in msa_bytes.split(b"\n"):
        if line.startswith(b">"):
            if name is not None:
                records.append((name, comment, b"".join(seq_parts)))
            hdr = line[1:]
            sp = hdr.split(None, 1)
            name = sp[0].decode() if sp else ""
            comment = sp[1].decode() if len(sp) > 1 else ""
            seq_parts = []
        else:
            seq_parts.append(line.strip())
    if name is not None:
        records.append((name, comment, b"".join(seq_parts)))

    for full_name, comment, seq in records:
        if not full_name or not seq:
            continue
        if full_name.startswith("consensus_") or \
                full_name.endswith("_consensus"):
            continue
        nm = parse_fasta_header(full_name.encode()).decode()
        if comment:
            start = comment.find("Split=")
            if start >= 0:
                start += 6
                end = len(comment)
                for j in range(start, len(comment)):
                    if comment[j] in " \n":
                        end = j
                        break
                split = comment[start:end]
                if split != "0" and end != len(comment):
                    nm += "_" + split
        if query_seq is None:
            query_seq = seq
        length = sum(1 for c in seq if chr(c).isalpha())
        for d in domains:
            found_start = False
            domain_start = 0
            pos_wo_ins = 0
            q_dom_off = 0
            for aa_pos, c in enumerate(seq):
                ch = chr(c)
                if (ch not in "-.") and not found_start \
                        and pos_wo_ins >= d.q_start and pos_wo_ins <= d.q_end:
                    found_start = True
                    domain_start = aa_pos
                    q_dom_off = pos_wo_ins - d.q_start
                if not ch.islower():
                    pos_wo_ins += 1
                if pos_wo_ins == d.q_end and found_start:
                    found_start = False
                    domain_end = min(aa_pos, length - 1)
                    dom_cov = (np.float32(domain_end - domain_start + 1)
                               / np.float32(d.t_len))
                    score = _score_sub_alignment(
                        query_seq, seq, d.q_start + q_dom_off, d.q_end,
                        domain_start, domain_end, submat, aa2num)
                    dom_eval = d.evalue + _compute_evalue(length, score)
                    if dom_cov > min_cov and dom_eval < eval_thr:
                        result.append(Domain(
                            nm, domain_start, domain_end, length,
                            d.target, d.t_start, d.t_end, d.t_len, dom_eval))
                        break
    return result


def extractdomains(par, command):
    """Extract annotated domains from an MSA DB guided by a summarizetabs
    result (reference src/util/extractdomains.cpp). Usage:
    extractdomains <domainDB> <msaDB> <outDB>."""
    from ..data.submat import get_submat

    domdb, msadb, out = par.filenames[:3]
    msa_type = par.msa_type
    cov, eval_thr = par.cov_thr, par.evalue
    submat = get_submat(par.sub_mat.aa, 2.0, 0.0)
    aa2num = submat.make_aa2num_table()
    if msa_type == 0:
        from ..profile.ca3m import extract_a3m  # ca3m support
        seq_r = DBReader(msadb + "_sequence.ffdata",
                         msadb + "_sequence.ffindex")
        hdr_r = DBReader(msadb + "_header.ffdata", msadb + "_header.ffindex")
        msa_r = DBReader(msadb + "_ca3m.ffdata", msadb + "_ca3m.ffindex")
    else:
        seq_r = hdr_r = None
        msa_r = DBReader(msadb)
    with DBReader(domdb) as dom, \
            DBWriter(out, dbt.DBTYPE_ALIGNMENT_RES,
                     compressed=bool(par.compressed)) as w:
        for i in dom.linear_order():
            i = int(i)
            key = dom.get_db_key(i)
            e = msa_r.get_id(key)
            if e < 0:
                log.warning(f"Can not find MSA for key {key}!")
                continue
            entries = []
            for line in dom.get_data(i).decode().splitlines():
                if not line:
                    continue
                f = line.split("\t")
                entries.append(Domain(f[0], int(f[2]), int(f[3]), int(f[4]),
                                      f[1], int(f[5]), int(f[6]), int(f[7]),
                                      float(f[8])))
            if not entries:
                log.warning(f"Can not map any entries for entry {key}!")
                continue
            if msa_type == 0:
                msa = extract_a3m(msa_r.get_data(e), seq_r, hdr_r)
            else:
                msa = msa_r.get_data(e)
            mapping = _map_msa(msa, entries, cov, eval_thr, submat, aa2num)
            w.write(key,
                    ("".join(d.line() + "\n" for d in mapping)).encode())
    msa_r.close()
    if seq_r is not None:
        seq_r.close()
        hdr_r.close()
    return 0
