"""Assorted utility commands: translateaa, extractalignedregion, countkmer,
summarizeheaders, recoverlongestorf, maskbygff, gff2db, diffseqdbs, clusthash.

Each function mirrors the semantics of its same-named reference tool in
/root/reference/src/util/ (cited per function), re-expressed over our
storage layer.
"""

import os

import numpy as np

from ..db import dbtype as dbt
from ..db.reader import DBReader
from ..db.writer import DBWriter
from ..utils import log
from .nucl_tools import COMPLEMENT, parse_orf_header, write_orf_header

U64 = (1 << 64) - 1


def _softlink_ancillary(src: str, dst: str, seq_db: bool = False):
    """DBReader::softlinkDb with DBFiles::SEQUENCE_ANCILLARY (+SEQUENCE_DB
    when seq_db): link headers/lookup/source next to a derived DB."""
    sufs = ["_h", "_h.index", "_h.dbtype", ".lookup", ".source"]
    if seq_db:
        sufs = ["", ".index", ".dbtype"] + sufs
    for suf in sufs:
        s, d = src + suf, dst + suf
        if os.path.exists(s):
            if os.path.lexists(d):
                os.remove(d)
            os.symlink(os.path.abspath(s), d)


def translateaa(par, command):
    """Back-translate amino acids to a canonical codon per residue
    (reference src/util/translateaa.cpp): for each of the 20 aa pick the
    first codon in A<C<G<T nested enumeration that translates to it; X->NNN.
    """
    from ..data.submat import get_submat
    from ..data.translate import TranslateNucl

    db, out = par.filenames[:2]
    submat = get_submat(par.sub_mat.aa, 2.0, 0.0)
    tn = TranslateNucl(par.translation_table
                       if par.was_set("translation_table") else 1)
    nucs = "ACGT"
    codon = {}
    for i in range(20):
        aa = submat.num2aa[i]
        done = False
        for n1 in nucs:
            for n2 in nucs:
                for n3 in nucs:
                    c = (n1 + n2 + n3).encode()
                    if tn.translate(c).decode() == aa:
                        codon[i] = c
                        done = True
                        break
                if done:
                    break
            if done:
                break
    codon[20] = b"NNN"  # X
    aa2num = submat.make_aa2num_table()
    with DBReader(db) as r, \
            DBWriter(out, dbt.DBTYPE_NUCLEOTIDES,
                     compressed=bool(par.compressed)) as w:
        for i in range(r.size):
            seq = r.get_seq(i)
            num = aa2num[np.frombuffer(seq, np.uint8)]
            w.write(r.get_db_key(i),
                    b"".join(codon[int(x)] for x in num) + b"\n")
    _softlink_ancillary(db, out)
    return 0


def extractalignedregion(par, command):
    """Extract the aligned region of query or target sequences
    (reference src/util/extractalignedregion.cpp)."""
    from .util_tools import _aln_parse

    qdb, tdb, alndb, out = par.filenames[:4]
    mode = par.extract_mode if par.was_set("extract_mode") else 2
    q = DBReader(qdb)
    t = q if tdb == qdb else DBReader(tdb)
    with DBReader(alndb) as aln, \
            DBWriter(out, t.base_type, compressed=bool(par.compressed)) as w:
        for i in aln.linear_order():
            qkey = aln.get_db_key(i)
            qseq = q.get_seq(q.get_id(qkey)) if mode == 1 else None
            for line in aln.get_data(i).splitlines():
                if not line:
                    continue
                res = _aln_parse(line)
                if mode == 1:
                    frag = qseq[res["qStart"]:res["qEnd"] + 1]
                else:
                    tseq = t.get_seq(t.get_id(res["dbKey"]))
                    frag = tseq[res["dbStart"]:res["dbEnd"] + 1]
                w.write(qkey, frag + b"\n")
    _softlink_ancillary(qdb if mode == 1 else tdb, out)
    q.close()
    if t is not q:
        t.close()
    return 0


def countkmer(par, command):
    """Count k-mer occurrences over a sequence DB and print one line per
    index (reference src/util/countkmer.cpp). k defaults to 5, unspaced."""
    from ..data.submat import get_submat

    db = par.filenames[0]
    k = par.kmer_size if par.was_set("kmer_size") else 5
    r = DBReader(db)
    is_nucl = r.base_type == dbt.DBTYPE_NUCLEOTIDES
    if is_nucl:
        submat = get_submat("nucleotide.out", 1.0, 0.0)
    else:
        submat = get_submat(par.sub_mat.aa, 2.0, 0.0)
    alpha = submat.alphabet_size - 1  # drop X
    aa2num = submat.make_aa2num_table()
    table = np.zeros(alpha ** k, dtype=np.int64)
    # aa k-mer indices are little-endian by position: idx = sum seq[i]*a^i
    # (reference src/prefiltering/Indexer.h:21-90); nucleotide indices are
    # 2-bit big-endian packs (Indexer::computeKmerIdx)
    if is_nucl:
        powers = (alpha ** np.arange(k - 1, -1, -1)).astype(np.int64)
    else:
        powers = (alpha ** np.arange(k)).astype(np.int64)
    x_code = submat.alphabet_size - 1
    for i in range(r.size):
        num = aa2num[np.frombuffer(r.get_seq(i), np.uint8)].astype(np.int64)
        if len(num) < k:
            continue
        windows = np.lib.stride_tricks.sliding_window_view(num, k)
        valid = ~(windows == x_code).any(axis=1)
        idx = (windows[valid] * powers).sum(axis=1)
        np.add.at(table, idx, 1)
    r.close()
    out = []
    letters = submat.num2aa
    for i in range(len(table)):
        digits = [letters[(i // int(powers[p])) % alpha] for p in range(k)]
        out.append(f"{i}\t{''.join(digits)}\t{int(table[i])}")
    print("\n".join(out))
    return 0


# ---------------------------------------------------------------------------
# summarizeheaders (reference src/util/summarizeheaders.cpp +
# src/commons/HeaderSummarizer.cpp)

_UNINFORMATIVE = ("hypothetical", "unknown", "putative", "predicted",
                  "unnamed", "probable", "partial", "possible",
                  "uncharacterized", "fragment")


def _libstdcxx_make_heap(a, less):
    """Reproduce libstdc++ std::make_heap element layout (the reference
    iterates the heapified vector in storage order, so layout matters)."""
    n = len(a)
    if n < 2:
        return
    parent = (n - 2) // 2
    while True:
        value = a[parent]
        # __adjust_heap
        hole = parent
        second = hole
        while second < (n - 1) // 2:
            second = 2 * (second + 1)
            if less(a[second], a[second - 1]):
                second -= 1
            a[hole] = a[second]
            hole = second
        if n % 2 == 0 and second == (n - 2) // 2:
            second = 2 * (second + 1)
            a[hole] = a[second - 1]
            hole = second - 1
        # __push_heap
        top = parent
        while hole > top and less(a[(hole - 1) // 2], value):
            a[hole] = a[(hole - 1) // 2]
            hole = (hole - 1) // 2
        a[hole] = value
        if parent == 0:
            return
        parent -= 1


def _uniprot_summarize(headers):
    queue = []  # (priority, identifier, proteinName)
    rep = ""
    for hi, header in enumerate(headers):
        end = header.find("|")
        if end < 0:
            continue
        db_type = header[:end]
        start = end + 1
        end = header.find("|", start)
        if end < 0:
            continue
        ident = header[start:end]
        if hi == 0:
            rep = ident
        start = header.find(" ", end)
        if start < 0:
            continue
        start += 1
        end = header.find(" OS=", start)
        if end < 0:
            continue
        protein = header[start:end]
        start = header.find("=", end)
        if start < 0:
            continue
        end2 = header.find(" GN=", start + 1)
        if end2 < 0:
            end2 = header.find(" PE=", start + 1)
            if end2 < 0:
                continue
        start = header.find("PE=", end2)
        if start < 0:
            continue
        start += 3
        end2 = header.find(" SV=", start)
        if end2 < 0:
            continue
        try:
            existence = int(header[start:end2])
        except ValueError:
            existence = 0
        priority = 0
        if not any(u in ident for u in _UNINFORMATIVE):
            if db_type == "sp":
                priority = 4
            elif db_type == "tr":
                priority = 1
            # unsigned arithmetic: min(existence,5) - 5 wraps for < 5
            priority = (priority + (min(existence, 5) - 5)) & 0xFFFFFFFF
        queue.append([priority, ident, protein])
    _libstdcxx_make_heap(queue, lambda x, y: x[0] < y[0])
    parts = [f"Representative={rep} n={len(headers)} Descriptions=["]
    used = set()
    cnt = 0
    for i, (_, ident, protein) in enumerate(queue):
        if cnt > 5:
            break
        if protein in used:
            continue
        parts.append(protein)
        used.add(protein)
        cnt += 1
        if i != len(queue) - 1 and cnt <= 5:
            parts.append("|")
    parts.append("] Members=")
    for i, (_, ident, _p) in enumerate(queue):
        parts.append(ident)
        if i != len(queue) - 1:
            parts.append(",")
    return "".join(parts) + "\n"


def _metaclust_summarize(headers):
    queue = []
    rep = ""
    for hi, header in enumerate(headers):
        db_type = "UPI" if "UPI" in header else "lessImportant"
        end = header.find(" ")
        if end < 0:
            continue
        ident = header[:end]
        if hi == 0:
            rep = ident
        queue.append([4 if db_type == "UPI" else 1, ident])
    _libstdcxx_make_heap(queue, lambda x, y: x[0] < y[0])
    parts = [f"Representative={rep} n={len(headers)} Members="]
    for i, (_, ident) in enumerate(queue):
        parts.append(ident)
        if i != len(queue) - 1:
            parts.append(",")
    return "".join(parts) + "\n"


def summarizeheaders(par, command):
    """Summarize cluster-member headers into one uniclust-style line
    (reference src/util/summarizeheaders.cpp)."""
    qdb, tdb, resdb, out = par.filenames[:4]
    htype = par.header_type if par.was_set("header_type") else 1
    prefix = par.summary_prefix if par.was_set("summary_prefix") else "cl"
    summarize = _uniprot_summarize if htype == 1 else _metaclust_summarize
    # qdb/tdb are passed as the header DBs themselves (reference reads
    # par.db1/par.db2 directly, summarizeheaders.cpp:16-20)
    q = DBReader(qdb)
    t = q if tdb == qdb else DBReader(tdb)
    with DBReader(resdb) as r, \
            DBWriter(out, dbt.DBTYPE_GENERIC_DB,
                     compressed=bool(par.compressed)) as w:
        for i in range(r.size):
            key = r.get_db_key(i)
            headers = []
            rep = ""
            for entry, line in enumerate(r.get_data(i).splitlines()):
                if not line:
                    continue
                member = int(line.split()[0])
                src = q if entry == 0 else t
                if entry == 0:
                    rep = line.decode()
                headers.append(
                    src.get_data(src.get_id(member)).decode(errors="replace"))
            summary = f"{prefix}-{rep}|{summarize(headers)}"
            w.write(key, summary.encode())
    q.close()
    if t is not q:
        t.close()
    return 0


def recoverlongestorf(par, command):
    """From an ORF search result, emit the longest ORF key of every contig
    whose ORFs all missed (reference src/util/recoverlongestorf.cpp).
    Output is a headerless flat file of ORF keys."""
    orfdb, resdb, out = par.filenames[:3]
    hdr = DBReader(orfdb + "_h")
    contig_longest = {}  # contig -> (orfKey, orfLen)
    orf_contig = {}
    for i in range(hdr.size):
        orf_key = hdr.get_db_key(i)
        loc = parse_orf_header(hdr.get_data(i))
        if loc is None:
            continue
        contig, frm, to = loc[0], loc[1], loc[2]
        orf_len = abs(frm - to) + 1
        orf_contig[orf_key] = contig
        cur = contig_longest.get(contig)
        if cur is None or orf_len > cur[1]:
            contig_longest[contig] = (orf_key, orf_len)
    hdr.close()
    accepted, eliminated = set(), set()
    with DBReader(resdb) as r:
        for i in range(r.size):
            key = r.get_db_key(i)
            contig = orf_contig.get(key)
            if contig is None:
                continue
            if r.get_entry_len(i) > 1:
                accepted.add(contig)
            eliminated.add(contig)
    with open(out, "w") as f:
        for contig in eliminated - accepted:
            f.write(f"{contig_longest[contig][0]}\n")
    dbt.write_dbtype(out, dbt.DBTYPE_OMIT_FILE)
    return 0


def maskbygff(par, command):
    """X-out GFF-annotated regions of a sequence DB
    (reference src/util/maskbygff.cpp)."""
    gff, db, out = par.filenames[:3]
    gfftype = par.gff_type if par.was_set("gff_type") else ""
    r = DBReader(db)
    # The reference opens the seq DB with DBReader<std::string> in NOSORT
    # mode: the index stays in file (numeric) order and getId does a
    # *string* binary search over it — names ">= '2'" are unfindable once
    # the DB has >= 10 entries. Reproduce that exact behavior.
    str_keys = [str(r.get_db_key(i)) for i in range(r.size)]

    def get_id_strsearch(name):
        lo, hi = 0, len(str_keys)
        while lo < hi:
            mid = (lo + hi) // 2
            if str_keys[mid] < name:
                lo = mid + 1
            else:
                hi = mid
        if lo < len(str_keys) and str_keys[lo] == name:
            return lo
        return -1

    seqs = {r.get_db_key(i): bytearray(r.get_data(i)) for i in range(r.size)}
    with open(gff) as f:
        for ln, line in enumerate(f, 1):
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            if len(fields) != 9:
                log.warning(f"Invalid GFF format in line {ln}!")
                continue
            name, typ = fields[0], fields[2]
            if gfftype and typ != gfftype:
                continue
            try:
                start, end = int(fields[3]), int(fields[4])
            except ValueError:
                log.warning(f"Invalid position format in line {ln}!")
                continue
            if end <= start or end == 0 or start == 0:
                log.warning(f"Invalid sequence length in line {ln}!")
                continue
            sid = get_id_strsearch(name)
            if sid < 0:
                log.die(f"GFF entry not found in input database: {name}!")
            body = seqs[r.get_db_key(sid)]
            body[start - 1:end] = b"X" * (end - start + 1)
    id_offset = par.id_offset if par.was_set("id_offset") else 0
    hreader = DBReader(db + "_h")
    with DBWriter(out, r.base_type, compressed=bool(par.compressed)) as w, \
            DBWriter(out + "_h", dbt.DBTYPE_GENERIC_DB,
                     compressed=bool(par.compressed)) as wh:
        for i in range(r.size):
            new_key = id_offset + i
            key = r.get_db_key(i)
            w.write(new_key, bytes(seqs[key]))
            wh.write(new_key, hreader.get_data(hreader.get_id(key)))
    hreader.close()
    r.close()
    return 0


def gff2db(par, command):
    """Extract GFF features from a sequence DB into a new nucleotide DB
    (reference src/util/gff2db.cpp). Usage:
    gff2db <gff1> ... <gffN> <seqDB> <outDB>."""
    out = par.filenames[-1]
    seqdb = par.filenames[-2]
    gffs = par.filenames[:-2]
    features = ([f for f in par.gff_type.split(",") if f]
                if par.was_set("gff_type") and par.gff_type else [])
    if not features:
        log.warning("No feature types given. All features will be extracted")
    r = DBReader(seqdb)
    acc2key = {acc: key for key, (acc, _fn) in r.read_lookup().items()}
    with open(out + ".source", "w") as f:
        for i, g in enumerate(gffs):
            f.write(f"{i}\t{os.path.basename(g)}\n")
    n = 0
    lookup_lines = []
    with DBWriter(out, dbt.DBTYPE_NUCLEOTIDES,
                  compressed=bool(par.compressed)) as w, \
            DBWriter(out + "_h", dbt.DBTYPE_GENERIC_DB,
                     compressed=bool(par.compressed)) as wh:
        for fi, g in enumerate(gffs):
            idx = 0
            with open(g) as f:
                for line in f:
                    if line.startswith("#") or line == "\n":
                        continue
                    fields = line.rstrip("\n").split("\t")
                    if len(fields) < 9:
                        log.warning("Not enough columns in GFF file")
                        continue
                    if features and fields[2] not in features:
                        continue
                    start, end = int(fields[3]), int(fields[4])
                    if start == end:
                        log.warning(f"Invalid sequence length in line {idx}")
                        continue
                    strand, name = fields[6], fields[0]
                    if name not in acc2key:
                        log.die("GFF entry not found in database lookup: "
                                + name)
                    lkey = acc2key[name]
                    sid = r.get_id(lkey)
                    if sid < 0:
                        log.die("GFF entry not found in sequence database: "
                                + name)
                    key = n
                    n += 1
                    seq = r.get_seq(sid)
                    length = end - start + 1
                    if strand == "+":
                        wh.write(key, write_orf_header(lkey, start, end))
                        lookup_lines.append(
                            f"{key}\t{name}_{idx}_{start}_{end}\t{fi}\n")
                        frag = seq[start - 1:start - 1 + length]
                    else:
                        wh.write(key, write_orf_header(lkey, end, start))
                        lookup_lines.append(
                            f"{key}\t{name}_{idx}_{end}_{start}\t{fi}\n")
                        frag = seq[end - length:end][::-1].translate(
                            COMPLEMENT)
                    w.write(key, frag + b"\n")
                    idx += 1
    with open(out + ".lookup", "w") as f:
        f.write("".join(lookup_lines))
    r.close()
    log.info(f"{n + 1} features were extracted")
    return 0


def diffseqdbs(par, command):
    """Diff two sequence DBs by header: emit removed / kept(mapped) / new
    key files (reference src/util/diffseqdbs.cpp)."""
    from ..db.fasta import parse_fasta_header

    old_db, new_db, removed_f, kept_f, new_f = par.filenames[:5]
    use_seq_id = bool(par.use_seq_id) if par.was_set("use_seq_id") else False

    def read_keys(db):
        out = []
        with DBReader(db + "_h") as r:
            for i in range(r.size):
                h = r.get_data(i)
                if use_seq_id:
                    name = parse_fasta_header(h).decode()
                else:
                    name = "".join(h.decode(errors="replace").split())
                out.append((name, r.get_db_key(i)))
        return out

    keys_old = read_keys(old_db)
    keys_new = read_keys(new_db)
    keys_new.sort(key=lambda p: p[0])
    # duplicate headers in new DB are invalidated
    invalid_new = [False] * len(keys_new)
    for i in range(len(keys_new) - 1):
        if keys_new[i][0] == keys_new[i + 1][0]:
            invalid_new[i + 1] = True
    # duplicate headers in old DB are deleted
    deleted = [False] * len(keys_old)
    order = sorted(range(len(keys_old)), key=lambda i: keys_old[i][0])
    for a, b in zip(order, order[1:]):
        if keys_old[a][0] == keys_old[b][0]:
            deleted[b] = True
    names_new = [p[0] for p in keys_new]
    checked = [False] * len(keys_new)
    mapped = [0] * len(keys_new)
    import bisect
    for i, (name, _key) in enumerate(keys_old):
        if deleted[i]:
            continue
        j = bisect.bisect_left(names_new, name)
        if j < len(keys_new) and names_new[j] == name:
            checked[j] = True
            mapped[j] = i
        else:
            deleted[i] = True
    with open(kept_f, "w") as kf, open(new_f, "w") as nf:
        for j in range(len(keys_new)):
            if invalid_new[j]:
                continue
            if checked[j]:
                kf.write(f"{keys_old[mapped[j]][1]}\t{keys_new[j][1]}\n")
            else:
                nf.write(f"{keys_new[j][1]}\n")
    with open(removed_f, "w") as rf:
        for i in range(len(keys_old)):
            if deleted[i]:
                rf.write(f"{keys_old[i][1]}\n")
    return 0


def clusthash(par, command):
    """Group sequences by reduced-alphabet hash; within each hash bucket link
    equal-length sequences with Hamming identity >= --min-seq-id
    (reference src/util/clusthash.cpp). Output is an alignment-result DB."""
    from ..align.util import fast_seq_id_str
    from ..data.reduced import get_reduced

    def seq_id_raw(s):
        # raw fastSeqIdToBuffer (Util.cpp:251-263): '1.000' at identity —
        # unlike the alignment path, no trailing char is overwritten here
        return "1.000" if np.float32(s) == 1.0 else fast_seq_id_str(s)

    db, out = par.filenames[:2]
    seq_id_thr = par.min_seq_id if par.was_set("min_seq_id") else 0.99
    alph = (par.alph_size.aa if par.was_set("alph_size") else 3)
    r = DBReader(db)
    is_nucl = r.base_type == dbt.DBTYPE_NUCLEOTIDES
    n = r.size
    hashes = np.empty(n, dtype=np.uint64)
    if is_nucl:
        for i in range(n):
            seq = r.get_seq(i)
            h1 = h2 = 0
            rc = seq[::-1].translate(COMPLEMENT)
            for b1, b2 in zip(seq, rc):
                h1 = (h1 * 31 + b1) & U64
                h2 = (h2 * 31 + b2) & U64
            hashes[i] = min(h1, h2)
    else:
        red = get_reduced(par.sub_mat.aa, alph)
        table = red.make_aa2num_table()
        for i in range(n):
            num = table[np.frombuffer(r.get_seq(i), np.uint8)]
            h = 0
            for v in num:
                h = (h * 31 + int(v)) & U64
            hashes[i] = h
    order = sorted(range(n), key=lambda i: (int(hashes[i]), i))
    with DBWriter(out, dbt.DBTYPE_ALIGNMENT_RES,
                  compressed=bool(par.compressed)) as w:
        start = 0
        while start < n:
            stop = start
            while stop < n and hashes[order[stop]] == hashes[order[start]]:
                stop += 1
            ids = order[start:stop]
            found = [False] * len(ids)
            for a in range(len(ids)):
                qkey = r.get_db_key(ids[a])
                qlen = r.get_seq_len(ids[a])
                qseq = r.get_seq(ids[a])
                lines = [f"{qkey}\t255\t1.00\t0\t0\t{qlen - 1}\t{qlen}"
                         f"\t0\t{qlen - 1}\t{qlen}\n"]
                if not found[a]:
                    for b in range(len(ids)):
                        if found[b] or a == b:
                            continue
                        if r.get_seq_len(ids[b]) != qlen:
                            continue
                        tseq = r.get_seq(ids[b])
                        same = sum(x == y for x, y in zip(qseq, tseq))
                        seq_id = np.float32(same) / np.float32(qlen)
                        if seq_id >= seq_id_thr:
                            lines.append(
                                f"{r.get_db_key(ids[b])}\t255\t"
                                f"{seq_id_raw(seq_id)}\t0\t0\t"
                                f"{qlen - 1}\t{qlen}\t0\t{qlen - 1}\t"
                                f"{qlen}\n")
                            found[b] = True
                w.write(qkey, "".join(lines).encode())
            start = stop
    r.close()
    return 0


def calculatelambda(par, command):
    """Compute Karlin-Altschul lambda + background for a matrix file,
    print them as '# ...' comments followed by the comment-stripped matrix
    (reference src/util/calculatelambda.cpp + SubstitutionMatrix.cpp:396-403:
    SSTR(float, 5) = %.5f)."""
    import tempfile

    from ..data.submat import SubstitutionMatrix

    path = par.filenames[0]
    with open(path) as f:
        filtered = "".join(line.rstrip("\n") + "\n" for line in f
                           if not line.startswith("#"))
    with tempfile.NamedTemporaryFile("w", suffix=".out") as tmp:
        tmp.write(filtered)
        tmp.flush()
        mat = SubstitutionMatrix(tmp.name, 2.0, 0.0)
    back = " ".join(f"{p:.5f}" for p in mat._pback_file)
    print(f"# Background (precomputed optional): {back}")
    print(f"# Lambda     (precomputed optional): {mat.lambda_file:.5f}")
    print(filtered, end="")
    return 0
