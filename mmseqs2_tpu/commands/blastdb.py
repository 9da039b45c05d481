"""`convertblastdb` — convert an NCBI BLAST database (v4/v5) to our format.

Reference: /root/reference/src/util/convertblastdb.cpp. Handles:
  - volume discovery: plain base, numbered volumes (.00, .01, ...), and
    .pal/.nal alias files (findVolumes, :307-448);
  - .pin/.nin v4/v5 index headers + (nseq+1) BE offset arrays for headers,
    sequences, and (nucleotide) ambiguity blocks (:452-660);
  - .psq ncbistdaa decoding (:169-185), .nsq 2-bit decoding with 32/64-bit
    ambiguity patch tables (:55-167);
  - .phr BER/ASN.1 Blast-def-line parsing: title, Seq-id CHOICE list
    (textseq ids, general Dbtag, gi, PDB), taxid, PIG (:662-1420) — with
    the reference's LIFO seqid traversal quirk (parseSeqidList :1177-1202);
  - outputs: seq DB + _h DB, .lookup (key, accession, PIG), _mapping
    (key, taxid) (:1542-1605).
"""

import glob
import os
import struct

import numpy as np

from ..db import dbtype as dbt
from ..db.writer import DBWriter
from ..utils import log

STDAA = "-ABCDEFGHIKLMNPQRSTVWXYZU*OJ"
IUPAC = "NACMGRSVTWYHKDBN"
NA2 = "ACGT"


def _be32(b, p):
    return struct.unpack_from(">I", b, p)[0]


# -- BER/TLV ------------------------------------------------------------------

class Tlv:
    __slots__ = ("tag", "cls", "constructed", "length", "vpos")


def _read_tlv(b, i):
    """Returns (Tlv, value_pos) or None; length -1 = indefinite."""
    n = len(b)
    if i >= n:
        return None
    t = Tlv()
    t.tag = b[i]
    t.cls = b[i] & 0xC0
    t.constructed = bool(b[i] & 0x20)
    i += 1
    if i >= n:
        return None
    l0 = b[i]
    i += 1
    if l0 == 0x80:
        t.length = -1
    elif l0 & 0x80:
        nb = l0 & 0x7F
        if i + nb > n or nb > 8:
            return None
        val = 0
        for k in range(nb):
            val = (val << 8) | b[i + k]
        i += nb
        t.length = val
    else:
        t.length = l0
    t.vpos = i
    return t


def _is_eoc(b, p):
    return p + 2 <= len(b) and b[p] == 0 and b[p + 1] == 0


def _skip_value(b, start):
    """Returns (Tlv, next_pos) or None."""
    t = _read_tlv(b, start)
    if t is None:
        return None
    if t.length >= 0:
        nxt = t.vpos + t.length
        if nxt > len(b):
            return None
        return t, nxt
    # indefinite: walk children to EOC
    p = t.vpos
    while not _is_eoc(b, p):
        r = _skip_value(b, p)
        if r is None:
            return None
        p = r[1]
        if p >= len(b):
            return None
    return t, p + 2


def _children(b, t):
    """Iterate (child_pos, Tlv, next_pos) of a constructed node."""
    p = t.vpos
    while True:
        if t.length >= 0 and p >= t.vpos + t.length:
            return
        if t.length < 0 and _is_eoc(b, p):
            return
        r = _skip_value(b, p)
        if r is None:
            return
        yield p, r[0], r[1]
        p = r[1]


def _get_string(b, pos):
    r = _skip_value(b, pos)
    if r is None:
        return None
    t = r[0]
    if t.constructed:          # ctx wrapper around the string
        for cp, ct, _ in _children(b, t):
            if ct.tag in (0x1A, 0x0C) and ct.length >= 0:
                return b[ct.vpos:ct.vpos + ct.length].decode(
                    "utf-8", "replace")
        return None
    if t.tag in (0x1A, 0x0C) and t.length >= 0:
        return b[t.vpos:t.vpos + t.length].decode("utf-8", "replace")
    if t.cls == 0x80 and t.length >= 0:
        return b[t.vpos:t.vpos + t.length].decode("utf-8", "replace")
    return None


def _get_int(b, pos):
    r = _skip_value(b, pos)
    if r is None:
        return None
    t = r[0]
    if t.constructed:
        for cp, ct, _ in _children(b, t):
            if ct.tag == 0x02:
                return _prim_int(b, ct)
        return None
    if t.tag == 0x02 or (t.cls == 0x80 and not t.constructed):
        return _prim_int(b, t)
    return None


def _prim_int(b, t):
    if t.length < 0 or t.length > 8:
        return None
    v = 0
    for k in range(t.length):
        v = (v << 8) | b[t.vpos + k]
    if t.length and (b[t.vpos] & 0x80):
        v -= 1 << (8 * t.length)
    return v


def _type_from_choice(which):
    return {7: 1, 9: 2, 4: 3, 5: 4, 12: 5, 6: 6, 13: 7, 10: 8,
            11: 9}.get(which, 10)


class SeqId:
    def __init__(self):
        self.which = -1
        self.type = 0
        self.accession = ""
        self.name = ""
        self.version = ""
        self.db = ""
        self.tag = ""


def _parse_textseq(b, pos, out):
    r = _skip_value(b, pos)
    if r is None:
        return
    for cp, ct, _ in _children(b, r[0]):
        if ct.cls == 0x80:
            ntag = ct.tag & 0x1F
            if ntag == 0:
                s = _get_string(b, cp)
                if s is not None:
                    out.name = s
            elif ntag == 1:
                s = _get_string(b, cp)
                if s is not None:
                    out.accession = s
            elif ntag == 3:
                v = _get_int(b, cp)
                if v is not None:
                    out.version = str(v)


def _parse_dbtag(b, pos, out):
    """Dbtag ::= SEQUENCE { db VisibleString (untagged), tag Object-id
    CHOICE { id [0] INTEGER, str [1] VisibleString } }
    (convertblastdb.cpp:970-1020)."""
    r = _skip_value(b, pos)
    if r is None or r[0].tag != 0x30:
        return False
    got_db = False
    for cp, ct, _ in _children(b, r[0]):
        if ct.tag in (0x1A, 0x0C) and ct.length >= 0 and not got_db:
            out.db = b[ct.vpos:ct.vpos + ct.length].decode(
                "utf-8", "replace")
            got_db = True
        elif ct.cls == 0x80:
            ntag = ct.tag & 0x1F
            if ntag == 0:
                v = _get_int(b, cp)
                if v is not None:
                    out.tag = str(v)
            elif ntag == 1:
                s = _get_string(b, cp)
                if s is not None:
                    out.tag = s
    return bool(out.db or out.tag)


def _parse_seqid(b, ctag, vpos):
    out = SeqId()
    out.which = ctag & 0x1F
    out.type = _type_from_choice(out.which)
    textseq = out.which in (4, 5, 6, 7, 9, 12, 13, 15, 16, 17, 18, 19)
    if textseq:
        r = _skip_value(b, vpos)
        if r is None:
            return None
        inner = r[0]
        if inner.tag == 0x30 or inner.constructed:
            _parse_textseq(b, vpos, out)
            return out if (out.accession or out.name) else None
        acc = None
        if inner.tag in (0x1A, 0x0C) or (inner.cls == 0x80
                                         and inner.length >= 0):
            acc = b[inner.vpos:inner.vpos + inner.length].decode(
                "utf-8", "replace").strip()
        if acc:
            out.accession = acc
            return out
        return None
    if out.which == 10:
        return out if _parse_dbtag(b, vpos, out) else None
    if out.which == 11:
        v = _get_int(b, vpos)
        if v is not None:
            out.tag = str(v)
            return out
    return None


def _format_id(sid):
    """(rank, id) — convertblastdb.cpp:1241-1286."""
    if sid.which == 6 and sid.accession:
        return 1, "pir|" + sid.accession + "|" + sid.name
    if sid.which == 13:
        if sid.name:
            return 4, "prf||" + sid.name
        if sid.accession:
            return 1, "prf||" + sid.accession
    if sid.accession:
        if sid.version:
            dot = sid.accession.rfind(".")
            if dot < 0 or sid.accession[dot + 1:] != sid.version:
                return 0, sid.accession + "." + sid.version
            return 0, sid.accession
        return 1, sid.accession
    if sid.type == 8 and sid.db and sid.tag:
        return 2, sid.db + "|" + sid.tag
    if sid.type == 9 and sid.tag:
        return 3, "gi|" + sid.tag
    if sid.name:
        return 4, sid.name
    return 5, ""


def parse_defline(blob):
    """Returns (header, first_taxid, first_pig, first_best_id)."""
    header = ""
    first_tax = -1
    first_pig = -1
    first_id = ""
    has_first = False
    i = 0
    while i < len(blob):
        r = _skip_value(blob, i)
        if r is None:
            break
        t, nxt = r
        if t.tag == 0x30:
            for dp, dt, dn in _children(blob, t):
                if dt.tag != 0x30:
                    continue
                title = ""
                taxid = -1
                pig = -1
                seqids = []
                for fp, ft, fn in _children(blob, dt):
                    if ft.cls != 0x80:
                        continue
                    ntag = ft.tag & 0x1F
                    if ntag == 0 and not title:
                        s = _get_string(blob, fp)
                        if s is not None:
                            title = s
                    elif ntag == 1:
                        r2 = _skip_value(blob, fp)
                        if r2 is not None:
                            # LIFO traversal quirk (:1177-1202)
                            nodes = [(cp, ct) for cp, ct, _ in
                                     _children(blob, r2[0])]
                            for cp, ct in reversed(nodes):
                                if ct.cls == 0x80:
                                    sid = _parse_seqid(blob, ct.tag,
                                                       ct.vpos)
                                    if sid is not None:
                                        seqids.append(sid)
                                elif ct.constructed:
                                    for qp, qt, _ in _children(blob, ct):
                                        if qt.cls == 0x80:
                                            sid = _parse_seqid(
                                                blob, qt.tag, qt.vpos)
                                            if sid is not None:
                                                seqids.append(sid)
                    elif ntag == 2 and taxid < 0:
                        v = _get_int(blob, fp)
                        if v is not None:
                            taxid = v
                    elif ntag == 4 and pig < 0:
                        v = _get_int(blob, fp)
                        if v is not None:
                            pig = v
                best_rank, best_id = 6, ""
                for sid in seqids:
                    rank, cand = _format_id(sid)
                    if cand and rank < best_rank:
                        best_rank, best_id = rank, cand
                        if rank == 0:
                            break
                part = (best_id + " " + title if best_id and title
                        else best_id or title)
                if not has_first:
                    first_tax, first_pig, first_id = taxid, pig, best_id
                    has_first = True
                if part:
                    header = part if not header else header + " >" + part
            break
        i = nxt
    return header, first_tax, first_pig, first_id


# -- index + sequence decoding --------------------------------------------------

def _parse_index(idx, kind):
    """Returns (nseq, hdr_offsets, seq_offsets, amb_offsets or None)."""
    pos = 0
    ver = _be32(idx, pos)
    pos += 4
    pos += 4  # seq type
    if ver == 5:
        pos += 4  # volume index
        for _ in range(3):
            slen = _be32(idx, pos)
            pos += 4 + slen
    elif ver == 4:
        for _ in range(2):
            slen = _be32(idx, pos)
            pos += 4 + slen
    else:
        raise ValueError(f"unsupported BLAST index version {ver}")
    nseq = _be32(idx, pos)
    pos += 4
    pos += 8   # letters (u64 LE)
    pos += 4   # max length
    entries = nseq + 1
    hdr = np.frombuffer(idx, ">u4", entries, pos).astype(np.int64)
    pos += entries * 4
    seq = np.frombuffer(idx, ">u4", entries, pos).astype(np.int64)
    pos += entries * 4
    amb = None
    if kind == dbt.DBTYPE_NUCLEOTIDES and pos + entries * 4 <= len(idx):
        a = np.frombuffer(idx, ">u4", entries, pos).astype(np.int64)
        ok = np.all((a[:-1] >= seq[:-1]) & (a[:-1] <= seq[1:]))
        amb = a if ok else None
    return nseq, hdr, seq, amb


def _decode_psq(psq, s, e):
    if e > s and psq[e - 1] == 0:
        e -= 1
    arr = np.frombuffer(psq, np.uint8, e - s, s)
    lut = np.frombuffer(
        (STDAA + "X" * (256 - len(STDAA))).encode(), np.uint8)
    return lut[arr].tobytes().decode()


def _decode_nsq(nsq, s0, a0, s1):
    """2-bit decode [s0, a0) + ambiguity patches [a0, s1)."""
    if a0 <= s0:
        return ""
    nbytes = a0 - s0
    last = nsq[a0 - 1]
    nres = (nbytes - 1) * 4 + (last & 0x03)
    packed = np.frombuffer(nsq, np.uint8, nbytes, s0)
    codes = np.empty(nbytes * 4, np.uint8)
    codes[0::4] = (packed >> 6) & 3
    codes[1::4] = (packed >> 4) & 3
    codes[2::4] = (packed >> 2) & 3
    codes[3::4] = packed & 3
    lut = np.frombuffer(b"ACGT", np.uint8)
    seq = bytearray(lut[codes[:nres]].tobytes())
    # ambiguity patches
    if s1 - a0 >= 4:
        count = _be32(nsq, a0)
        is64 = bool(count & 0x80000000)
        count &= 0x7FFFFFFF
        table_bytes = count * 4
        if 4 + table_bytes <= s1 - a0:
            p = a0 + 4
            n_entries = table_bytes // (8 if is64 else 4)
            for _ in range(n_entries):
                if is64:
                    word = struct.unpack_from(">Q", nsq, p)[0]
                    p += 8
                    sym = (word >> 60) & 0xF
                    rep = ((word >> 48) & 0xFFF) + 1
                    off = word & 0xFFFFFFFFFFFF
                else:
                    w = _be32(nsq, p)
                    p += 4
                    sym = w >> 28
                    rep = ((w >> 24) & 0xF) + 1
                    off = w & 0xFFFFFF
                ch = ord(IUPAC[sym]) if sym < 16 else ord("N")
                a = off
                b = min(off + rep, len(seq))
                if a < len(seq):
                    for k in range(a, b):
                        seq[k] = ch
    return seq.decode()


# -- volume discovery -------------------------------------------------------------

def _numbered_vols(base, ext):
    out = []
    for cand in sorted(glob.glob(base + ".*" + ext)):
        stem = cand[len(base) + 1:-len(ext)]
        if stem.isdigit():
            out.append((int(stem), cand[:-len(ext)]))
    out.sort()
    return [v for _, v in out]


def find_volumes(db):
    """Returns (kind, [volume bases])."""
    for ext, kind in ((".psq", dbt.DBTYPE_AMINO_ACIDS),
                      (".nsq", dbt.DBTYPE_NUCLEOTIDES)):
        if os.path.exists(db + ext):
            return kind, [db]
    for ext, kind in ((".psq", dbt.DBTYPE_AMINO_ACIDS),
                      (".nsq", dbt.DBTYPE_NUCLEOTIDES)):
        vols = _numbered_vols(db, ext)
        if vols:
            return kind, vols
    for alias, ext, kind in ((".pal", ".psq", dbt.DBTYPE_AMINO_ACIDS),
                             (".nal", ".nsq", dbt.DBTYPE_NUCLEOTIDES)):
        if os.path.exists(db + alias):
            dirn = os.path.dirname(db) or "."
            vols = []
            for line in open(db + alias):
                if line.startswith("DBLIST"):
                    for name in line.split()[1:]:
                        name = name.strip('"')
                        cand = name if os.path.isabs(name) \
                            else os.path.join(dirn, name)
                        if os.path.exists(cand + ext):
                            vols.append(cand)
                        else:
                            vols.extend(_numbered_vols(cand, ext))
            if vols:
                return kind, vols
    log.die(f"No .psq/.nsq or .pal/.nal found for '{db}'")


def convertblastdb(par, command):
    in_db, out_db = par.filenames[:2]
    kind, volumes = find_volumes(in_db)
    log.info(f"Found {len(volumes)} volume(s) "
             f"({'protein' if kind == dbt.DBTYPE_AMINO_ACIDS else 'nucleotide'})")
    seq_ext, hdr_ext, idx_ext = ((".psq", ".phr", ".pin")
                                 if kind == dbt.DBTYPE_AMINO_ACIDS
                                 else (".nsq", ".nhr", ".nin"))
    total = 0
    with DBWriter(out_db, kind, compressed=bool(par.compressed)) as sw, \
            DBWriter(out_db + "_h", dbt.DBTYPE_GENERIC_DB,
                     compressed=bool(par.compressed)) as hw, \
            open(out_db + ".lookup", "w") as lk, \
            open(out_db + "_mapping", "w") as mp:
        key = 0
        for base in volumes:
            idx = open(base + idx_ext, "rb").read()
            seqd = open(base + seq_ext, "rb").read()
            hdrd = open(base + hdr_ext, "rb").read()
            nseq, hoff, soff, aoff = _parse_index(idx, kind)
            for i in range(nseq):
                blob = hdrd[hoff[i]:hoff[i + 1]]
                header, taxid, pig, _ = parse_defline(blob)
                if not header:
                    header = f"OID:{key + 1}"
                if not header.endswith("\n"):
                    header += "\n"
                if kind == dbt.DBTYPE_AMINO_ACIDS:
                    s = _decode_psq(seqd, int(soff[i]), int(soff[i + 1]))
                else:
                    a0 = int(soff[i + 1])
                    if aoff is not None:
                        a0 = int(aoff[i])
                        if a0 < soff[i] or a0 > soff[i + 1]:
                            a0 = int(soff[i + 1])
                    s = _decode_nsq(seqd, int(soff[i]), a0,
                                    int(soff[i + 1]))
                hw.write(key, header.encode())
                sw.write(key, (s + "\n").encode())
                if taxid >= 0:
                    mp.write(f"{key}\t{taxid}\n")
                acc = header.split()[0] if header.strip() else str(key)
                lk.write(f"{key}\t{acc}\t{pig if pig >= 0 else 0}\n")
                key += 1
            total += nseq
    log.info(f"Wrote {total} sequences")
    return 0
