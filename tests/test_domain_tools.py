"""Parity tests for the domain/annotation tool batch against reference
goldens in tests/golden/domain (produced with /tmp/refbuild/src/mmseqs):

    convertalis toy/qdb toy/qdb toy/aln tabdb --db-output 1 --threads 1
    summarizetabs tabdb lengths.tsv dom --threads 1
        (lengths.tsv: "<key>\\t<len>" and "<name>\\t<len>" for every toy seq)
    result2msa toy/qdb toy/qdb toy/aln msa --threads 1
    extractdomains dom msa domext --msa-type 2 --threads 1
    extractdomains dom ca3m domext0 --msa-type 0 --threads 1
        (ca3m: crafted triple, see _build_ca3m below — byte-identical build)
    apply tabdb applied --threads 1 -- /usr/bin/tr a-z A-Z
    convertca3m ca3m convca3m --threads 1
"""

import pathlib

import pytest

from mmseqs2_tpu.commands import convertalis as conv
from mmseqs2_tpu.commands import domain_tools, msa_tools
from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.profile.ca3m import (extract_a3m, extract_matcher_results,
                                      hit_to_buffer)

GOLDEN = pathlib.Path(__file__).parent / "golden" / "domain"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def _params(files, **kw):
    p = Params()
    p.filenames = [str(f) for f in files]
    for k, v in kw.items():
        p.set(k, v)
    return p


def _assert_db_equal(golden, ours):
    assert open(golden, "rb").read() == open(ours, "rb").read()
    assert (open(str(golden) + ".index").read()
            == open(str(ours) + ".index").read())


def _expand_cigar(bt):
    out = []
    num = ""
    for c in bt:
        if c.isdigit():
            num += c
        else:
            out.append(c * int(num))
            num = ""
    return "".join(out)


def _build_ca3m(base):
    """Craft the same ca3m triple used to make the convca3m/domext0
    goldens: per query a consensus head + self record + one record per
    toy/aln hit, encoded with hit_to_buffer."""
    import shutil
    qdb = DBReader(str(TOY / "qdb"))
    aln = DBReader(str(TOY / "aln"))
    with open(f"{base}_ca3m.ffdata", "wb") as data, \
            open(f"{base}_ca3m.ffindex", "w") as idx:
        off = 0
        for i in range(aln.size):
            key = aln.get_db_key(i)
            qi = qdb.get_id(key)
            qseq = qdb.get_seq(qi).decode()
            entry = bytearray()
            entry += f">consensus_q{key}\n{qseq}\n;".encode()
            entry += hit_to_buffer(qi, 0, 0, "M" * len(qseq))
            for line in aln.get_data(i).decode().splitlines():
                if not line:
                    continue
                f = line.split("\t")
                entry += hit_to_buffer(
                    qdb.get_id(int(f[0])), int(f[4]), int(f[7]),
                    _expand_cigar(f[10]) if len(f) > 10 else "")
            entry += b"\0"
            data.write(entry)
            idx.write(f"{key}\t{off}\t{len(entry)}\n")
            off += len(entry)
    for src, dst in ((TOY / "qdb", f"{base}_sequence.ffdata"),
                     (TOY / "qdb.index", f"{base}_sequence.ffindex"),
                     (TOY / "qdb_h", f"{base}_header.ffdata"),
                     (TOY / "qdb_h.index", f"{base}_header.ffindex")):
        shutil.copy(src, dst)
    qdb.close()
    aln.close()


def test_convertalis_db_output(tmp_path):
    out = tmp_path / "tabdb"
    conv.convertalis(_params(
        [TOY / "qdb", TOY / "qdb", TOY / "aln", out], db_output=True), None)
    _assert_db_equal(GOLDEN / "tabdb", out)


def test_summarizetabs(tmp_path):
    out = tmp_path / "dom"
    domain_tools.summarizetabs(_params(
        [GOLDEN / "tabdb", GOLDEN / "lengths.tsv", out]), None)
    _assert_db_equal(GOLDEN / "dom", out)


def test_extractdomains_fasta(tmp_path):
    msa = tmp_path / "msa"
    msa_tools.result2msa(_params([TOY / "qdb", TOY / "qdb", TOY / "aln",
                                  msa]), None)
    out = tmp_path / "domext"
    domain_tools.extractdomains(_params(
        [GOLDEN / "dom", msa, out], msa_type=2), None)
    _assert_db_equal(GOLDEN / "domext", out)


def test_extractdomains_ca3m(tmp_path):
    _build_ca3m(tmp_path / "ca3m")
    out = tmp_path / "domext0"
    domain_tools.extractdomains(_params(
        [GOLDEN / "dom", tmp_path / "ca3m", out], msa_type=0), None)
    _assert_db_equal(GOLDEN / "domext0", out)


def test_convertca3m(tmp_path):
    _build_ca3m(tmp_path / "ca3m")
    out = tmp_path / "convca3m"
    msa_tools.convertca3m(_params([tmp_path / "ca3m", out]), None)
    _assert_db_equal(GOLDEN / "convca3m", out)


def test_apply(tmp_path):
    out = tmp_path / "applied"
    p = _params([GOLDEN / "tabdb", out])
    p.filenames += ["/usr/bin/tr", "a-z", "A-Z"]
    domain_tools.apply_cmd(p, None)
    _assert_db_equal(GOLDEN / "applied", out)


def test_ca3m_roundtrip(tmp_path):
    """hit_to_buffer -> extract_matcher_results inverts the encoding."""
    _build_ca3m(tmp_path / "ca3m")
    with DBReader(f"{tmp_path}/ca3m_ca3m.ffdata",
                  f"{tmp_path}/ca3m_ca3m.ffindex") as r, \
            DBReader(str(TOY / "qdb")) as seqs, \
            DBReader(str(TOY / "aln")) as aln:
        for i in (0, 1, 7):
            key, results = extract_matcher_results(
                r.get_data(i), seqs, skip_first=True)
            assert key == r.get_db_key(i)
            lines = [ln.split("\t")
                     for ln in aln.get_data_by_key(key).decode().splitlines()
                     if ln]
            assert len(results) == len(lines)
            for h, f in zip(results, lines):
                assert h["db_key"] == int(f[0])
                assert (h["q_start"], h["q_end"]) == (int(f[4]), int(f[5]))
                assert (h["db_start"], h["db_end"]) == (int(f[7]), int(f[8]))
                assert h["backtrace"] == _expand_cigar(f[10])


def test_extract_a3m_shape(tmp_path):
    """extract_a3m emits one header+row pair per record, '-'-padded to the
    consensus length."""
    _build_ca3m(tmp_path / "ca3m")
    with DBReader(f"{tmp_path}/ca3m_ca3m.ffdata",
                  f"{tmp_path}/ca3m_ca3m.ffindex") as r, \
            DBReader(str(TOY / "qdb")) as seqs, \
            DBReader(str(TOY / "qdb_h")) as hdrs:
        a3m = extract_a3m(r.get_data(0), seqs, hdrs).decode()
        rows = a3m.splitlines()
        assert rows[0] == ">consensus_q0"
        consensus = rows[1]
        headers = [r_ for r_ in rows[2:] if r_.startswith(">")]
        seqrows = [r_ for r_ in rows[2:] if not r_.startswith(">")]
        assert len(headers) == len(seqrows) >= 1
        # first decoded record is the master sequence itself
        assert seqrows[0] == consensus
        for row in seqrows:
            assert sum(1 for c in row if c != "-" and not c.islower()) \
                <= len(consensus)
