"""Parity tests for the misc_tools command batch against reference goldens.

Goldens in tests/golden/misc were produced with the reference binary
(/tmp/refbuild/src/mmseqs, see tests/golden/README.md):

    createdb NUCL.fasta ndb && extractorfs ndb orfs --threads 1
    translateaa toy/qdb taa --threads 1
    extractalignedregion toy/qdb toy/qdb toy/aln extreg --threads 1
    clusthash toy/qdb chash --threads 1
    summarizeheaders hseq hseq toy/clu0 sumh --threads 1
        (hseq = toy/qdb_h re-typed as an aminoacid DB so the validator
         accepts it — the header text is what the summarizer parses)
    countkmer toy/qdb -k 2 > countk.txt
    createsubdb <(seq 100 399) toy/qdb subdb
    diffseqdbs toy/qdb subdb rm.txt kept.txt new.txt --threads 1
    recoverlongestorf orfs orfres reclorf --threads 1
        (orfres: crafted result DB, keys < 10 non-empty, rest empty)
    gff2db test.gff ndb gffdb --gff-type gene --threads 1
    maskbygff mask.gff ndb maskdb --gff-type exon
"""

import io
import contextlib
import os
import pathlib

import pytest

from mmseqs2_tpu.commands import misc_tools
from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params

GOLDEN = pathlib.Path(__file__).parent / "golden" / "misc"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def _params(files, **kw):
    p = Params()
    p.filenames = [str(f) for f in files]
    for k, v in kw.items():
        p.set(k, v)
    return p


def _assert_db_equal(golden, ours, with_index=True):
    assert open(golden, "rb").read() == open(ours, "rb").read()
    if with_index:
        assert (open(str(golden) + ".index").read()
                == open(str(ours) + ".index").read())


def test_translateaa(tmp_path):
    out = tmp_path / "taa"
    misc_tools.translateaa(_params([TOY / "qdb", out]), None)
    _assert_db_equal(GOLDEN / "taa", out)


def test_extractalignedregion(tmp_path):
    out = tmp_path / "extreg"
    misc_tools.extractalignedregion(
        _params([TOY / "qdb", TOY / "qdb", TOY / "aln", out]), None)
    # data bytes are exact; the reference's index order within duplicate
    # keys follows ips4o's unstable sort, so compare a canonicalized index
    assert (open(GOLDEN / "extreg", "rb").read()
            == open(out, "rb").read())

    def canon(path):
        rows = [l.split("\t") for l in open(path)]
        return sorted((int(r[0]), int(r[1]), int(r[2])) for r in rows)

    assert canon(str(GOLDEN / "extreg") + ".index") == canon(
        str(out) + ".index")


def test_clusthash(tmp_path):
    out = tmp_path / "chash"
    misc_tools.clusthash(_params([TOY / "qdb", out]), None)
    _assert_db_equal(GOLDEN / "chash", out)


def test_summarizeheaders(tmp_path):
    out = tmp_path / "sumh"
    misc_tools.summarizeheaders(
        _params([GOLDEN / "hseq", GOLDEN / "hseq", TOY / "clu0", out]), None)
    _assert_db_equal(GOLDEN / "sumh", out)


def test_countkmer():
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        misc_tools.countkmer(_params([TOY / "qdb"], kmer_size=2), None)
    assert buf.getvalue() == open(GOLDEN / "countk.txt").read()


def test_diffseqdbs(tmp_path):
    rm, kept, new = (tmp_path / n for n in ("rm", "kept", "new"))
    misc_tools.diffseqdbs(
        _params([TOY / "qdb", GOLDEN / "subdb", rm, kept, new]), None)
    assert open(rm).read() == open(GOLDEN / "rm.txt").read()
    assert open(kept).read() == open(GOLDEN / "kept.txt").read()
    assert open(new).read() == open(GOLDEN / "new.txt").read()


def test_recoverlongestorf(tmp_path):
    out = tmp_path / "reclorf"
    misc_tools.recoverlongestorf(
        _params([GOLDEN / "orfs", GOLDEN / "orfres", out]), None)
    # reference iterates an unordered_set -> compare as sets
    assert (sorted(open(out).read().splitlines())
            == sorted(open(GOLDEN / "reclorf").read().splitlines()))


def test_gff2db(tmp_path):
    out = tmp_path / "gffdb"
    misc_tools.gff2db(
        _params([GOLDEN / "test.gff", GOLDEN / "ndb", out],
                gff_type="gene"), None)
    _assert_db_equal(GOLDEN / "gffdb", out)
    _assert_db_equal(str(GOLDEN / "gffdb") + "_h", str(out) + "_h")
    assert (open(str(GOLDEN / "gffdb") + ".lookup").read()
            == open(str(out) + ".lookup").read())


def test_maskbygff(tmp_path):
    out = tmp_path / "maskdb"
    misc_tools.maskbygff(
        _params([GOLDEN / "mask.gff", GOLDEN / "ndb", out],
                gff_type="exon"), None)
    _assert_db_equal(GOLDEN / "maskdb", out)
    _assert_db_equal(str(GOLDEN / "maskdb") + "_h", str(out) + "_h")


def test_registry_has_new_commands():
    from mmseqs2_tpu.registry import COMMANDS
    names = {c.name for c in COMMANDS}
    for n in ("translateaa", "extractalignedregion", "countkmer",
              "summarizeheaders", "recoverlongestorf", "maskbygff",
              "gff2db", "diffseqdbs", "clusthash", "compress",
              "decompress", "setextendeddbtype"):
        assert n in names
