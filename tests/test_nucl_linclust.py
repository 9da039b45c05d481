"""Nucleotide linclust parity vs reference goldens (tests/golden/nlc).

Goldens: `kmermatcher ndb refkm1 --linclust-version 1` and
`linclust ndb refclu --linclust-version 1` from the reference binary on
tests/golden/nucl/ndb (61 nucleotide sequences). Exercises the
reverse-complement canonical k-mer path, the PREFILTER_REV_RES negative
score convention through rescorediagonal/align, and the Linclust.cpp:129
nucleotide rescore-skip.
"""

import pathlib

import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "nlc"
NDB = pathlib.Path(__file__).parent / "golden" / "nucl" / "ndb"


def run_cmd(name, args):
    cmd = get_command(name)
    par = Params().parse([str(a) for a in args], cmd, cmd.min_db,
                         cmd.max_db)
    assert cmd.load()(par, cmd) == 0


def assert_db_equal(ours, want):
    with DBReader(str(ours)) as a, DBReader(str(want)) as b:
        assert a.size == b.size
        for i in range(b.size):
            k = b.get_db_key(i)
            assert a.get_data(a.get_id(k)) == b.get_data(i), k


def test_kmermatcher_nucl_parity(tmp_path):
    out = str(tmp_path / "km")
    run_cmd("kmermatcher", [str(NDB), out, "--threads", "1",
                            "--linclust-version", "1"])
    assert_db_equal(out, G / "refkm1")


@pytest.mark.slow
def test_linclust_nucl_parity(tmp_path):
    out = str(tmp_path / "clu")
    run_cmd("linclust", [str(NDB), out, str(tmp_path / "tmp"),
                         "--threads", "1", "--linclust-version", "1"])
    assert_db_equal(out, G / "refclu")


def test_kmermatcher_adjust_kmer_len_parity(tmp_path):
    """--adjust-kmer-len (MarkovKmerScore windows) parity vs reference."""
    out = str(tmp_path / "km")
    run_cmd("kmermatcher", [str(NDB), out, "--threads", "1",
                            "--linclust-version", "1",
                            "--adjust-kmer-len", "1"])
    assert_db_equal(out, G / "refadj")
