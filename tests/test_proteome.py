"""Proteome clustering suite parity + workflow tests.

Goldens (tests/golden/proteome) from the reference binary:
  proteomecluster pdb clu refaln refcount refprot --threads 1
  parseproteomealignments pdb pdb alnclu refpa --threads 1
on a 3-proteome toy (protA=toy recs 0-14, protB=5-19, protC=20-29).
"""

import pathlib

import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "proteome"


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


@pytest.mark.slow
def test_proteomecluster_parity(tmp_path):
    out = str(tmp_path / "aln")
    run_cmd("proteomecluster",
            [str(G / "pdb"), str(G / "clu"), out,
             str(tmp_path / "count"), str(tmp_path / "prot"),
             "--threads", "1"])
    assert_db_equal(out, G / "refaln")
    assert_db_equal(str(tmp_path / "count"), G / "refcount")


def test_parseproteomealignments_parity(tmp_path):
    out = str(tmp_path / "pa")
    run_cmd("parseproteomealignments",
            [str(G / "pdb"), str(G / "pdb"), str(G / "alnclu"), out,
             "--threads", "1"])
    assert_db_equal(out, G / "refpa")


@pytest.mark.slow
def test_pickconsensusrep(tmp_path):
    out = str(tmp_path / "newclu")
    run_cmd("pickconsensusrep",
            [str(G / "pdb"), str(G / "clu"), out, str(tmp_path / "tmp"),
             "--threads", "1"])
    with DBReader(out) as a, DBReader(str(G / "clu")) as b:
        assert a.size == b.size
        # every original member is still covered exactly once
        orig = set()
        for i in range(b.size):
            orig |= {int(x) for x in b.get_data(i).split()}
        new = []
        for i in range(a.size):
            mem = [int(x) for x in a.get_data(i).split()]
            assert mem[0] == a.get_db_key(i)   # rep first
            new.extend(mem)
        assert set(new) == orig


@pytest.mark.slow
def test_pickrepprofile(tmp_path):
    out = str(tmp_path / "repmap")
    run_cmd("pickrepprofile",
            [str(G / "pdb"), str(G / "alnclu"), out, "--threads", "1"])
    with DBReader(out) as r, DBReader(str(G / "alnclu")) as aln:
        assert r.size == aln.size
        for i in range(r.size):
            parts = r.get_data(i).decode().split("\t")
            assert len(parts) == 4
