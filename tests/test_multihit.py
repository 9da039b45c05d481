"""Multihit aggregation parity vs reference goldens (synthetic set DBs)."""

import pathlib

import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "multihit"


def run_cmd(name, args):
    cmd = get_command(name)
    par = Params().parse(args, cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0


def entries(db):
    out = {}
    with DBReader(str(db)) as r:
        for i in range(r.size):
            out[r.get_db_key(i)] = r.get_data(i)
    return out


@pytest.mark.parametrize("args,gold", [
    ([], "bhps"), (["--simple-best-hit", "0"], "bhps_nonsimple")])
def test_besthitperset_parity(tmp_path, args, gold):
    out = str(tmp_path / "o")
    run_cmd("besthitperset", [str(G / "qdb"), str(G / "tdb"),
                              str(G / "res"), out] + args)
    assert entries(out) == entries(G / gold)


def test_mergeresultsbyset_parity(tmp_path):
    out = str(tmp_path / "o")
    run_cmd("mergeresultsbyset", [str(G / "qdb_set_to_member"),
                                  str(G / "bhps"), out])
    assert entries(out) == entries(G / "merged")


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_combinepvalperset_parity(tmp_path, mode):
    out = str(tmp_path / "o")
    run_cmd("combinepvalperset", [str(G / "qdb"), str(G / "tdb"),
                                  str(G / "merged"), out,
                                  "--aggregation-mode", str(mode)])
    assert entries(out) == entries(G / f"comb{mode}")


WF = G / "wf"


@pytest.mark.slow
def test_multihit_workflows_parity(tmp_path):
    """multihitdb + multihitsearch end-to-end vs reference goldens."""
    db = str(tmp_path / "mydb")
    run_cmd("multihitdb", [str(WF / "contigs.fasta"), db,
                           str(tmp_path / "t1")])
    for suffix in ("", "_member_to_set", "_set_to_member", "_set_size"):
        assert entries(db + suffix) == entries(
            str(WF / ("refdb" + suffix))), suffix
    out = str(tmp_path / "out")
    run_cmd("multihitsearch", [db, db, out, str(tmp_path / "t2")])
    assert entries(out) == entries(str(WF / "refout"))
