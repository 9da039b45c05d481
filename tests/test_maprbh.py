"""map / rbh workflow parity vs reference goldens."""

import pathlib

import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "maprbh"


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


@pytest.mark.slow
def test_rbh_parity(tmp_path):
    out = str(tmp_path / "rbh")
    run_cmd("rbh", [str(G / "adb"), str(G / "bdb"), out,
                    str(tmp_path / "t")])
    assert entries(out) == entries(G / "refrbh2")


@pytest.mark.slow
def test_map_parity(tmp_path):
    out = str(tmp_path / "map")
    run_cmd("map", [str(G / "adb"), str(G / "bdb"), out,
                    str(tmp_path / "t")])
    assert entries(out) == entries(G / "refmap")
