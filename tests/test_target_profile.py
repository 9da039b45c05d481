"""Target-profile search (searchtargetprofile.sh path) parity."""

import pathlib

import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "tprofile"


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
def test_search_target_profile_parity(tmp_path):
    out = str(tmp_path / "out")
    run_cmd("search", [str(G / "qs"), str(G / "profdb"), out,
                       str(tmp_path / "t")])
    assert entries(out) == entries(G / "refout")
