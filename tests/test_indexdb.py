"""Prebuilt index (indexdb/createindex) round-trip + prefilter parity."""

import pathlib
import shutil

import numpy as np
import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

GOLDEN = pathlib.Path(__file__).parent / "golden" / "toy"


def run_cmd(name, args):
    cmd = get_command(name)
    par = Params().parse(args, cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0


def copy_db(src, dst):
    for suf in ("", ".index", ".dbtype", "_h", "_h.index", "_h.dbtype",
                ".lookup", ".source"):
        s = pathlib.Path(str(src) + suf)
        if s.exists():
            shutil.copy(s, str(dst) + suf)


def entries_by_key(db_path):
    out = {}
    with DBReader(db_path) as r:
        for i in range(r.size):
            out[r.get_db_key(i)] = r.get_data(i)
    return out


def test_index_roundtrip(tmp_path):
    from mmseqs2_tpu.prefilter.index_io import load_index
    db = tmp_path / "tdb"
    copy_db(GOLDEN / "qdb", db)
    run_cmd("indexdb", [str(db), str(db)])
    table, meta = load_index(str(db) + ".idx")
    assert meta["k"] == table.k == 6
    assert len(table.masked_seqs) == meta["n_seqs"] == 500
    assert len(table.entries_seq) == len(table.entries_pos)
    assert table.offsets[-1] == len(table.entries_seq)


@pytest.mark.slow
def test_prefilter_with_prebuilt_index_parity(tmp_path):
    """prefilter against <db>.idx must equal prefilter with a fresh build
    (both equal the reference golden)."""
    db = tmp_path / "tdb"
    copy_db(GOLDEN / "qdb", db)
    run_cmd("createindex", [str(db)])
    # subset of queries to keep runtime down
    keys = list(range(8))
    with open(tmp_path / "keys", "w") as f:
        f.write("".join(f"{k}\n" for k in keys))
    run_cmd("createsubdb", [str(tmp_path / "keys"), str(db),
                            str(tmp_path / "qsub")])
    run_cmd("createsubdb", [str(tmp_path / "keys"), str(db) + "_h",
                            str(tmp_path / "qsub_h")])
    out = str(tmp_path / "pref")
    run_cmd("prefilter", [str(tmp_path / "qsub"), str(db), out,
                          "--add-self-matches"])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / "pref"))
    for k in keys:
        assert got[k] == want[k], k
