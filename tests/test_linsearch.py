"""linsearch subsystem parity vs reference golden."""

import pathlib

import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "linsearch"


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


def test_linsearch_parity(tmp_path):
    import shutil
    tdb = str(tmp_path / "bdb")
    for s in ("", ".index", ".dbtype", "_h", "_h.index", "_h.dbtype"):
        src = G / ("bdb" + s)
        if src.exists():
            shutil.copy(src, tdb + s)
    out = str(tmp_path / "lin")
    run_cmd("linsearch", [str(G / "adb"), tdb, out, str(tmp_path / "t")])
    assert entries(out) == entries(G / "reflin")


def test_kmerindexdb_roundtrip(tmp_path):
    from mmseqs2_tpu.commands.linsearch import load_linidx
    idx = str(tmp_path / "idx")
    run_cmd("kmerindexdb", [str(G / "bdb"), idx])
    meta, kmer, sid, pos, slen = load_linidx(idx)
    assert meta["n_entries"] == len(kmer) > 0
    # one entry per distinct kmer, ascending
    import numpy as np
    assert np.all(kmer[1:] > kmer[:-1])
