"""Weighted linclust (SequenceWeights) parity vs reference golden.

Golden: `kmermatcher toy/qdb refw --linclust-version 1 --weights w.tsv`
(weight 1.0 for every 7th key, 0.1 otherwise). Pins swapCenterSequence
(highest-weight group member becomes the representative) and the
--cluster-weight-threshold member-skip semantics."""

import pathlib

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "wkm"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def test_weighted_kmermatcher_parity(tmp_path):
    out = str(tmp_path / "km")
    cmd = get_command("kmermatcher")
    par = Params().parse([str(TOY / "qdb"), out, "--threads", "1",
                          "--linclust-version", "1",
                          "--weights", str(G / "w.tsv")],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    with DBReader(out) as a, DBReader(str(G / "refw")) as b:
        assert a.size == b.size
        for i in range(b.size):
            k = b.get_db_key(i)
            assert a.get_data(a.get_id(k)) == b.get_data(i), k


def test_kmermatcher_split_invariance(tmp_path):
    """--split-memory-limit hash-range splits must not change output."""
    cmd = get_command("kmermatcher")
    outs = []
    for name, extra in (("plain", []),
                        ("split", ["--split-memory-limit", "200K"])):
        out = str(tmp_path / name)
        par = Params().parse([str(TOY / "qdb"), out, "--threads", "1",
                              "--linclust-version", "1"] + extra,
                             cmd, cmd.min_db, cmd.max_db)
        assert cmd.load()(par, cmd) == 0
        outs.append(out)
    with DBReader(outs[0]) as a, DBReader(outs[1]) as b:
        assert a.size == b.size
        for i in range(b.size):
            k = b.get_db_key(i)
            assert a.get_data(a.get_id(k)) == b.get_data(i), k
