"""rescorediagonal --rescore-mode 4 (WINDOW_QUALITY) parity vs reference.

Golden: `rescorediagonal qdb qdb pref refwq --rescore-mode 4 -a` on the toy
self-search prefilter result."""

import pathlib

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "wq"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def test_window_quality_parity(tmp_path):
    out = str(tmp_path / "wq")
    cmd = get_command("rescorediagonal")
    par = Params().parse([str(TOY / "qdb"), str(TOY / "qdb"),
                          str(TOY / "pref"), out, "--rescore-mode", "4",
                          "-a", "1", "--threads", "1"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    with DBReader(out) as a, DBReader(str(G / "refwq")) as b:
        assert a.size == b.size
        for i in range(b.size):
            k = b.get_db_key(i)
            assert a.get_data(a.get_id(k)) == b.get_data(i), k
