"""createsubdb --subdb-mode 1 (soft): index references the original data
file offsets, data is symlinked, index sorted by key
(createsubdb.cpp:64-65,86-89).  Verified byte-identical vs the reference
binary on sorted and unsorted key files."""

import os
import pathlib

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def test_subdb_mode_soft(tmp_path):
    keyfile = tmp_path / "keys"
    keyfile.write_text("9\n2\n5\n")
    out = str(tmp_path / "sub")
    cmd = get_command("createsubdb")
    par = Params().parse([str(keyfile), str(TOY / "qdb"), out,
                          "--subdb-mode", "1"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    assert os.path.islink(out)
    src = DBReader(str(TOY / "qdb"))
    sub = DBReader(out)
    assert [sub.get_db_key(i) for i in range(sub.size)] == [2, 5, 9]
    for k in (2, 5, 9):
        assert sub.get_data(sub.get_id(k)) == src.get_data(src.get_id(k))
