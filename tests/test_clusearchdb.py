"""createclusearchdb invariants (byte parity vs the reference binary was
verified at development time on the toy goldens; here we pin the layout:
rep DB holds exactly the cluster representatives, the _seq DB is the
two-file [reps, members] layout resolving every cluster member, _clu is a
copy of the clustering)."""

import pathlib

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def test_createclusearchdb(tmp_path):
    out = str(tmp_path / "ccs")
    cmd = get_command("createclusearchdb")
    par = Params().parse([str(TOY / "qdb"), str(TOY / "casclu"), out],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    with DBReader(str(TOY / "casclu")) as clu, \
            DBReader(str(TOY / "qdb")) as qdb, \
            DBReader(out) as rep, DBReader(out + "_seq") as seq:
        reps = {clu.get_db_key(i) for i in range(clu.size)}
        assert {int(k) for k in rep.keys} == reps
        members = set()
        for i in range(clu.size):
            members |= {int(x) for x in clu.get_data(i).split()}
        assert {int(k) for k in seq.keys} == members
        for k in sorted(members)[:25]:
            assert seq.get_data(seq.get_id(k)) == qdb.get_data(qdb.get_id(k))
    with DBReader(out + "_clu") as c:
        assert c.size == clu.size
