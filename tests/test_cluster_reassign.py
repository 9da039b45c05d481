"""cluster --cluster-reassign byte parity vs reference golden.

Golden: /tmp/refbuild/src/mmseqs cluster toy/qdb out tmp --cluster-reassign
--cluster-version 1 --linclust-version 1 --threads 1 (the reassignment
genuinely moves members: the output differs from the non-reassign run).
Reference data/workflow/cascaded_clustering.sh:161-283.
"""

import pathlib

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "reassign"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def test_cluster_reassign(tmp_path):
    out = str(tmp_path / "clu")
    cmd = get_command("cluster")
    par = Params().parse([str(TOY / "qdb"), out, str(tmp_path / "tmp"),
                          "--cluster-reassign", "--cluster-version", "1",
                          "--linclust-version", "1", "--threads", "1"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    a, b = DBReader(out), DBReader(str(G / "refclu"))
    assert a.size == b.size
    for i in range(b.size):
        k = b.get_db_key(i)
        assert a.get_data(a.get_id(k)) == b.get_data(b.get_id(k))
