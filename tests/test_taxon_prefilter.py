"""--taxon-list prefilter (QueryMatcherTaxonomyHook) parity vs reference.

Golden: `prefilter qsub tdb reftl --taxon-list 9602 -s 7.5` where tdb
carries a synthetic mapping (key i -> taxid 9600 + i%5)."""

import pathlib

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "tl"


def test_taxon_list_prefilter_parity(tmp_path):
    out = str(tmp_path / "p")
    cmd = get_command("prefilter")
    par = Params().parse([str(G / "qsub"), str(G / "tdb"), out,
                          "--taxon-list", "9602", "-s", "7.5",
                          "--threads", "1"], cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    with DBReader(out) as a, DBReader(str(G / "reftl")) as b:
        assert a.size == b.size
        for i in range(b.size):
            k = b.get_db_key(i)
            assert a.get_data(a.get_id(k)) == b.get_data(i), k
