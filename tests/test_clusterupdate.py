"""clusterupdate workflow parity vs reference goldens.

Golden scenario (tests/golden/cu): old DB = toy records 0-39, new DB =
records 5-54 (5 removed, 15 added). Reference ran
  mmseqs cluster olddb oldclu tmpc --linclust-version 1
  mmseqs clusterupdate olddb newdb oldclu newmapdb newclu tmpu \
      --linclust-version 1
(reference data/workflow/update_clustering.sh,
 src/workflow/ClusterUpdate.cpp).
"""

import pathlib

import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "cu"


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
def test_clusterupdate_parity(tmp_path):
    newmap = str(tmp_path / "newmapdb")
    newclu = str(tmp_path / "newclu")
    run_cmd("clusterupdate",
            [str(G / "olddb"), str(G / "newdb"), str(G / "oldclu"),
             newmap, newclu, str(tmp_path / "tmp"),
             "--threads", "1", "--linclust-version", "1"])
    assert entries(newclu) == entries(G / "newclu")
    assert entries(newmap) == entries(G / "newmapdb")
