"""search --exhaustive-search (sliced inverted target-profile search)
byte parity vs reference goldens.

Goldens produced with /tmp/refbuild/src/mmseqs search qsub it_profile_0
out tmp --exhaustive-search 1 [--exhaustive-search-filter 1] -a --threads 1
(reference data/workflow/searchslicedtargetprofile.sh).
"""

import pathlib

import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "sliced"
FM = pathlib.Path(__file__).parent / "golden" / "fm"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"


@pytest.mark.parametrize("filt,golden", [(0, "refout"), (1, "refout2")])
def test_exhaustive_search(tmp_path, filt, golden):
    out = str(tmp_path / "out")
    cmd = get_command("search")
    par = Params().parse([str(FM / "qsub"), str(TOY / "it_profile_0"), out,
                          str(tmp_path / "tmp"),
                          "--exhaustive-search", "1",
                          "--exhaustive-search-filter", str(filt),
                          "-a", "--threads", "1"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    a, b = DBReader(out), DBReader(str(G / golden))
    assert a.size == b.size
    for i in range(b.size):
        k = b.get_db_key(i)
        assert a.get_data(a.get_id(k)) == b.get_data(b.get_id(k))
