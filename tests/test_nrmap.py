"""nrtotaxmapping parity vs reference golden (tests/golden/nrmap)."""

import pathlib
import shutil

from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "nrmap"


def test_nrtotaxmapping_parity(tmp_path):
    for f in G.iterdir():
        shutil.copy(f, tmp_path / f.name)
    out = str(tmp_path / "map.tsv")
    cmd = get_command("nrtotaxmapping")
    par = Params().parse([str(tmp_path / "acc2taxid"),
                          str(tmp_path / "nrdb"), out, "--threads", "1"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    assert open(out).read() == (G / "refmap.tsv").read_text()
