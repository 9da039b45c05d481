"""convertblastdb parity vs reference goldens.

Goldens (tests/golden/blastdb) were produced by running the reference
binary's convertblastdb on synthetic BLAST v5 volumes (protein with
ASN.1 deflines covering textseq/swissprot/gi/Dbtag ids + taxid/PIG;
nucleotide with 2na packing and 32-bit ambiguity patch tables).
"""

import pathlib
import shutil

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "blastdb"


def run(tmp_path, vol_files, ref_base, out_name):
    for f in vol_files:
        shutil.copy(G / f, tmp_path / f)
    out = str(tmp_path / out_name)
    cmd = get_command("convertblastdb")
    par = Params().parse([str(tmp_path / vol_files[0].split(".")[0]), out],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    for suf in ("", "_h"):
        with DBReader(out + suf) as a, DBReader(str(G / (ref_base + suf))) as b:
            assert a.size == b.size
            for i in range(a.size):
                k = b.get_db_key(i)
                assert a.get_data(a.get_id(k)) == b.get_data(i)
    for suf in (".lookup", "_mapping"):
        assert (tmp_path / (out_name + suf)).read_text() == \
            (G / (ref_base + suf)).read_text()


def test_convertblastdb_protein(tmp_path):
    run(tmp_path, ["vol.pin", "vol.phr", "vol.psq"], "refout", "out")


def test_convertblastdb_nucleotide(tmp_path):
    run(tmp_path, ["nvol.nin", "nvol.nhr", "nvol.nsq"], "refn", "out")
