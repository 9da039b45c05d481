"""offsetalignment --merge-query 0 and --chain-alignments byte parity vs
reference goldens (offsetalignment.cpp:20-81,402-467).

Fixtures: cdb = nucleotide contigs, orfn = extracted ORFs, orfaln =
translated-ORF vs protein search results.  --merge-query 0 keeps per-ORF
entries keyed by the contig (duplicate index keys, a reference quirk);
--chain-alignments merges same-diagonal overlapping hits into regions.
"""

import pathlib

import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "offa"
TL = pathlib.Path(__file__).parent / "golden" / "tl"


@pytest.mark.parametrize("extra,golden", [
    ([], "refoff"),
    (["--merge-query", "0"], "refoff_nm"),
    (["--chain-alignments", "1"], "refoff_ch"),
])
def test_offsetalignment_modes(tmp_path, extra, golden):
    out = str(tmp_path / "off")
    cmd = get_command("offsetalignment")
    par = Params().parse([str(G / "cdb"), str(G / "orfn"),
                          str(TL / "tdb"), str(TL / "tdb"),
                          str(G / "orfaln"), out, "--threads", "1"] + extra,
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    a, b = DBReader(out), DBReader(str(G / golden))
    got = sorted((a.get_db_key(i), a.get_data(i)) for i in range(a.size))
    want = sorted((b.get_db_key(i), b.get_data(i)) for i in range(b.size))
    assert got == want
