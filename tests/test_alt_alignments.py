"""align --alt-ali byte parity vs a reference golden.

The target carries two copies of the query domain separated by a GS linker;
with --alt-ali 2 the reference emits the primary hit plus two alternative
alignments found by X-masking the aligned target region and realigning
(Alignment.cpp:569-601).  Golden produced with
/tmp/refbuild/src/mmseqs align qd td pf out -a --alt-ali 2 --threads 1 -e 1e5.
"""

import pathlib

from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "alt"


def test_alt_alignments(tmp_path):
    out = str(tmp_path / "aln")
    cmd = get_command("align")
    par = Params().parse([str(G / "qd"), str(G / "td"), str(G / "pf"), out,
                          "-a", "--alt-ali", "2", "--threads", "1",
                          "-e", "1e5"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    assert open(out, "rb").read() == (G / "refalt2").read_bytes()


def test_corr_score_weight(tmp_path):
    """--corr-score-weight adds the neighbour-column score correlation
    bonus to the raw score before bit score / E-value
    (StripedSmithWaterman.cpp:1249-1253,1338-1362).  Golden:
    align q8 toy/qdb prefsub out -a --corr-score-weight 0.1 -e 10."""
    from mmseqs2_tpu.db.reader import DBReader
    TOY = pathlib.Path(__file__).parent / "golden" / "toy"
    out = str(tmp_path / "aln")
    cmd = get_command("align")
    par = Params().parse([str(G / "q8"), str(TOY / "qdb"),
                          str(G / "prefsub"), out,
                          "-a", "--corr-score-weight", "0.1",
                          "--threads", "1", "-e", "10"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    a, b = DBReader(out), DBReader(str(G / "refcorr"))
    assert a.size == b.size
    for i in range(b.size):
        k = b.get_db_key(i)
        assert a.get_data(a.get_id(k)) == b.get_data(b.get_id(k))
