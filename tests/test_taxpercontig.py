"""Contig-level taxonomy (taxpercontig.sh) byte parity vs reference.

cdb = 3 synthetic nucleotide contigs, each carrying two reverse-translated
proteins from golden/tl/tdb (a tax-annotated protein DB).  Goldens from
/tmp/refbuild/src/mmseqs taxonomy cdb tl/tdb out tmp --threads 1
[--tax-output-mode 2].  Covers extractorfs --translate, the non-selective
ORF prefilter + recoverlongestorf, per-ORF taxonomy, and
aggregatetaxweights / top-hit merge (Taxonomy.cpp:103-137)."""

import pathlib

from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "tpc"
TL = pathlib.Path(__file__).parent / "golden" / "tl"


def test_taxpercontig(tmp_path):
    out = str(tmp_path / "tax")
    cmd = get_command("taxonomy")
    par = Params().parse([str(G / "cdb"), str(TL / "tdb"), out,
                          str(tmp_path / "tmp"), "--threads", "1",
                          "--tax-output-mode", "2"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    assert open(out, "rb").read() == (G / "reftax").read_bytes()
    assert open(out + "_aln", "rb").read() == \
        (G / "reftax2_aln").read_bytes()
