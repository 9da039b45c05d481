"""convertalis --format-mode 1/2/3/4 byte parity vs reference goldens."""

import pathlib

import pytest

from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "fm"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"


@pytest.mark.parametrize("mode", [1, 2, 3, 4])
def test_convertalis_format_mode(tmp_path, mode):
    out = str(tmp_path / "out")
    cmd = get_command("convertalis")
    par = Params().parse([str(G / "qsub"), str(TOY / "qdb"),
                          str(G / "alnsub"), out,
                          "--format-mode", str(mode), "--threads", "1"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    assert open(out, "rb").read() == \
        (G / f"ref{mode}.out").read_bytes()


def test_convertalis_extra_output_codes(tmp_path):
    """ppos/qframe/tframe/qset/qsetid/empty columns byte parity."""
    out = str(tmp_path / "x")
    cmd = get_command("convertalis")
    par = Params().parse(
        [str(G / "qsub"), str(TOY / "qdb"), str(G / "alnsub"), out,
         "--format-output",
         "query,target,ppos,qframe,tframe,qset,qsetid,empty",
         "--threads", "1"], cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    assert open(out, "rb").read() == (G / "refx.out").read_bytes()


@pytest.mark.parametrize("mode", [3, 4, 6])
def test_result2msa_format_mode(tmp_path, mode):
    """result2msa --msa-format-mode 3 (FASTA+summary) / 4 (STOCKHOLM) / 6 (a3m+aln info)."""
    out = str(tmp_path / "msa")
    cmd = get_command("result2msa")
    par = Params().parse([str(G / "qsub"), str(TOY / "qdb"),
                          str(G / "alnsub"), out,
                          "--msa-format-mode", str(mode),
                          "--threads", "1"], cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    assert open(out, "rb").read() == \
        (G / f"refmsa{mode}").read_bytes()
