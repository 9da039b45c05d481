"""createtsv variants and translatenucs --add-orf-stop byte parity vs
reference goldens (createtsv.cpp:55-200, translatenucs.cpp:57-108).

Goldens generated with the reference binary on the toy qsub/alnsub
fixtures (fm/) and the taxpercontig ORF db (tpc/cdb -> orfn).
"""

import pathlib

import pytest

from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "ctsv"
FM = pathlib.Path(__file__).parent / "golden" / "fm"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def run_cmd(name, args):
    cmd = get_command(name)
    par = Params().parse([str(a) for a in args], cmd, cmd.min_db,
                         cmd.max_db)
    assert cmd.load()(par, cmd) == 0


@pytest.mark.parametrize("extra,golden", [
    ([], "reft_x"),
    (["--target-column", "0"], "reft_xtargetcolumn0"),
    (["--full-header"], "reft_xfullheader"),
    (["--first-seq-as-repr"], "reft_xfirstseqasrepr"),
])
def test_createtsv_modes(tmp_path, extra, golden):
    out = str(tmp_path / "out.tsv")
    run_cmd("createtsv", [FM / "qsub", TOY / "qdb", FM / "alnsub", out,
                          "--threads", "1"] + extra)
    assert open(out, "rb").read() == (G / golden).read_bytes()


def test_createtsv_three_arg(tmp_path):
    out = str(tmp_path / "out.tsv")
    run_cmd("createtsv", [FM / "qsub", FM / "alnsub", out, "--threads", "1"])
    assert open(out, "rb").read() == (G / "reft_3col").read_bytes()


def test_createtsv_db_output(tmp_path):
    out = str(tmp_path / "out")
    run_cmd("createtsv", [FM / "qsub", TOY / "qdb", FM / "alnsub", out,
                          "--db-output", "1", "--threads", "1"])
    assert open(out, "rb").read() == (G / "reft_db").read_bytes()
    assert open(out + ".index", "rb").read() == \
        (G / "reft_db.index").read_bytes()


def test_translatenucs_add_orf_stop(tmp_path):
    out = str(tmp_path / "aa")
    run_cmd("translatenucs", [G / "orfn", out, "--add-orf-stop",
                              "--threads", "1"])
    assert open(out, "rb").read() == (G / "reftr").read_bytes()
