"""result2profile --profile-output-mode 1 (plain-text probabilities)
byte parity vs reference (result2profile.cpp:106-110,266-271;
PSSMCalculator.cpp:242-257)."""

import pathlib

from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "csf"
FM = pathlib.Path(__file__).parent / "golden" / "fm"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def test_profile_output_plain(tmp_path):
    out = str(tmp_path / "prof")
    cmd = get_command("result2profile")
    par = Params().parse([str(FM / "qsub"), str(TOY / "qdb"),
                          str(FM / "alnsub"), out,
                          "--profile-output-mode", "1", "--threads", "1"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    assert open(out, "rb").read() == (G / "refpp").read_bytes()
