"""result2msa --allow-deletion byte parity vs reference goldens.

dqd/dtd: query with an 8-residue deletion vs two targets carrying inserts,
so the backtraces contain D runs and the deletion MSA genuinely differs
from the noDeletion one.  Goldens:
  result2msa dqd dtd daln out --msa-format-mode 2|5 --allow-deletion
(reference MultipleAlignment.cpp:46-198, result2msa.cpp:260)."""

import pathlib

import pytest

from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "msadel"


@pytest.mark.parametrize("mode,golden", [(2, "refdeld"), (5, "refdeld5")])
def test_allow_deletion(tmp_path, mode, golden):
    out = str(tmp_path / "msa")
    cmd = get_command("result2msa")
    par = Params().parse([str(G / "dqd"), str(G / "dtd"), str(G / "daln"),
                          out, "--msa-format-mode", str(mode),
                          "--allow-deletion", "--threads", "1"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    assert open(out, "rb").read() == (G / golden).read_bytes()
