"""masksequence --mask-n-repeat byte parity vs reference goldens.

Stages run sequentially on the numeric sequence (tantan substitutes X
before repeat detection), and applySoftmasking uppercases unmasked
positions (Masker.cpp:16-55,83-137).  Goldens:
  refx1 = masksequence md out --mask-n-repeat 3
  refx2 = masksequence md out --mask 0 --mask-n-repeat 3
"""

import pathlib

import pytest

from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "mask"


@pytest.mark.parametrize("args,golden", [
    (["--mask-n-repeat", "3"], "refx1"),
    (["--mask", "0", "--mask-n-repeat", "3"], "refx2"),
])
def test_mask_n_repeat(tmp_path, args, golden):
    out = str(tmp_path / "m")
    cmd = get_command("masksequence")
    par = Params().parse([str(G / "md"), out, "--threads", "1"] + args,
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    assert open(out, "rb").read() == (G / golden).read_bytes()
