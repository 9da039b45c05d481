"""--wrapped-scoring (circular end-start alignment) and reversed-hit
coordinate handling, byte parity vs reference goldens.

Fixtures: qd/td = rotated circular sequence pair (query S2+S1, target
S1+S2) with a handcrafted prefilter hit pf; qd2/td2 = a sequence vs its
reverse complement with a PREFILTER_REV_RES hit pr (negative score marks
reverse).  Goldens from /tmp/refbuild/src/mmseqs:
  align qd td pf refw -a --wrapped-scoring -e 1e5 --threads 1
  rescorediagonal qd td pf refwr --rescore-mode 2 -a --wrapped-scoring ...
  rescorediagonal qd2 td2 pr refr --rescore-mode 2 -a -e 1e5 --threads 1
(reference Alignment.cpp:107-118,332-338; BandedNucleotideAligner.cpp:
100-110,189-191; rescorediagonal.cpp:83-88,166-171,223-246,310-313).
"""

import pathlib

import pytest

from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

G = pathlib.Path(__file__).parent / "golden" / "wrap"


def _run(name, args):
    cmd = get_command(name)
    par = Params().parse(args, cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0


@pytest.mark.parametrize("name,q,t,pref,golden,extra", [
    ("align", "qd", "td", "pf", "refw",
     ["-a", "--wrapped-scoring"]),
    ("rescorediagonal", "qd", "td", "pf", "refwr",
     ["--rescore-mode", "2", "-a", "--wrapped-scoring"]),
    ("rescorediagonal", "qd2", "td2", "pr", "refr",
     ["--rescore-mode", "2", "-a"]),
])
def test_wrapped_and_reverse(tmp_path, name, q, t, pref, golden, extra):
    out = str(tmp_path / "out")
    _run(name, [str(G / q), str(G / t), str(G / pref), out,
                "-e", "1e5", "--threads", "1"] + extra)
    assert open(out, "rb").read() == (G / golden).read_bytes()
