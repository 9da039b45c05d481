"""PSSM profile stack parity vs golden result2profile output."""

import pathlib

import numpy as np
import pytest

from mmseqs2_tpu.db import dbtype as dbt
from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.db.writer import DBWriter
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

GOLDEN = pathlib.Path(__file__).parent / "golden" / "toy"


def test_result2profile_parity(tmp_path):
    g = DBReader(str(GOLDEN / "aln"))
    sub = str(tmp_path / "alnsub")
    with DBWriter(sub, dbt.DBTYPE_ALIGNMENT_RES) as w:
        for k in range(25):
            w.write(k, g.get_data(g.get_id(k)))
    out = str(tmp_path / "prof")
    cmd = get_command("result2profile")
    par = Params().parse([str(GOLDEN / "qdb"), str(GOLDEN / "qdb"), sub, out],
                         cmd, 4, 4)
    assert cmd.load()(par, cmd) == 0
    mine = DBReader(out)
    gold = DBReader(str(GOLDEN / "profdb"))
    for k in range(25):
        a = mine.get_data(mine.get_id(k))
        b = gold.get_data(gold.get_id(k))
        assert a == b, f"profile {k} differs"
