"""Out-of-core target-split prefilter: --split N output must be
byte-identical to the unsplit golden (stronger than the reference, whose
per-split thresholds make split output depend on split count)."""

import pathlib
import shutil

import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

GOLDEN = pathlib.Path(__file__).parent / "golden" / "toy"


def run_cmd(name, args):
    cmd = get_command(name)
    par = Params().parse(args, cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0


def entries_by_key(db_path):
    out = {}
    with DBReader(db_path) as r:
        for i in range(r.size):
            out[r.get_db_key(i)] = r.get_data(i)
    return out


@pytest.mark.parametrize("n_splits", [3])
def test_split_prefilter_matches_golden(tmp_path, n_splits):
    keys = list(range(8))
    with open(tmp_path / "keys", "w") as f:
        f.write("".join(f"{k}\n" for k in keys))
    run_cmd("createsubdb", [str(tmp_path / "keys"), str(GOLDEN / "qdb"),
                            str(tmp_path / "qsub")])
    run_cmd("createsubdb", [str(tmp_path / "keys"),
                            str(GOLDEN / "qdb") + "_h",
                            str(tmp_path / "qsub_h")])
    out = str(tmp_path / "pref")
    run_cmd("prefilter", [str(tmp_path / "qsub"), str(GOLDEN / "qdb"), out,
                          "--add-self-matches", "--split", str(n_splits),
                          "--split-mode", "0"])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / "pref"))
    for k in keys:
        assert got[k] == want[k], k
