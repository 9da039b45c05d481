"""enrich workflow test.

No reference golden: upstream `enrich` is bit-rotted (MMseqsBase.cpp:1261
declares 4 positional args but Enrich.cpp reads par.db6 and enrich.sh
requires 6 — the shipped binary exits before running). We implement the
enrich.sh contract directly; this test checks the pipeline end-to-end on
a toy profile DB.
"""

import pathlib

import pytest

from mmseqs2_tpu.db import dbtype as dbt
from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def run_cmd(name, args):
    cmd = get_command(name)
    par = Params().parse([str(a) for a in args], cmd, cmd.min_db,
                         cmd.max_db)
    assert cmd.load()(par, cmd) == 0


@pytest.mark.slow
def test_enrich_workflow(tmp_path):
    # target profiles from the golden toy clustering
    prof = str(tmp_path / "prof")
    run_cmd("result2profile", [str(TOY / "qdb"), str(TOY / "qdb"),
                               str(TOY / "casclu"), prof, "--threads", "1"])
    # profile-member alignment DB (what real profile DBs ship as _aln)
    prof_aln = str(tmp_path / "prof_aln")
    run_cmd("align", [str(TOY / "qdb"), str(TOY / "qdb"),
                      str(TOY / "casclu"), prof_aln, "-a", "1",
                      "--threads", "1"])
    # query = 6 toy sequences
    keys = tmp_path / "keys"
    keys.write_text("".join(f"{i}\n" for i in range(6)))
    qsub = str(tmp_path / "qsub")
    run_cmd("createsubdb", [str(keys), str(TOY / "qdb"), qsub])
    out = str(tmp_path / "enriched")
    run_cmd("enrich", [qsub, str(TOY / "qdb"), prof, prof_aln,
                       out, str(tmp_path / "tmp"), "--threads", "1",
                       "--num-iterations", "2"])
    with DBReader(out) as r:
        assert r.base_type == dbt.DBTYPE_ALIGNMENT_RES
        assert r.size == 6
        # every query must at least hit itself (expanded through clusters)
        for k in range(6):
            data = r.get_data(r.get_id(k)).decode()
            hits = {int(l.split("\t")[0]) for l in data.strip().split("\n")
                    if l}
            assert k in hits, (k, data[:200])
