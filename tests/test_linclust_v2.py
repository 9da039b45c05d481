"""linclust2 / cluster2 workflow semantics (reference-default modules).

The reference's align2clust depends on the stubbed-out rust block-aligner,
so no binary goldens exist; these tests pin the workflow invariants: every
input sequence is assigned exactly once, representatives belong to their
own cluster, and --switch-consensus-rep keeps a full assignment.
Reference data/workflow/linclust.sh:21-140,
data/workflow/cascaded_clustering.sh:50-107.
"""

import pathlib

import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def run_cmd(name, args):
    cmd = get_command(name)
    par = Params().parse([str(a) for a in args], cmd, cmd.min_db,
                         cmd.max_db)
    assert cmd.load()(par, cmd) == 0


def check_full_assignment(clu_path, n_source):
    clu = DBReader(clu_path)
    members = set()
    reps = set()
    total = 0
    for i in range(clu.size):
        reps.add(clu.get_db_key(i))
        for line in clu.get_data(i).split(b"\n"):
            if line:
                members.add(int(line.split(b"\t")[0]))
                total += 1
    assert total == n_source          # each sequence assigned exactly once
    assert len(members) == n_source
    assert reps <= members            # reps appear in their own cluster
    return clu.size


@pytest.mark.parametrize("extra", [
    [],
    ["--clust-hash", "1"],
    ["--switch-consensus-rep", "1"],
])
def test_linclust_v2(tmp_path, extra):
    out = str(tmp_path / "clu")
    run_cmd("linclust", [str(TOY / "qdb"), out, str(tmp_path / "tmp"),
                         "--threads", "1"] + extra)
    n = check_full_assignment(out, DBReader(str(TOY / "qdb")).size)
    assert n > 400  # the toy set is mostly non-redundant


def test_cluster_v2(tmp_path):
    out = str(tmp_path / "clu")
    run_cmd("cluster", [str(TOY / "qdb"), out, str(tmp_path / "tmp"),
                        "--cluster-version", "2", "--threads", "1"])
    check_full_assignment(out, DBReader(str(TOY / "qdb")).size)


def test_linclust_v2_aln_files(tmp_path):
    out = str(tmp_path / "clu")
    run_cmd("linclust", [str(TOY / "qdb"), out, str(tmp_path / "tmp"),
                         "--threads", "1", "--include-align-files", "1",
                         "-a"])
    aln = DBReader(out + "_aln")
    clu = DBReader(out)
    assert aln.size == clu.size
    # every non-rep member has an alignment record in its cluster's entry
    for i in range(clu.size):
        k = clu.get_db_key(i)
        members = [int(l.split(b"\t")[0])
                   for l in clu.get_data(i).split(b"\n") if l]
        targets = [int(l.split(b"\t")[0])
                   for l in aln.get_data(aln.get_id(k)).split(b"\n") if l]
        assert set(members) - {k} <= set(targets)
