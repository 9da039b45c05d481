"""align2clust tests.

The reference's align2clust depends on the rust block-aligner, which is
stubbed out of the patched reference build (tests/golden/README.md), so no
binary golden exists; these tests pin the command's clustering semantics:
duplicates merge into one cluster, unrelated sequences stay singletons,
every input is assigned exactly once, and the --include-align-files output
carries records for every non-rep member.
"""

import pathlib

import numpy as np
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


@pytest.fixture(scope="module")
def dup_db(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("a2c")
    txt = (TOY / "QUERY.fasta").read_text()
    recs = [">" + r for r in txt.split(">") if r.strip()][:6]
    out = []
    for i, r in enumerate(recs):
        head, _, body = r.partition("\n")
        out.append(f"{head}\n{body}")
        out.append(f"{head}_copy\n{body}")      # exact duplicate
    fasta = tmp / "dup.fasta"
    fasta.write_text("".join(out))
    db = str(tmp / "db")
    run_cmd("createdb", [str(fasta), db])
    pref = str(tmp / "pref")
    run_cmd("prefilter", [db, db, pref, "--add-self-matches", "1",
                          "--threads", "1", "-s", "4"])
    return db, pref


def clusters_of(path):
    out = {}
    with DBReader(path) as r:
        for i in range(r.size):
            mem = [int(x) for x in r.get_data(i).decode().split()]
            out[r.get_db_key(i)] = mem
    return out


def test_align2clust_duplicates(dup_db, tmp_path):
    db, pref = dup_db
    out = str(tmp_path / "clu")
    run_cmd("align2clust", [db, pref, out, "--min-seq-id", "0.9",
                            "-c", "0.8", "--threads", "1"])
    clus = clusters_of(out)
    # every sequence assigned exactly once
    all_members = [m for v in clus.values() for m in v]
    assert sorted(all_members) == list(range(12))
    # each duplicate pair (2i, 2i+1 by createdb order of the fasta) together
    with DBReader(db + "_h") as h:
        name = {h.get_db_key(i): h.get_data(i).decode().split()[0]
                for i in range(h.size)}
    owner = {}
    for rep, mem in clus.items():
        for m in mem:
            owner[m] = rep
    for k, nm in name.items():
        base = nm.replace("_copy", "")
        twin = [k2 for k2, n2 in name.items()
                if n2.replace("_copy", "") == base and k2 != k]
        assert twin and owner[k] == owner[twin[0]], (nm, owner)


def test_align2clust_aln_output(dup_db, tmp_path):
    db, pref = dup_db
    out = str(tmp_path / "clu")
    run_cmd("align2clust", [db, pref, out, "--min-seq-id", "0.9",
                            "-c", "0.8", "--threads", "1",
                            "--include-align-files", "1", "-a", "1",
                            "--alignment-mode", "3"])
    clus = clusters_of(out)
    with DBReader(out + "_aln") as a:
        for i in range(a.size):
            rep = a.get_db_key(i)
            keys = set()
            for line in a.get_data(i).decode().strip().split("\n"):
                if not line:
                    continue
                parts = line.split("\t")
                keys.add(int(parts[0]))
                assert parts[-1].endswith("M")     # cigar present
            assert set(clus[rep]) <= keys | {rep}
