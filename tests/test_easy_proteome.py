"""easy-proteomecluster / easy-proteomesearch end-to-end tests."""

import pathlib

import pytest

from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def run_cmd(name, args):
    cmd = get_command(name)
    par = Params().parse([str(a) for a in args], cmd, cmd.min_db,
                         cmd.max_db)
    assert cmd.load()(par, cmd) == 0


def _proteome_fastas(tmp_path):
    txt = (TOY / "QUERY.fasta").read_text()
    recs = [">" + r for r in txt.split(">") if r.strip()][:25]
    a = tmp_path / "protA.fasta"
    b = tmp_path / "protB.fasta"
    a.write_text("".join(recs[0:15]))
    b.write_text("".join(recs[5:25]))
    return a, b


@pytest.mark.slow
def test_easy_proteomecluster(tmp_path):
    a, b = _proteome_fastas(tmp_path)
    out = str(tmp_path / "res")
    run_cmd("easy-proteomecluster",
            [str(a), str(b), out, str(tmp_path / "tmp"), "--threads", "1",
             "--linclust-version", "1"])
    prot = (tmp_path / "res_protein_cluster.tsv").read_text()
    count = (tmp_path / "res_cluster_count.tsv").read_text()
    pcl = (tmp_path / "res_proteome_cluster.tsv").read_text()
    assert prot and count and pcl
    assert "%" in count


@pytest.mark.slow
def test_easy_proteomesearch(tmp_path):
    a, b = _proteome_fastas(tmp_path)
    out = str(tmp_path / "res")
    run_cmd("easy-proteomesearch",
            [str(a), str(b), out, str(tmp_path / "tmp"), "--threads", "1"])
    tsv = (tmp_path / "res.tsv").read_text()
    m8 = (tmp_path / "res_search.m8").read_text()
    assert tsv and m8
