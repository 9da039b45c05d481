"""databases catalog tests (zero-egress: mirror-based build)."""

import pathlib

from mmseqs2_tpu.commands.databases_cmd import CATALOG, list_catalog
from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def test_catalog_listing():
    text = list_catalog()
    assert "UniRef50" in text and "Taxonomy" in text
    assert len(CATALOG) >= 20


def test_databases_mirror_build(tmp_path):
    mirror = tmp_path / "mirror" / "PDB"
    mirror.mkdir(parents=True)
    (mirror / "pdb.fasta").write_text((TOY / "QUERY.fasta").read_text())
    cmd = get_command("databases")
    out = str(tmp_path / "pdbdb")
    par = Params().parse(["PDB", out, str(tmp_path / "tmp"),
                          "--db-mirror", str(tmp_path / "mirror")],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    with DBReader(out) as r:
        assert r.size == 500
