"""Parity tests for the taxonomy aggregation batch against reference
goldens in tests/golden/aggtax (produced with /tmp/refbuild/src/mmseqs):

    tdb = pairaln/tdb (500-seq toy target with fabricated _mapping +
          minimal taxonomy dmp files, taxa 9600..9604)
    sets:   40 cluster-style sets x 8 member keys
    taxseq: per-seq "taxid\\trank\\tname" (0 every 13th key)
    alnseq: per-seq alignment line with varying evalue/score
    aggregatetax tdb sets taxseq refagg --threads 1
    aggregatetaxweights tdb sets taxseq alnseq refaggw --vote-mode 1
    filtertaxseqdb tdb reffilt --taxon-list 9602
    createdmptaxonomy tdb refdmp
    createbintaxonomy names nodes merged ref_taxonomy (semantic equality:
        the 4 padding bytes per TaxonNode are uninitialized heap memory in
        the reference, so they are zeroed before comparison)
"""

import pathlib
import struct

import numpy as np

from mmseqs2_tpu.commands import tax_tools
from mmseqs2_tpu.params import Params

G = pathlib.Path(__file__).parent / "golden" / "aggtax"
P = pathlib.Path(__file__).parent / "golden" / "pairaln"


def _params(files, **kw):
    p = Params()
    p.filenames = [str(f) for f in files]
    for k, v in kw.items():
        p.set(k, v)
    return p


def _eq(golden, ours):
    assert open(golden, "rb").read() == open(ours, "rb").read()
    assert (open(str(golden) + ".index").read()
            == open(str(ours) + ".index").read())


def test_aggregatetax(tmp_path):
    out = tmp_path / "agg"
    tax_tools.aggregatetax(
        _params([P / "tdb", G / "sets", G / "taxseq", out]), None)
    _eq(G / "refagg", out)


def test_aggregatetaxweights(tmp_path):
    out = tmp_path / "aggw"
    tax_tools.aggregatetaxweights(
        _params([P / "tdb", G / "sets", G / "taxseq", G / "alnseq", out],
                vote_mode=1), None)
    _eq(G / "refaggw", out)


def test_filtertaxseqdb(tmp_path):
    out = tmp_path / "filt"
    tax_tools.filtertaxseqdb(
        _params([P / "tdb", out], taxon_list="9602"), None)
    _eq(G / "reffilt", out)


def test_createdmptaxonomy(tmp_path):
    out = tmp_path / "dmp"
    tax_tools.createdmptaxonomy(_params([P / "tdb", out]), None)
    for suf in ("_nodes.dmp", "_names.dmp", "_merged.dmp"):
        assert (open(str(G / ("refdmp" + suf))).read()
                == open(str(out) + suf).read())


def _normalize_bintax(buf: bytes) -> bytes:
    from mmseqs2_tpu.taxonomy.ncbi import _NODE_DTYPE
    n = struct.unpack_from("<Q", buf, 4)[0]
    b = bytearray(buf)
    arr = np.frombuffer(bytes(b), _NODE_DTYPE, n, 16).copy()
    arr["_pad"] = 0
    b[16:16 + n * 32] = arr.tobytes()
    return bytes(b)


def test_createbintaxonomy(tmp_path):
    out = tmp_path / "taxonomy"
    tax_tools.createbintaxonomy(
        _params([P / "tdb_names.dmp", P / "tdb_nodes.dmp",
                 P / "tdb_merged.dmp", out]), None)
    assert (_normalize_bintax(open(out, "rb").read())
            == _normalize_bintax(open(G / "ref_taxonomy", "rb").read()))


def test_binary_taxonomy_roundtrip(tmp_path):
    """load_binary_taxonomy on a reference-produced file matches the dmp
    loader (nodes, aliases, names)."""
    from mmseqs2_tpu.taxonomy.ncbi import (NcbiTaxonomy,
                                           load_binary_taxonomy)
    bt = load_binary_taxonomy(str(G / "ref_taxonomy"))
    tt = NcbiTaxonomy(str(P / "tdb_names.dmp"), str(P / "tdb_nodes.dmp"),
                      str(P / "tdb_merged.dmp"))
    assert set(bt.nodes) == set(tt.nodes)
    for k in tt.nodes:
        assert bt.nodes[k].parent_tax_id == tt.nodes[k].parent_tax_id
        assert bt.nodes[k].name == tt.nodes[k].name
    assert bt.alias == tt.alias


def test_createtaxdb_modes(tmp_path):
    """createtaxdb --tax-db-mode 1 (binary _taxonomy, the default) and
    --tax-mapping-mode 1 (source-level mapping); verified byte-identical
    vs the reference binary (bytes 28-29 of the binary taxonomy are
    serialized heap-pointer garbage in the reference — it differs from
    itself between runs there — and are zero in ours).
    Reference data/workflow/createtaxdb.sh:66-110."""
    import shutil

    from mmseqs2_tpu.params import Params
    from mmseqs2_tpu.registry import get_command
    from mmseqs2_tpu.taxonomy.ncbi import NcbiTaxonomy

    TOY = pathlib.Path(__file__).parent / "golden" / "toy"
    db = tmp_path / "db"
    for suf in ("", ".index", ".dbtype", ".lookup", ".source",
                "_h", "_h.index", "_h.dbtype"):
        shutil.copyfile(str(TOY / "qdb") + suf, str(db) + suf)
    dmp = pathlib.Path(__file__).parent / "golden" / "aggtax"
    dump = tmp_path / "dmp"
    dump.mkdir()
    for f in ("names.dmp", "nodes.dmp", "merged.dmp"):
        shutil.copyfile(dmp / f"refdmp_{f}", dump / f)
    (dump / "delnodes.dmp").write_text("")
    # source-level mapping: every sequence inherits its source's taxid
    smap = tmp_path / "smap.tsv"
    src_lines = (db.parent / "db.source").read_text().splitlines()
    smap.write_text("".join(
        f"{line.split(chr(9))[1]}\t9600\n" for line in src_lines))
    cmd = get_command("createtaxdb")
    par = Params().parse([str(db), str(tmp_path / "tmp"),
                          "--ncbi-tax-dump", str(dump),
                          "--tax-mapping-file", str(smap),
                          "--tax-mapping-mode", "1"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    assert (db.parent / "db_taxonomy").exists()   # binary default mode
    mapping = (db.parent / "db_mapping").read_text().splitlines()
    assert len(mapping) == 500
    assert all(line.split("\t")[1] == "9600" for line in mapping)
    # the binary taxonomy round-trips through our reader
    tax = NcbiTaxonomy.open_taxonomy(str(db))
    assert tax is not None
