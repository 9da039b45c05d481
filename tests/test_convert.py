"""Parity tests for format converters against reference goldens in
tests/golden/convert (produced with /tmp/refbuild/src/mmseqs):

    convertmsa test.sto refmsa [--identifier-field 0 -> refmsa0]
    convertkb test.dat refkb            (all 17 columns + .lookup)
    convertprofiledb hhmdb refprof      (synthetic 2-entry HHM ffindex)
    appenddbtoindex toy/aln toy/upref refbase --id-list 509,519
        (base = copy of toy/clu0 + aln dbtype)
    tsv2exprofiledb exin refex          (4 TSV inputs)
"""

import pathlib
import shutil

from mmseqs2_tpu.commands import convert_tools
from mmseqs2_tpu.params import Params

G = pathlib.Path(__file__).parent / "golden" / "convert"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"


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


def test_convertmsa(tmp_path):
    out = tmp_path / "msa"
    convert_tools.convertmsa(_params([G / "test.sto", out]), None)
    _eq(G / "refmsa", out)


def test_convertmsa_id_field(tmp_path):
    out = tmp_path / "msa0"
    convert_tools.convertmsa(_params([G / "test.sto", out],
                                     identifier_field=0), None)
    _eq(G / "refmsa0", out)


def test_convertkb(tmp_path):
    out = tmp_path / "kb"
    convert_tools.convertkb(_params([G / "test.dat", out]), None)
    for col in convert_tools._KB_COLUMNS:
        _eq(G / f"refkb_{col}", f"{out}_{col}")
    assert (open(G / "refkb.lookup").read()
            == open(f"{out}.lookup").read())


def test_convertprofiledb(tmp_path):
    out = tmp_path / "prof"
    convert_tools.convertprofiledb(_params([G / "hhmdb", out]), None)
    _eq(G / "refprof", out)
    _eq(G / "refprof_h", f"{out}_h")
    assert (open(G / "refprof.dbtype", "rb").read()
            == open(f"{out}.dbtype", "rb").read())


def test_appenddbtoindex(tmp_path):
    base = tmp_path / "base"
    shutil.copy(TOY / "clu0", base)
    shutil.copy(TOY / "clu0.index", f"{base}.index")
    shutil.copy(TOY / "aln.dbtype", f"{base}.dbtype")
    convert_tools.appenddbtoindex(
        _params([TOY / "aln", TOY / "upref", base], id_list="509,519"),
        None)
    _eq(G / "refbase", base)


def test_tsv2exprofiledb(tmp_path):
    for suf in (".tsv", "_h.tsv", "_seq.tsv", "_aln.tsv"):
        shutil.copy(G / f"exin{suf}", tmp_path / f"exin{suf}")
    out = tmp_path / "ex"
    convert_tools.tsv2exprofiledb(
        _params([tmp_path / "exin", out]), None)
    for suf in ("", "_aln", "_seq", "_seq_h"):
        _eq(G / f"refex{suf}", f"{out}{suf}")
