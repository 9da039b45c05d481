"""Parity tests for pairaln against reference goldens in
tests/golden/pairaln (produced with /tmp/refbuild/src/mmseqs):

    createdb complex0.fasta complex1.fasta complex2.fasta pairq --shuffle 0
        (3 "complexes" x 3 chains from examples/QUERY.fasta entries 1-9)
    createdb QUERY.fasta tdb --shuffle 0; tdb_mapping: key -> 9600+(key%5)
    prefilter pairq tdb pref --threads 1; align pairq tdb pref aln -a
    pairaln pairq tdb aln ptop --threads 1
    pairaln ... ptopd   --pairing-dummy-mode 1
    pairaln ... pprox   --pairing-filter 1
    pairaln ... pprox2  --pairing-filter 1 --pairing-prox-dist 9e17
    pairaln ... pproxall2 --pairing-filter 1 --pairing-mode 1
                          --pairing-dummy-mode 1 --pairing-prox-dist 9e17
"""

import pathlib

import pytest

from mmseqs2_tpu.commands import align_extra
from mmseqs2_tpu.params import Params

G = pathlib.Path(__file__).parent / "golden" / "pairaln"


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


CASES = [
    ("ptop", {}),
    ("ptopd", {"pairdummymode": 1}),
    ("pprox", {"pairfilter": 1}),
    ("pprox2", {"pairfilter": 1,
                "pair_proximity_distance": 900000000000000000}),
    ("pproxall2", {"pairfilter": 1, "pairmode": 1, "pairdummymode": 1,
                   "pair_proximity_distance": 900000000000000000}),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[c[0] for c in CASES])
def test_pairaln(tmp_path, name, kw):
    out = tmp_path / name
    align_extra.pairaln(
        _params([G / "pairq", G / "tdb", G / "aln", out], **kw), None)
    _eq(G / name, out)


AX = pathlib.Path(__file__).parent / "golden" / "alignx"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"
NUCL = pathlib.Path(__file__).parent / "golden" / "nucl"


def test_alignbykmer_aa(tmp_path):
    """alignbykmer qdb qdb pref abk --threads 1 (reference golden)."""
    out = tmp_path / "abk"
    align_extra.alignbykmer(
        _params([TOY / "qdb", TOY / "qdb", TOY / "pref", out]), None)
    _eq(AX / "abk", out)


def test_alignbykmer_nucl(tmp_path):
    """alignbykmer ndb ndb nprefx nabk --threads 1 (reference golden)."""
    out = tmp_path / "nabk"
    align_extra.alignbykmer(
        _params([NUCL / "ndb", NUCL / "ndb", AX / "nprefx", out]), None)
    _eq(AX / "nabk", out)
