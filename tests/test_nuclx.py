"""Parity tests for result2dnamsa / proteinaln2nucl against reference
goldens in tests/golden/nuclx (produced with /tmp/refbuild/src/mmseqs):

    search nucl/ndb nucl/ndb nres tmp --search-type 3 -a --threads 1
    result2dnamsa nucl/ndb nucl/ndb nres dnamsa --threads 1
    translatenucs nucl/ndb taa --threads 1
    ungappedprefilter taa taa upref && align taa taa upref paln -a
    palnf = paln minus hits starting at position 0 of '*'-initial targets
        (the reference aborts on those; keys 46, 55)
    proteinaln2nucl nucl/ndb nucl/ndb taa taa palnf pnucl --threads 1
"""

import pathlib

from mmseqs2_tpu.commands import nucl_tools
from mmseqs2_tpu.params import Params

GOLDEN = pathlib.Path(__file__).parent / "golden" / "nuclx"
NUCL = pathlib.Path(__file__).parent / "golden" / "nucl"


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


def test_result2dnamsa(tmp_path):
    out = tmp_path / "dnamsa"
    nucl_tools.result2dnamsa(_params(
        [NUCL / "ndb", NUCL / "ndb", GOLDEN / "nres", out]), None)
    _eq(GOLDEN / "dnamsa", out)


def test_proteinaln2nucl(tmp_path):
    out = tmp_path / "pnucl"
    nucl_tools.proteinaln2nucl(_params(
        [NUCL / "ndb", NUCL / "ndb", GOLDEN / "taa", GOLDEN / "taa",
         GOLDEN / "palnf", out]), None)
    _eq(GOLDEN / "pnucl", out)


def test_alignall(tmp_path):
    from mmseqs2_tpu.commands import align_extra
    TOY = pathlib.Path(__file__).parent / "golden" / "toy"
    AX = pathlib.Path(__file__).parent / "golden" / "alignx"
    out = tmp_path / "allaln"
    align_extra.alignall(_params([TOY / "qdb", TOY / "clu0", out],
                                 add_backtrace=True), None)
    _eq(AX / "allaln", out)


def test_transitivealign(tmp_path):
    from mmseqs2_tpu.commands import align_extra
    TOY = pathlib.Path(__file__).parent / "golden" / "toy"
    AX = pathlib.Path(__file__).parent / "golden" / "alignx"
    out = tmp_path / "transaln"
    align_extra.transitivealign(_params([TOY / "qdb", TOY / "aln", out]),
                                None)
    _eq(AX / "transaln", out)
