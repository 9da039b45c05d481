"""Parity tests for filterresult / filtera3m / msa2result against reference
goldens in tests/golden/msares (produced with /tmp/refbuild/src/mmseqs):

    filterresult toy/qdb toy/qdb toy/aln fres --threads 1
    filterresult toy/qdb toy/qdb toy/aln fres60 --max-seq-id 0.6 --threads 1
    result2msa toy/qdb toy/qdb toy/aln msa --threads 1
    filtera3m big.a3m bigfilt.a3m --max-seq-id 0.9 --diff 5
        (big.a3m = the 10-member entry of msa, key 99)
    msa2result msa m2r_seq m2r_res --match-mode 1 --threads 1
"""

import pathlib

from mmseqs2_tpu.commands import msa_tools, result2profile
from mmseqs2_tpu.params import Params

GOLDEN = pathlib.Path(__file__).parent / "golden" / "msares"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def _params(files, **kw):
    p = Params()
    p.filenames = [str(f) for f in files]
    for k, v in kw.items():
        p.set(k, v)
    return p


def _eq(golden, ours, index=True):
    assert open(golden, "rb").read() == open(ours, "rb").read()
    if index:
        assert (open(str(golden) + ".index").read()
                == open(str(ours) + ".index").read())


def test_filterresult(tmp_path):
    out = tmp_path / "fres"
    result2profile.filterresult(
        _params([TOY / "qdb", TOY / "qdb", TOY / "aln", out]), None)
    _eq(GOLDEN / "fres", out)


def test_filterresult_maxseqid(tmp_path):
    out = tmp_path / "fres60"
    result2profile.filterresult(
        _params([TOY / "qdb", TOY / "qdb", TOY / "aln", out],
                filter_max_seq_id=0.6), None)
    _eq(GOLDEN / "fres60", out)


def test_filtera3m(tmp_path):
    out = tmp_path / "filt.a3m"
    msa_tools.filtera3m(_params([GOLDEN / "big.a3m", out],
                                filter_max_seq_id=0.9, n_diff=5), None)
    _eq(GOLDEN / "bigfilt.a3m", out, index=False)


def test_msa2result(tmp_path):
    msa = tmp_path / "msa"
    msa_tools.result2msa(_params([TOY / "qdb", TOY / "qdb", TOY / "aln",
                                  msa]), None)
    seq_out = tmp_path / "m2r_seq"
    res_out = tmp_path / "m2r_res"
    msa_tools.msa2result(_params([msa, seq_out, res_out], match_mode=1),
                         None)
    _eq(GOLDEN / "m2r_res", res_out)
    _eq(GOLDEN / "m2r_seq", seq_out)
    _eq(GOLDEN / "m2r_seq_h", str(seq_out) + "_h")
