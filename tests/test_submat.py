import math

import numpy as np

from mmseqs2_tpu.data.submat import SubstitutionMatrix, get_submat
from mmseqs2_tpu.ops.evalue import EvalueComputation


def test_blosum62_integer_scores():
    m = get_submat("blosum62.out", 2.0, 0.0)
    i = m.aa2num
    # canonical BLOSUM62 half-bit integers
    assert m.sub_matrix[i["A"], i["A"]] == 4
    assert m.sub_matrix[i["W"], i["W"]] == 11
    assert m.sub_matrix[i["C"], i["C"]] == 9
    assert m.sub_matrix[i["A"], i["W"]] == -3
    assert m.sub_matrix[i["X"], i["X"]] == -1
    assert m.alphabet == "ACDEFGHIKLMNPQRSTVWYX"


def test_background_probs():
    m = get_submat("blosum62.out", 2.0, 0.0)
    # file background, rescaled by (1 - pX) then recomputed via row sums
    assert abs(m.pback[0] - 0.07422) < 1e-3
    assert m.pback[-1] == 1e-5
    assert abs(m.pback[:-1].sum() - 1.0) < 1e-2


def test_seed_matrix_8bit():
    m = get_submat("VTML80.out", 8.0, 0.0)
    assert m.sub_matrix[m.aa2num["A"], m.aa2num["A"]] == 20


def test_encode_ambiguity():
    m = get_submat("blosum62.out", 2.0, 0.0)
    enc = m.encode(b"AJZBuO*")
    i = m.aa2num
    assert list(enc) == [i["A"], i["L"], i["E"], i["D"], i["X"], i["X"], i["X"]]


def test_evalue_matches_alp():
    """Golden values computed with the reference ALP library
    (lib/alp/sls_alignment_evaluer.cpp) for blosum62 gap 11/1,
    dbResCount=76543."""
    m = get_submat("blosum62.out", 2.0, 0.0)
    ev = EvalueComputation(76543, m, 11, 1)
    golden = {
        (20.0, 57.0): (3450826.890616009, 647.16350457574777),
        (50.0, 334.0): (20977656.597732119, 1.0719543548509212),
        (100.0, 1000.0): (65753181.378777556, 3.8478389454578763e-06),
        (255.0, 57.0): (72.230763030910936, 1.6164146608835165e-30),
        (1000.0, 334.0): (6.2282786312764104e-07, 4.1833331073757073e-127),
    }
    for (score, qlen), (area, evalue) in golden.items():
        assert math.isclose(ev.area(score, qlen), area, rel_tol=1e-14)
        assert math.isclose(ev.compute_evalue(score, qlen), evalue, rel_tol=1e-14)
    assert math.isclose(ev.compute_bit_score(255.0), 105.13958701036157,
                        rel_tol=1e-14)


def test_lambda_estimation():
    # PAM150 has no precomputed lambda; estimation must produce a sane value
    m = SubstitutionMatrix("PAM150.out", 2.0, 0.0)
    assert 0.1 < m.lambda_file < 1.0
