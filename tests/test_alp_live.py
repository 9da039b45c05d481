"""Custom-matrix E-value statistics: the live ALP fallback must produce
exact Gumbel parameters (no gapless approximation, no warning) for
user-supplied matrix files (VERDICT r2 next-8).

Runs the reference's ALP Monte-Carlo estimation via the compile-once
native helper (native/alp_harvest.cpp) — skipped when the ALP library
sources are unavailable."""

import os
import re
import warnings

import pytest

ALP_SRC = os.environ.get("MMSEQS2_TPU_ALP_SRC", "/root/reference/lib/alp")


def _custom_matrix(tmp_path, name, bump):
    from mmseqs2_tpu.data.matrices_data import MATRICES
    out, bumped = [], False
    for ln in MATRICES["blosum62.out"].splitlines():
        if not bumped and re.match(r"^[A-Z]\s", ln):
            parts = ln.split()
            parts[3] = str(float(parts[3]) + bump)
            bumped = True
            ln = parts[0] + " " + " ".join(parts[1:])
        out.append(ln)
    p = tmp_path / name
    p.write_text("\n".join(out) + "\n")
    return str(p)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(ALP_SRC),
                    reason="ALP library sources unavailable")
@pytest.mark.parametrize("bump", [0.7, -1.3])
def test_custom_matrix_exact_gumbel(tmp_path, bump):
    from mmseqs2_tpu.data.submat import get_submat
    from mmseqs2_tpu.ops.evalue import EvalueComputation

    mat = _custom_matrix(tmp_path, f"custom_{bump}.out", bump)
    m = get_submat(mat, 2.0, 0.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ev = EvalueComputation(1_000_000, m, 11, 1)
    assert not w, [str(x.message) for x in w]
    # sane gapped Gumbel parameters, not the gapless fallback shape
    # (the fallback has b/beta/tau == 0 exactly)
    assert 0.05 < ev.lambda_ < 1.0
    assert ev.K > 0
    assert ev.b_I != 0.0 or ev.beta_I != 0.0

    # deterministic across constructions (disk cache + ALP seed 42)
    ev2 = EvalueComputation(1_000_000, m, 11, 1)
    assert (ev2.lambda_, ev2.K, ev2.a_I, ev2.beta_J) == \
        (ev.lambda_, ev.K, ev.a_I, ev.beta_J)
