"""Batched ksw2 extension vs the per-pair oracle (VERDICT r2 next-7).

extz2_batch dispatches to the native OpenMP core (native/ksw2_batch.cpp,
compiled on first use) or the vectorized numpy fallback; both must be
bit-identical to align/ksw2.py::extz2 — scores, end positions, zdrop
bookkeeping, and cigars (including the banding/rounding quirks)."""

import numpy as np
import pytest

from mmseqs2_tpu.align import ksw2
from mmseqs2_tpu.align.ksw2 import (EXTZ_ONLY, SCORE_ONLY, extz2,
                                    extz2_batch)

MAT = [2, -3, -3, -3, 0, -3, 2, -3, -3, 0, -3, -3, 2, -3, 0,
       -3, -3, -3, 2, 0, 0, 0, 0, 0, 0]
FIELDS = ("max", "max_q", "max_t", "mqe", "mqe_t", "mte", "mte_q",
          "score", "zdropped")


def mkpairs(rng, n):
    pairs = []
    for sim in (0.99, 0.9, 0.75, 0.5, 0.3):
        for _ in range(n):
            ql = int(rng.integers(2, 400))
            tl = int(rng.integers(2, 400))
            t = rng.integers(0, 4, size=tl)
            q = (t[:ql].copy() if ql <= tl else
                 np.concatenate([t, rng.integers(0, 4, size=ql - tl)]))
            mut = rng.random(ql) < (1 - sim)
            q[mut] = rng.integers(0, 4, size=int(mut.sum()))
            pairs.append((q.astype(np.int64), t.astype(np.int64)))
    return pairs


@pytest.mark.parametrize("flag", [SCORE_ONLY | EXTZ_ONLY, EXTZ_ONLY, 0])
def test_batch_matches_oracle(flag):
    rng = np.random.default_rng(11)
    pairs = mkpairs(rng, 5)
    got = extz2_batch([p[0] for p in pairs], [p[1] for p in pairs],
                      MAT, 5, 4, 2, 64, 40, flag)
    for b, (q, t) in enumerate(pairs):
        ref = extz2(q, t, MAT, 5, 4, 2, 64, 40, flag)
        for f in FIELDS:
            assert getattr(got[b], f) == getattr(ref, f), (b, f)
        if not (flag & SCORE_ONLY):
            assert got[b].cigar == ref.cigar, b


def test_numpy_fallback_matches_oracle(monkeypatch):
    """The vectorized numpy path (used when g++ is unavailable)."""
    monkeypatch.setattr(ksw2, "_NATIVE", False)
    rng = np.random.default_rng(12)
    pairs = mkpairs(rng, 3)
    got = extz2_batch([p[0] for p in pairs], [p[1] for p in pairs],
                      MAT, 5, 4, 2, 64, 40, EXTZ_ONLY)
    for b, (q, t) in enumerate(pairs):
        ref = extz2(q, t, MAT, 5, 4, 2, 64, 40, EXTZ_ONLY)
        for f in FIELDS:
            assert getattr(got[b], f) == getattr(ref, f), (b, f)
        assert got[b].cigar == ref.cigar, b
