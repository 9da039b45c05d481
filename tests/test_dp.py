"""Kernel-level golden tests for the DP cores (gapless scan, SW, banded).

Modeled on the reference's TestDiagonalScoring/TestAlignment style: small
random instances cross-checked against independent naive implementations.
"""

import numpy as np
import pytest

from mmseqs2_tpu.ops import dp
from mmseqs2_tpu.ops.banded import banded_align

rng = np.random.default_rng(42)


def random_case(nq=3, b=8, lq=24, lt=40, alpha=21):
    # blosum-like random scores: mostly negative, positive diagonal
    mats = []
    profs = []
    for _ in range(nq):
        m = rng.integers(-4, 3, size=(alpha, alpha))
        m = ((m + m.T) // 2).astype(np.int32)
        np.fill_diagonal(m, rng.integers(4, 12, size=alpha))
        seq = rng.integers(0, alpha, size=lq)
        prof = m[seq, :].T.astype(np.int32)   # (alpha, lq)
        profs.append(prof)
    profiles = np.stack(profs)                # (nq, alpha, lq)
    qidx = rng.integers(0, nq, size=b).astype(np.int32)
    targets = rng.integers(0, alpha, size=(b, lt)).astype(np.int32)
    return profiles, qidx, targets


def textbook_sw(profile, target, go, ge):
    """Full-matrix affine local DP with the striped-SW E semantics
    (E derived from pre-F H), independent of the scan implementations."""
    lq = profile.shape[1]
    lt = len(target)
    H = np.zeros((lq + 1, lt + 1), dtype=np.int64)
    Hng = np.zeros((lq + 1, lt + 1), dtype=np.int64)
    E = np.zeros((lq + 1, lt + 1), dtype=np.int64)
    F = np.full((lq + 1, lt + 1), -(1 << 40), dtype=np.int64)
    best = 0
    for j in range(1, lt + 1):
        for i in range(1, lq + 1):
            E[i, j] = max(Hng[i, j - 1] - go, E[i, j - 1] - ge)
            F[i, j] = max(Hng[i - 1, j] - go, F[i - 1, j] - ge)
            diag = H[i - 1, j - 1] + profile[target[j - 1], i - 1]
            Hng[i, j] = max(0, diag, E[i, j])
            H[i, j] = max(Hng[i, j], F[i, j])
            best = max(best, H[i, j])
    return int(best)


def test_gapless_matches_naive():
    profiles, qidx, targets = random_case()
    caps = np.full(len(qidx), 250, dtype=np.int32)
    got = np.asarray(dp.gapless_scan(profiles, qidx, targets, caps))
    for k in range(len(qidx)):
        want = dp.gapless_ref(profiles[qidx[k]], targets[k], caps[k])
        assert got[k] == want, k


def test_gapless_cap():
    # identical sequences with huge diagonal scores: score must clamp at cap
    alpha = 21
    m = np.full((alpha, alpha), -4, dtype=np.int32)
    np.fill_diagonal(m, 11)
    seq = rng.integers(0, alpha, size=64)
    prof = m[seq, :].T.astype(np.int32)[None]
    caps = np.array([250], np.int32)
    got = np.asarray(dp.gapless_scan(prof, np.zeros(1, np.int32),
                                     seq[None].astype(np.int32), caps))
    assert got[0] == 250


def test_sw_scan_matches_naive_and_textbook():
    profiles, qidx, targets = random_case(b=16, lq=33, lt=47)
    go, ge = 11, 1
    score, qend, tend = (np.asarray(x) for x in
                         dp.sw_scan(profiles, qidx, targets, go, ge))
    for k in range(len(qidx)):
        s_ref, bq, bt = dp.sw_ref(profiles[qidx[k]], targets[k], go, ge)
        assert score[k] == s_ref
        assert (qend[k], tend[k]) == (bq, bt)
        assert s_ref == textbook_sw(profiles[qidx[k]], targets[k], go, ge)


def test_sw_scan_empty_alignment():
    # all-negative matrix: nothing aligns; end positions keep sentinels
    alpha = 4
    prof = np.full((alpha, 8), -3, dtype=np.int32)[None]
    score, qend, tend = dp.sw_scan(prof, np.zeros(1, np.int32),
                                   np.ones((1, 10), np.int32), 11, 1)
    assert int(score[0]) == 0
    assert int(tend[0]) == -1


def score_backtrace(bt, q_win, t_win, sub, bias, go, ge):
    """Re-score an M/I/D backtrace over a window."""
    qi = ti = 0
    total = 0
    prev = None
    for op in bt:
        if op == 'M':
            total += int(sub[q_win[qi], t_win[ti]]) + int(bias[qi])
            qi += 1
            ti += 1
        else:
            total += -ge if op == prev else -go
            if op == 'I':
                qi += 1
            else:
                ti += 1
        prev = op
    assert qi == len(q_win) and ti == len(t_win)
    return total


@pytest.mark.parametrize("seed", range(6))
def test_banded_backtrace_scores_match(seed):
    """The banded backtrace must re-score to exactly the device SW score."""
    r = np.random.default_rng(seed)
    alpha = 21
    m = r.integers(-4, 3, size=(alpha, alpha))
    m = ((m + m.T) // 2).astype(np.int32)
    np.fill_diagonal(m, r.integers(4, 12, size=alpha))
    lq, lt = 30 + seed * 7, 45 + seed * 5
    q = r.integers(0, alpha, size=lq)
    # embed a homologous region so something aligns
    t = r.integers(0, alpha, size=lt)
    t[5:25] = q[3:23]
    bias = np.zeros(lq, dtype=np.int8)
    prof = (m[q, :].T).astype(np.int32)[None]
    go, ge = 11, 1
    score, qend, tend = (int(np.asarray(x)[0]) for x in dp.sw_scan(
        prof, np.zeros(1, np.int32), t[None].astype(np.int32), go, ge))
    assert tend >= 0
    # reverse pass for start positions
    q_rev = q[:qend + 1][::-1].copy()
    t_rev = t[:tend + 1][::-1].copy()
    prof_rev = (m[q_rev, :].T).astype(np.int32)[None]
    score2, rq, rt = (int(np.asarray(x)[0]) for x in dp.sw_scan(
        prof_rev, np.zeros(1, np.int32), t_rev[None].astype(np.int32), go, ge))
    assert score2 == score
    qstart, tstart = qend - rq, tend - rt
    bt = banded_align(t[tstart:tend + 1], q[qstart:qend + 1],
                      bias[qstart:qend + 1], score, go, ge, m)
    got = score_backtrace(bt, q[qstart:qend + 1], t[tstart:tend + 1],
                          m, bias, go, ge)
    assert got == score, (bt, got, score)
