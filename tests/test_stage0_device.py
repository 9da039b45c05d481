"""Device stage-0 (on-device similar-k-mer generation) vs host oracle.

The production path is TPU-only by default (the 8000^2 table sort is too
slow on the CPU backend); these tests force it on a SMALL alphabet so the
whole logic chain — window extraction, per-window thresholds, multi-level
cutoff cartesian products, CSR lookup, and the downstream match pipeline —
is exercised hit-for-hit against the host QueryMatcher on the CPU mesh.

Reference: src/prefiltering/KmerGenerator.cpp:30-110 (generateKmerList),
QueryMatcher.cpp:243-376.
"""

import numpy as np
import pytest

from mmseqs2_tpu.prefilter.device import DevicePrefilter
from mmseqs2_tpu.prefilter.kmer_generator import KmerGenerator, SubKmerScores
from mmseqs2_tpu.prefilter.kmer_index import KmerIndexTable
from mmseqs2_tpu.prefilter.query_matcher import QueryMatcher

rng = np.random.default_rng(11)


class SmallMat:
    """Minimal substitution-matrix object over a tiny alphabet."""

    def __init__(self, alphabet_size, scale=8):
        self.alphabet_size = alphabet_size
        a = alphabet_size
        m = rng.integers(-4, 5, size=(a, a))
        m = (m + m.T) // 2
        np.fill_diagonal(m, rng.integers(6, 12, size=a))
        m[a - 1, :] = -1
        m[:, a - 1] = -1
        self.sub_matrix = (m * scale).astype(np.int64)
        self.pback = np.full(a, 1.0 / a)


def _make_setup(k, kmer_thr, n_seqs=50, alpha_size=7):
    seed = SmallMat(alpha_size)
    ungapped = SmallMat(alpha_size, scale=2)
    alpha = alpha_size - 1
    motifs = [rng.integers(0, alpha, size=rng.integers(15, 30))
              for _ in range(5)]
    seqs = []
    for i in range(n_seqs):
        L = int(rng.integers(25, 90))
        s = rng.integers(0, alpha, size=L)
        if rng.random() < 0.6:
            m = motifs[int(rng.integers(len(motifs)))].copy()
            mut = rng.random(len(m)) < 0.1
            m[mut] = rng.integers(0, alpha, size=int(mut.sum()))
            p = int(rng.integers(0, max(L - len(m), 1)))
            s[p:p + len(m)] = m[:max(0, min(len(m), L - p))]
        seqs.append(s.astype(np.uint8))
    self_score = np.diag(seed.sub_matrix).astype(np.int64)
    table = KmerIndexTable(alpha, k, spaced=True)
    table.build(seqs, alpha, kmer_thr, self_score)
    subtabs = {w: SubKmerScores(seed.sub_matrix, alpha, w)
               for w in (2, 3)}
    gen = KmerGenerator(k, alpha, subtabs[3], subtabs[2])
    host = QueryMatcher(table, seed, ungapped, kmer_thr, k, max_hits=15,
                        generator=gen)
    dev = DevicePrefilter(table, seed, ungapped, kmer_thr, k, max_hits=15,
                          generator=gen, host_fallback=host)
    # shrink the device caps to CPU-friendly sizes
    dev.LQ0 = 128
    dev.B_PAD = 8
    dev.H0_CAP = 1 << 17
    dev.C0_CAP = 1 << 14
    dev.CAPS2 = (1 << 15, 1 << 16)
    dev.CAPS3 = (1 << 14, 1 << 15, 1 << 16)
    return table, seqs, motifs, host, dev, alpha


def _query(motifs, alpha, L=70, with_x=False, x_index=None):
    s = rng.integers(0, alpha, size=L)
    m = motifs[int(rng.integers(len(motifs)))]
    p = int(rng.integers(0, max(L - len(m), 1)))
    s[p:p + len(m)] = m[:max(0, min(len(m), L - p))]
    if with_x:
        s[rng.integers(0, L, size=3)] = x_index
    return s.astype(np.int64)


@pytest.mark.parametrize("k", [4, 6, 7])
def test_stage0_matches_host(k, monkeypatch):
    monkeypatch.setenv("MMSEQS2_TPU_STAGE0", "1")
    thr = {4: 180, 6: 290, 7: 330}[k]
    table, seqs, motifs, host, dev, alpha = _make_setup(k, thr)
    assert dev._ensure_stage0(), "stage-0 setup must engage when forced"
    queries = [_query(motifs, alpha) for _ in range(6)]
    queries.append(_query(motifs, alpha, with_x=True, x_index=alpha))
    queries.append(rng.integers(0, alpha, size=5).astype(np.int64))  # < span
    idents = [-1] * len(queries)
    got = dev.match_batch(queries, idents)
    for b, q in enumerate(queries):
        want = host.match(q, -1, diagonal_scoring=True)
        assert got[b] == want, (k, b, got[b][:5], want[:5])


def test_stage0_identity_and_split(monkeypatch):
    monkeypatch.setenv("MMSEQS2_TPU_STAGE0", "1")
    table, seqs, motifs, host, dev, alpha = _make_setup(6, 290)
    assert dev._ensure_stage0()
    # identity injection
    q = seqs[3].astype(np.int64)
    got = dev.match_batch([q], [3])
    want = host.match(q, 3, diagonal_scoring=True)
    assert got[0] == want
    # overflow split: shrink caps so the batch must recurse
    dev.H0_CAP = 1 << 8
    queries = [_query(motifs, alpha) for _ in range(4)]
    got = dev.match_batch(queries, [-1] * 4)
    for b, q in enumerate(queries):
        want = host.match(q, -1, diagonal_scoring=True)
        assert got[b] == want, (b,)
