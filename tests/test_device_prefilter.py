"""Device (XLA) prefilter vs host QueryMatcher oracle.

The device pipeline (prefilter/device.py) must return hit-for-hit identical
results to the host numpy QueryMatcher (which itself is byte-parity-tested
against the reference binary via tests/test_parity_toy.py).
"""

import numpy as np
import pytest

from mmseqs2_tpu.data.submat import get_submat
from mmseqs2_tpu.prefilter.device import DevicePrefilter
from mmseqs2_tpu.prefilter.kmer_generator import KmerGenerator, SubKmerScores
from mmseqs2_tpu.prefilter.kmer_index import KmerIndexTable
from mmseqs2_tpu.prefilter.query_matcher import QueryMatcher

rng = np.random.default_rng(7)


def make_db(n_seqs=60, lmin=20, lmax=90, alpha=20, seed_mat=None,
            kmer_size=6, kmer_thr=68, related_frac=0.5):
    """Random target DB where ~half the sequences embed mutated copies of
    shared motifs so k-mer double matches actually occur."""
    motifs = [rng.integers(0, alpha, size=rng.integers(12, 30))
              for _ in range(6)]
    seqs = []
    for i in range(n_seqs):
        L = int(rng.integers(lmin, lmax))
        s = rng.integers(0, alpha, size=L)
        if rng.random() < related_frac:
            m = motifs[int(rng.integers(len(motifs)))].copy()
            mut = rng.random(len(m)) < 0.1
            m[mut] = rng.integers(0, alpha, size=int(mut.sum()))
            p = int(rng.integers(0, max(L - len(m), 1)))
            s[p:p + len(m)] = m[:max(0, min(len(m), L - p))]
        seqs.append(s.astype(np.uint8))
    self_score = np.diag(seed_mat.sub_matrix).astype(np.int64)
    table = KmerIndexTable(alpha, kmer_size, spaced=True)
    table.build(seqs, alpha, kmer_thr, self_score)
    return table, seqs, motifs


def make_query(motifs, alpha=20, L=70):
    s = rng.integers(0, alpha, size=L)
    m = motifs[int(rng.integers(len(motifs)))]
    p = int(rng.integers(0, max(L - len(m), 1)))
    s[p:p + len(m)] = m[:max(0, min(len(m), L - p))]
    return s.astype(np.int64)


@pytest.fixture(scope="module")
def setup():
    seed = get_submat("VTML80.out", 8.0, -0.2)
    ungapped = get_submat("blosum62.out", 2.0, -0.2)
    kmer_thr = 112
    table, seqs, motifs = make_db(seed_mat=seed, kmer_thr=kmer_thr)
    alpha = seed.alphabet_size - 1
    three = SubKmerScores(seed.sub_matrix, alpha, 3)
    two = SubKmerScores(seed.sub_matrix, alpha, 2)
    gen = KmerGenerator(6, alpha, three, two)
    host = QueryMatcher(table, seed, ungapped, kmer_thr, 6, max_hits=20,
                        generator=gen)
    dev = DevicePrefilter(table, seed, ungapped, kmer_thr, 6, max_hits=20,
                          generator=gen, host_fallback=host)
    return table, seqs, motifs, host, dev


def test_device_matches_host_batch(setup):
    table, seqs, motifs, host, dev = setup
    queries = [make_query(motifs) for _ in range(8)]
    idents = [-1] * 8
    got = dev.match_batch(queries, idents)
    for b, q in enumerate(queries):
        want = host.match(q, -1, diagonal_scoring=True)
        assert got[b] == want, (b, got[b][:5], want[:5])


def test_device_identity_injection(setup):
    table, seqs, motifs, host, dev = setup
    # query = an actual target sequence -> identity hit pinned first
    tid = 3
    q = seqs[tid].astype(np.int64)
    got = dev.match_batch([q], [tid])
    want = host.match(q, tid, diagonal_scoring=True)
    assert got[0] == want


def test_device_small_max_hits(setup):
    table, seqs, motifs, host, dev = setup
    host2 = QueryMatcher(table, host.seed, host.ungapped, host.kmer_thr, 6,
                         max_hits=3, generator=host.generator)
    dev2 = DevicePrefilter(table, host.seed, host.ungapped, host.kmer_thr,
                           6, max_hits=3, generator=host.generator,
                           host_fallback=host2)
    queries = [make_query(motifs) for _ in range(4)]
    got = dev2.match_batch(queries, [-1] * 4)
    for b, q in enumerate(queries):
        want = host2.match(q, -1, diagonal_scoring=True)
        assert got[b] == want


def test_device_exact_kmer_mode(setup):
    table, seqs, motifs, host, dev = setup
    host2 = QueryMatcher(table, host.seed, host.ungapped, 0, 6,
                         max_hits=20, take_only_best_kmer=True)
    dev2 = DevicePrefilter(table, host.seed, host.ungapped, 0, 6,
                           max_hits=20, take_only_best_kmer=True,
                           host_fallback=host2)
    # exact copies of targets so exact k-mer matching fires
    queries = [seqs[i].astype(np.int64) for i in (0, 5, 9)]
    got = dev2.match_batch(queries, [-1] * 3)
    for b, q in enumerate(queries):
        want = host2.match(q, -1, diagonal_scoring=True)
        assert got[b] == want


def test_device_truncated_fallback(setup):
    """Queries whose diagonal threshold saturates at 255 take the host
    rescoreHits path."""
    table, seqs, motifs, host, dev = setup
    # many identical long targets => every diagonal saturates
    alpha = 20
    base = rng.integers(0, alpha, size=400).astype(np.uint8)
    seqs2 = [base.copy() for _ in range(30)]
    self_score = np.diag(host.seed.sub_matrix).astype(np.int64)
    t2 = KmerIndexTable(alpha, 6, spaced=True)
    t2.build(seqs2, alpha, host.kmer_thr, self_score)
    host2 = QueryMatcher(t2, host.seed, host.ungapped, host.kmer_thr, 6,
                         max_hits=5, generator=host.generator)
    dev2 = DevicePrefilter(t2, host.seed, host.ungapped, host.kmer_thr, 6,
                           max_hits=5, generator=host.generator,
                           host_fallback=host2)
    q = base.astype(np.int64)
    got = dev2.match_batch([q], [-1])
    want = host2.match(q, -1, diagonal_scoring=True)
    assert got[0] == want
