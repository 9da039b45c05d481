"""Similar-k-mer enumeration against the seed substitution matrix.

Reference: src/prefiltering/KmerGenerator.{h,cpp} +
ExtendedSubstitutionMatrix.cpp. A query k-mer expands into all k-mers whose
summed substitution score is >= the (bias-adjusted) k-mer threshold. The
reference precomputes exhaustive sorted score lists for all 2-mers/3-mers and
merges them with score-cutoff cartesian products; we reproduce the same
candidate sets and their order:

  - sub-k-mer rows sorted by score desc, ties by lexicographic letters
    (stable_sort over the cartesian-product iteration order,
    ExtendedSubstitutionMatrix.cpp:calcScoreMatrix)
  - divide strategy: k=6 -> [3,3]; k=7 -> [2,2,3]; k=5 -> [2,3] (the
    setDivideStrategy switch + std::reverse, KmerGenerator.cpp:41-88)
  - output order: first-subkmer-major (descending score), inner candidates
    descending (calculateArrayProduct)

Rows are computed lazily and cached (the reference precomputes all 160k rows;
we only ever touch rows for sub-k-mers that occur in queries).
"""

import numpy as np

from .kmer_index import kmer_powers


class SubKmerScores:
    """Sorted (score desc, tie: lexicographic letters) lists of all A^k
    sub-k-mers scored against a given sub-k-mer."""

    def __init__(self, sub_matrix: np.ndarray, alpha: int, k: int):
        self.mat = sub_matrix[:alpha, :alpha].astype(np.int32)
        self.alpha = alpha
        self.k = k
        self.size = alpha ** k
        self.powers = kmer_powers(alpha, k)
        self._cache = {}
        # little-endian index <-> big-endian (lexicographic) tie key
        digits = np.stack([(np.arange(self.size) // self.powers[i])
                           % alpha for i in range(k)])
        be = np.zeros(self.size, dtype=np.int64)
        for i in range(k):
            be = be * alpha + digits[i]
        self._bigend = be

    def letters(self, idx: int):
        return [(idx // int(self.powers[i])) % self.alpha
                for i in range(self.k)]

    def row(self, idx: int):
        """(scores int32 desc, kmer indices int64) for sub-k-mer `idx`."""
        hit = self._cache.get(idx)
        if hit is not None:
            return hit
        ls = self.letters(idx)
        # build A[j_{k-1}, ..., j_1, j_0]: C-order ravel index is then the
        # little-endian kmer index j_0 + A*j_1 + ...
        s = np.zeros((self.alpha,) * self.k, dtype=np.int32)
        for i, l in enumerate(ls):
            dims = [None] * self.k
            dims[self.k - 1 - i] = slice(None)
            s = s + self.mat[l][tuple(dims)]
        s_le = s.ravel()
        order = np.lexsort((self._bigend, -s_le))
        row = (s_le[order].astype(np.int32), order.astype(np.int64))
        self._cache[idx] = row
        return row


def divide_steps(k: int):
    three_cnt = k // 3
    rem = k % 3
    if rem == 0:
        steps = [3] * three_cnt
    elif rem == 1:
        steps = [3] * (three_cnt - 1) + [2, 2]
    else:
        steps = [3] * three_cnt + [2]
    return list(reversed(steps))


class KmerGenerator:
    MAX_RESULT = 262144 * 32

    def __init__(self, kmer_size: int, alpha: int, three: SubKmerScores,
                 two: SubKmerScores):
        self.k = kmer_size
        self.alpha = alpha
        self.steps = divide_steps(kmer_size)
        self.tables = {2: two, 3: three}
        self.powers = kmer_powers(alpha, kmer_size)

    def generate(self, kmer_letters: np.ndarray, threshold: int,
                 pos: int = 0):
        """All similar k-mer indices (reference order) with score >= threshold.

        `pos` (the window's query position) is unused for sequence queries;
        the profile generator keys its rows off it."""
        rows = []
        mults = []
        off = 0
        for step in self.steps:
            table = self.tables[step]
            sub_idx = int(kmer_letters[off: off + step].astype(np.int64)
                          @ table.powers)
            rows.append(table.row(sub_idx))
            mults.append(int(self.powers[off]))
            off += step
        return _enumerate_products(rows, mults, threshold, self.MAX_RESULT)


class ProfileKmerGenerator:
    """Per-position k-mer enumeration for DBTYPE_HMM_PROFILE queries.

    Reference: KmerGenerator::setDivideStrategy(ScoreMatrix **one)
    (KmerGenerator.cpp:31-40) + Sequence::nextProfileKmer — each window
    position contributes its rankedDescSort20-sorted 20-letter score row;
    the same score-cutoff cartesian product enumerates all k-mers whose
    summed per-position profile score reaches the threshold.
    """

    MAX_RESULT = KmerGenerator.MAX_RESULT

    def __init__(self, kmer_size: int, alpha: int,
                 sorted_scores: np.ndarray, sorted_idx: np.ndarray,
                 offsets: np.ndarray):
        self.k = kmer_size
        self.alpha = alpha
        self.scores = sorted_scores.astype(np.int64)   # (L, 20) desc
        self.idx = sorted_idx.astype(np.int64)         # (L, 20)
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.powers = kmer_powers(alpha, kmer_size)

    def generate(self, kmer_letters: np.ndarray, threshold: int,
                 pos: int = 0):
        rows = [(self.scores[pos + int(o)], self.idx[pos + int(o)])
                for o in self.offsets]
        mults = [int(self.powers[j]) for j in range(self.k)]
        return _enumerate_products(rows, mults, threshold, self.MAX_RESULT)


def _enumerate_products(rows, mults, threshold, max_result):
    """KmerGenerator::generateKmerList's cascaded cutoff products.

    rows: per divide step (scores desc, sub-k-mer indices); mults: the
    little-endian positional multiplier of each step. Output order is
    prefix-major (calculateArrayProduct's i-outer/j-inner loop)."""
    n = len(rows)
    highest = [int(r[0][0]) for r in rows]
    possible_rest = [0] * n
    for i in range(n - 1, 0, -1):
        possible_rest[i - 1] = highest[i] + possible_rest[i]

    cutoff1 = threshold - possible_rest[0]
    s0, i0 = rows[0]
    m = int(np.searchsorted(-s0, -cutoff1, side="right"))
    cur_scores = s0[:m].astype(np.int64)
    cur_index = i0[:m] * mults[0]

    for step_i in range(n - 1):
        if len(cur_scores) == 0:
            break
        s_next, i_next = rows[step_i + 1]
        rest = possible_rest[step_i + 1]
        cutoff2 = threshold - cur_scores - rest          # per candidate
        counts = np.searchsorted(-s_next, -cutoff2, side="right")
        total = int(counts.sum())
        if total == 0:
            cur_scores = np.zeros(0, dtype=np.int64)
            cur_index = np.zeros(0, dtype=np.int64)
            break
        rep = np.repeat(np.arange(len(cur_scores)), counts)
        # within-candidate j index: 0..counts[i]-1
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        j = np.arange(total) - np.repeat(starts, counts)
        cur_scores = cur_scores[rep] + s_next[j].astype(np.int64)
        cur_index = cur_index[rep] + i_next[j] * mults[step_i + 1]
        if total >= max_result:
            cur_scores = cur_scores[:max_result]
            cur_index = cur_index[:max_result]
    return cur_index
