"""Batched dynamic-programming kernels: gapless diagonal scan and
affine-gap Smith-Waterman (score + end positions), as JAX column scans.

TPU-first design: one `lax.scan` step processes one target column for a whole
batch of (query, target) pairs; the per-column state is a (B, Lq) integer
matrix living in vector registers/VMEM, so the VPU is saturated across the
batch x query dimensions. The within-column affine-gap dependency (Farrar's
lazy-F) is closed exactly with a prefix cummax (valid when gap_open >=
gap_extend; asserted), instead of the reference's iterative lazy-F loop.

Numerical contracts reproduced (see tests/test_dp.py):
  - gapless: saturating-u8 semantics of SmithWaterman::ungapped_alignment
    (/root/reference/src/alignment/StripedSmithWaterman.cpp:1817-1876):
    per-step clamp of H to [0, 255 - bias], where bias = |min(subMat)| +
    |min(composition bias)| per query.
  - gapped: sw_sse2_byte/word recurrences
    (/root/reference/src/alignment/StripedSmithWaterman.cpp:99-298) with the
    SWPS3 "no deletion directly after insertion" rule: the E update reads the
    pre-lazy-F H value. End-position tie-breaks: target end = first column
    (in scan order) reaching the global max; query end = smallest query index
    attaining the column max in that column.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -(1 << 28)   # plain int: no device init at import time


# ---------------------------------------------------------------------------
# Gapless (ungapped) best-diagonal scan
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("with_endpos",))
def gapless_scan(profiles, qidx, targets, caps, with_endpos=False):
    """Best ungapped local alignment score per (query, target) pair.

    profiles: (NQ, A, Lq) int32 query profiles (substitution column scores,
              composition bias already added; PAD rows/cols very negative).
    qidx:     (B,) int32 query index per pair.
    targets:  (B, Lt) int32 target residues (PAD letter for padding).
    caps:     (B,) int32 per-pair score cap (255 - bias), reference
              saturating-u8 contract. Use a huge value to disable.

    Returns score (B,) int32 [and (qEnd, tEnd) (B,) if with_endpos].
    """
    B, Lt = targets.shape
    Lq = profiles.shape[2]

    def step(carry, chars):
        H, best, bestQ, bestT, j = carry
        s = profiles[qidx, chars]                    # (B, Lq)
        Hshift = jnp.pad(H[:, :-1], ((0, 0), (1, 0)))
        H = jnp.clip(Hshift + s, 0, caps[:, None])
        colmax = H.max(axis=1)
        if with_endpos:
            better = colmax > best
            bestT = jnp.where(better, j, bestT)
            bestQ = jnp.where(better, jnp.argmax(H, axis=1).astype(jnp.int32),
                              bestQ)
        best = jnp.maximum(best, colmax)
        return (H, best, bestQ, bestT, j + 1), None

    H0 = jnp.zeros((B, Lq), jnp.int32)
    best0 = jnp.zeros(B, jnp.int32)
    bestQ0 = jnp.full(B, Lq - 1, jnp.int32)
    bestT0 = jnp.full(B, -1, jnp.int32)
    (H, best, bestQ, bestT, _), _ = jax.lax.scan(
        step, (H0, best0, bestQ0, bestT0, jnp.int32(0)), targets.T)
    if with_endpos:
        return best, bestQ, bestT
    return best


# ---------------------------------------------------------------------------
# Affine-gap Smith-Waterman: score + end positions
# ---------------------------------------------------------------------------

@jax.jit
def sw_scan(profiles, qidx, targets, gap_open, gap_extend):
    """Affine-gap local alignment score and end positions, batched.

    profiles/qidx/targets as in gapless_scan. gap_open/gap_extend: positive
    int penalties (gap of length k costs go + (k-1)*ge).

    Returns (score, qEnd, tEnd): (B,) int32 each. tEnd == -1 when nothing
    aligned. End positions follow the reference tie-breaks (first target
    column reaching the max; smallest query index within that column).
    """
    B, Lt = targets.shape
    Lq = profiles.shape[2]
    go = jnp.int32(gap_open)
    ge = jnp.int32(gap_extend)
    # ramp for the exact lazy-F closure: F[i] = max_{k<i}(Hng[k] + k*ge)
    #                                           - go - (i-1)*ge
    ramp = jnp.arange(Lq, dtype=jnp.int32) * ge     # (Lq,)

    def step(carry, chars):
        H, Hng, E, best, bestQ, bestT, j = carry
        s = profiles[qidx, chars]                            # (B, Lq)
        diag = jnp.pad(H[:, :-1], ((0, 0), (1, 0))) + s
        # E for this column was derived from the previous column's pre-F H
        # (striped SW does not feed lazy-F corrections into E).
        E = jnp.maximum(Hng - go, E - ge)
        Hng_new = jnp.maximum(0, jnp.maximum(diag, E))
        # exact F via prefix cummax (gap_open >= gap_extend)
        run = jax.lax.cummax(Hng_new + ramp[None, :], axis=1)
        Fshift = jnp.pad(run[:, :-1], ((0, 0), (1, 0)),
                         constant_values=int(NEG_INF))
        F = Fshift - go - ramp[None, :] + ge
        Hnew = jnp.maximum(Hng_new, F)
        colmax = Hnew.max(axis=1)
        better = colmax > best
        bestT = jnp.where(better, j, bestT)
        bestQ = jnp.where(better, jnp.argmax(Hnew, axis=1).astype(jnp.int32),
                          bestQ)
        best = jnp.maximum(best, colmax)
        return (Hnew, Hng_new, E, best, bestQ, bestT, j + 1), None

    zeros = jnp.zeros((B, Lq), jnp.int32)
    init = (zeros, zeros, zeros,
            jnp.zeros(B, jnp.int32), jnp.full(B, Lq - 1, jnp.int32),
            jnp.full(B, -1, jnp.int32), jnp.int32(0))
    (H, Hng, E, best, bestQ, bestT, _), _ = jax.lax.scan(
        step, init, targets.T)
    return best, bestQ, bestT


# ---------------------------------------------------------------------------
# Reference (numpy, unbatched) implementations for testing
# ---------------------------------------------------------------------------

def gapless_ref(profile, target, cap):
    """Naive O(Lq*Lt) scalar version of the saturating gapless scan."""
    Lq = profile.shape[1]
    H = np.zeros(Lq, dtype=np.int64)
    best = 0
    for ch in target:
        s = profile[ch]
        H = np.concatenate([[0], H[:-1]]) + s
        H = np.clip(H, 0, cap)
        best = max(best, int(H.max()))
    return best


def sw_ref(profile, target, go, ge):
    """Naive affine SW with the same E/F semantics and tie-breaks."""
    Lq = profile.shape[1]
    H = np.zeros(Lq, dtype=np.int64)
    Hng = np.zeros(Lq, dtype=np.int64)
    E = np.zeros(Lq, dtype=np.int64)
    best, bq, bt = 0, Lq - 1, -1
    for j, ch in enumerate(target):
        s = profile[ch]
        diag = np.concatenate([[0], H[:-1]]) + s
        E = np.maximum(Hng - go, E - ge)
        Hng = np.maximum(0, np.maximum(diag, E))
        F = np.full(Lq, -(1 << 40), dtype=np.int64)
        for i in range(1, Lq):
            F[i] = max(F[i - 1] - ge, Hng[i - 1] - go)
        H = np.maximum(Hng, F)
        cm = int(H.max())
        if cm > best:
            best, bt, bq = cm, j, int(np.argmax(H))
    return best, bq, bt
