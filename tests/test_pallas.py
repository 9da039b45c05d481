"""Pallas kernel parity vs the XLA scan reference (interpret mode on CPU)."""

import numpy as np
import pytest

from mmseqs2_tpu.ops import dp


@pytest.mark.parametrize("gapless", [False, True])
def test_pallas_matches_scan(gapless):
    import jax.numpy as jnp
    from mmseqs2_tpu.ops.pallas_sw import sw_pallas

    rng = np.random.default_rng(3)
    alpha, lq, lt, b = 32, 64, 96, 8
    m = rng.integers(-4, 3, size=(alpha, alpha))
    m = ((m + m.T) // 2).astype(np.int32)
    np.fill_diagonal(m, rng.integers(4, 12, size=alpha))
    q = rng.integers(0, 20, size=lq)
    prof = m[q, :].T.astype(np.int32)
    targets = rng.integers(0, 20, size=(b, lt)).astype(np.int32)
    targets[0, 5:40] = q[3:38]

    if gapless:
        want = np.asarray(dp.gapless_scan(
            prof[None], np.zeros(b, np.int32), targets,
            np.full(b, 250, np.int32)))
        got = np.asarray(sw_pallas(jnp.asarray(prof), jnp.asarray(targets.T),
                                   gapless=True, cap=250, interpret=True)[0])
        assert np.array_equal(want, got)
    else:
        w = [np.asarray(x) for x in dp.sw_scan(
            prof[None], np.zeros(b, np.int32), targets, 11, 1)]
        g = [np.asarray(x) for x in sw_pallas(
            jnp.asarray(prof), jnp.asarray(targets.T), interpret=True)]
        for a, c in zip(w, g):
            assert np.array_equal(a, c)


def test_pallas_zero_scores_and_unpacked():
    """All-negative profile -> score 0 with (-1, lq-1) sentinels; a huge
    score bound falls back to the unpacked per-column tracking path."""
    import jax.numpy as jnp
    from mmseqs2_tpu.ops.pallas_sw import sw_pallas

    rng = np.random.default_rng(5)
    alpha, lq, lt, b = 32, 64, 96, 8
    targets = rng.integers(0, 20, size=(b, lt)).astype(np.int32)

    neg = np.full((alpha, lq), -9, np.int32)
    s, qe, te = [np.asarray(x) for x in sw_pallas(
        jnp.asarray(neg), jnp.asarray(targets.T), interpret=True)]
    assert np.array_equal(s, np.zeros(b, np.int32))
    assert np.array_equal(te, np.full(b, -1, np.int32))
    assert np.array_equal(qe, np.full(b, lq - 1, np.int32))

    # unpacked fallback: max profile value 255 (bf16-exact after the +ge
    # fold) with lq=72 puts the score bound past 2^24/PKT
    lq = 72
    m = rng.integers(-4, 3, size=(alpha, alpha))
    m = ((m + m.T) // 2).astype(np.int32)
    np.fill_diagonal(m, rng.integers(4, 12, size=alpha))
    q = rng.integers(0, 20, size=lq)
    big = m[q, :].T.astype(np.int32)
    big[q[0], 0] = 255
    from mmseqs2_tpu.ops import dp
    from mmseqs2_tpu.ops.pallas_sw import _pk_for
    assert 255 * lq >= (1 << 24) // _pk_for(lt) - 1   # gate really off
    w = [np.asarray(x) for x in dp.sw_scan(
        big[None], np.zeros(b, np.int32), targets, 11, 1)]
    g = [np.asarray(x) for x in sw_pallas(
        jnp.asarray(big), jnp.asarray(targets.T), interpret=True)]
    for a, c in zip(w, g):
        assert np.array_equal(a, c)
