"""Forward-Backward posterior alignment (fwbw).

Computes the posterior match-probability matrix P of a pairwise local
alignment under the affine-gap partition-function model, then the HH-suite
MAC (maximum accuracy) backtrace.

Reference semantics: /root/reference/src/alignment/Fwbw.cpp
  forward():   zm(i,j) = (zm(i-1,j-1)+ze(i-1,j-1)+zf(i-1,j-1)+1)*e^{S(i,j)/T}
               ze(i,j) = ze(i,j-1)*e^{ge/T} + zm(i,j-1)*e^{go/T}
               zf(i,j) = zf(i-1,j)*e^{ge/T} + zm(i-1,j)*e^{go/T}
               (rows i = target, cols j = query; go/ge are NEGATIVE penalties)
  backward():  same recurrences on the reversed pair
  P(i,j) = exp(log zm_f(i,j) + log zm_b(rev) - S(i,j)/T - logsumexp(zm_f))
  computeBacktrace<1>(): local MAC DP with threshold `mact`
               S(i,j) = max(P-mact, S(i-1,j-1)+P-mact,
                            S(i,j-1)-mact/2, S(i-1,j)-mact/2)
               tie-order STOP<M then I then D strictly-greater updates
               (Fwbw.cpp:38-43 calculate_max4)

TPU-first design: the row recurrence is a lax.scan; the within-row ze
linear recurrence is a jax.lax.associative_scan (log-depth, vectorised);
per-row rescaling keeps everything in f32 like the reference's blocked
rescale (we rescale whole rows instead of length-16 blocks, which changes
float rounding but not the math). The MAC running max with slope mact/2
is a cummax of (base + j*c) minus j*c.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

FLT_MIN_EXP = -125.0
STOP, M, I, D = 0, 1, 2, 3


def _bucket(n, minimum=32):
    b = minimum
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("go", "ge", "temp"))
def _fwbw_logzm(scores, tlen, qlen, *, go, ge, temp):
    """One direction of the partition function.

    scores: (T, Q) raw substitution scores (padded with FLT_MIN_EXP).
    Returns log zm (T, Q) with -inf at padded cells, and the logsumexp.
    """
    T, Q = scores.shape
    ego = jnp.float32(np.exp(go / temp))
    ege = jnp.float32(np.exp(ge / temp))
    exp_s = jnp.exp(scores / jnp.float32(temp))      # (T, Q)
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)[0]

    def row_step(carry, xs):
        zm_p, ze_p, zf_p, off = carry        # (Q,), (Q,), (Q,), scalar
        es, i = xs
        one = jnp.exp(-off)
        # diagonal shift: previous row's column j-1 feeds column j
        zm_d = jnp.concatenate([jnp.zeros((1,), jnp.float32), zm_p[:-1]])
        ze_d = jnp.concatenate([jnp.zeros((1,), jnp.float32), ze_p[:-1]])
        zf_d = jnp.concatenate([jnp.zeros((1,), jnp.float32), zf_p[:-1]])
        zm_c = (zm_d + ze_d + zf_d + one) * es
        rowmax = jnp.max(zm_c)
        valid = i < tlen
        rowmax = jnp.where(valid, jnp.maximum(rowmax, jnp.float32(1e-37)),
                           jnp.float32(1.0))
        zf_c = (zm_p * ego + zf_p * ege) / rowmax
        # ze within the row: ze(j) = ege*ze(j-1) + ego*zm(j-1), ze(0)=0
        b = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                             zm_c[:-1] * ego])
        a = jnp.full((Q,), ege, jnp.float32).at[0].set(0.0)

        def comb(x, y):
            return (x[0] * y[0], y[0] * x[1] + y[1])

        _, ze_c = jax.lax.associative_scan(comb, (a, b))
        ze_c = ze_c / rowmax
        zm_s = zm_c / rowmax
        new_off = off + jnp.log(rowmax)
        logrow = jnp.where(zm_s > 0, jnp.log(zm_s) + new_off,
                           jnp.float32(-jnp.inf))
        logrow = jnp.where(valid & (cols < qlen), logrow,
                           jnp.float32(-jnp.inf))
        return (zm_s, ze_c, zf_c, new_off), logrow

    init = (jnp.zeros((Q,), jnp.float32), jnp.zeros((Q,), jnp.float32),
            jnp.zeros((Q,), jnp.float32), jnp.float32(0.0))
    _, logzm = jax.lax.scan(row_step, init, (exp_s, rows))
    mx = jnp.max(logzm)
    lse = mx + jnp.log(jnp.sum(jnp.exp(logzm - mx)))
    return logzm, lse


@functools.partial(jax.jit, static_argnames=("go", "ge", "temp"))
def _fwbw_p(scores, tlen, qlen, *, go, ge, temp):
    """Posterior probability matrix P (T, Q), padded cells = 0."""
    T, Q = scores.shape
    logf, lse = _fwbw_logzm(scores, tlen, qlen, go=go, ge=ge, temp=temp)
    # reverse the valid region: flip then roll the pad back around
    rev = jnp.flip(scores, (0, 1))
    rev = jnp.roll(rev, (-(T - tlen), -(Q - qlen)), (0, 1))
    logb, _ = _fwbw_logzm(rev, tlen, qlen, go=go, ge=ge, temp=temp)
    logb = jnp.roll(jnp.flip(logb, (0, 1)), (-(T - tlen), -(Q - qlen)),
                    (0, 1))
    logp = logf + logb - scores / jnp.float32(temp) - lse
    return jnp.exp(jnp.where(jnp.isfinite(logp), logp,
                             jnp.float32(-jnp.inf)))


@functools.partial(jax.jit, static_argnames=("mact",))
def _mac(P, tlen, qlen, *, mact):
    """MAC DP (local mode): returns (bt (T,Q) uint8, score, max_i, max_j).

    bt(i,j) is the winning state of DP cell (i+1, j+1); (max_i, max_j) are
    the 1-based DP coordinates of the first strictly-max cell.
    """
    T, Q = P.shape
    c = jnp.float32(mact * 0.5)
    m_ = jnp.float32(mact)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)[0]
    jc = cols.astype(jnp.float32) * c

    def row_step(carry, xs):
        s_prev, best, bi, bj = carry                 # s_prev: (Q+1,)
        p, i = xs                                    # p: (Q,)
        term1 = p - m_
        term2 = s_prev[:-1] + p - m_
        term4 = s_prev[1:] - c
        base = jnp.maximum(jnp.maximum(term1, term2), term4)
        # S(j) = max(base(j), S(j-1) - c), S(0)=0  ->  cummax trick
        shifted = base + jc + c                      # k=j -> base + (j+1)c
        run = jax.lax.associative_scan(jnp.maximum, shifted)
        s_curr = jnp.maximum(run - jc - c, -jc - c)  # floor from S(0)=0
        s_full = jnp.concatenate([jnp.zeros((1,), jnp.float32), s_curr])
        term3 = s_full[:-1] - c
        # calculate_max4 tie-order (STOP vs M, then I, then D)
        st = jnp.where(term1 > term2, jnp.uint8(STOP), jnp.uint8(M))
        cur = jnp.maximum(term1, term2)
        st = jnp.where(term3 > cur, jnp.uint8(I), st)
        cur = jnp.maximum(cur, term3)
        st = jnp.where(term4 > cur, jnp.uint8(D), st)
        cur = jnp.maximum(cur, term4)
        valid = (i < tlen) & (cols < qlen)
        masked = jnp.where(valid, cur, jnp.float32(-jnp.inf))
        rmax = jnp.max(masked)
        rj = jnp.argmax(masked)
        upd = rmax > best
        best = jnp.where(upd, rmax, best)
        bi = jnp.where(upd, i + 1, bi)
        bj = jnp.where(upd, rj.astype(jnp.int32) + 1, bj)
        return (s_full, best, bi, bj), st

    rows = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)[:, 0]
    init = (jnp.zeros((Q + 1,), jnp.float32),
            jnp.float32(-jnp.inf), jnp.int32(0), jnp.int32(0))
    (_, best, bi, bj), bt = jax.lax.scan(row_step, init, (P, rows))
    return bt, best, bi, bj


def fwbw_align(score_matrix, tlen, qlen, go=-10.0, ge=-2.0, temp=1.0,
               mact=0.035):
    """Full fwbw alignment of one pair.

    score_matrix: (tlen, qlen) float raw substitution scores (rows=target).
    Returns dict with cigar ('M'/'I'/'D'), q/t start/end (0-based,
    inclusive), score_mac, max_p and the identical-count hook positions.
    """
    T, Q = _bucket(tlen), _bucket(qlen)
    S = np.full((T, Q), FLT_MIN_EXP, np.float32)
    S[:tlen, :qlen] = score_matrix
    S = jnp.asarray(S)
    P = _fwbw_p(S, tlen, qlen, go=float(go), ge=float(ge),
                temp=float(temp))
    bt, best, bi, bj = _mac(P, tlen, qlen, mact=float(mact))
    bt = np.asarray(bt)
    maxp = float(np.asarray(jnp.max(P)))
    i, j = int(bi), int(bj)
    q_end, t_end = j - 1, i - 1
    cigar = []
    pairs = []
    q_start, t_start = q_end, t_end
    while i > 0 and j > 0:
        state = bt[i - 1, j - 1]
        if state == M:
            i -= 1
            j -= 1
            q_start, t_start = j, i
            cigar.append("M")
            pairs.append((i, j))
        elif state == I:
            j -= 1
            cigar.append("I")
        elif state == D:
            i -= 1
            cigar.append("D")
        else:
            break
    while cigar and cigar[-1] != "M":
        cigar.pop()
    cigar.reverse()
    return {
        "cigar": "".join(cigar),
        "q_start": q_start, "q_end": q_end,
        "t_start": t_start, "t_end": t_end,
        "score_mac": float(best), "max_p": maxp,
        "match_pairs": pairs,
    }


def fwbw_oracle(score_matrix, go=-10.0, ge=-2.0, temp=1.0):
    """f64 numpy oracle for P (no rescaling; tiny inputs only)."""
    S = np.asarray(score_matrix, np.float64)
    T, Q = S.shape
    es = np.exp(S / temp)
    ego, ege = np.exp(go / temp), np.exp(ge / temp)

    def direction(es_):
        zm = np.zeros((T + 1, Q + 1))
        ze = np.zeros((T + 1, Q + 1))
        zf = np.zeros((T + 1, Q + 1))
        for i in range(1, T + 1):
            for j in range(1, Q + 1):
                zm[i, j] = (zm[i - 1, j - 1] + ze[i - 1, j - 1]
                            + zf[i - 1, j - 1] + 1.0) * es_[i - 1, j - 1]
                ze[i, j] = ze[i, j - 1] * ege + zm[i, j - 1] * ego
                zf[i, j] = zf[i - 1, j] * ege + zm[i - 1, j] * ego
        return zm[1:, 1:]

    zf_ = direction(es)
    zb_ = direction(es[::-1, ::-1])[::-1, ::-1]
    total = zf_.sum()
    return zf_ * zb_ / (es * total)


@functools.partial(jax.jit, static_argnames=("go", "ge", "temp", "mact"))
def _fwbw_batch(S, tlens, qlens, *, go, ge, temp, mact):
    """vmapped P + MAC over a (B, T, Q) bucket of score matrices."""
    def one(s, tl, ql):
        P = _fwbw_p(s, tl, ql, go=go, ge=ge, temp=temp)
        bt, best, bi, bj = _mac(P, tl, ql, mact=mact)
        return bt, best, bi, bj, jnp.max(P)

    return jax.vmap(one)(S, tlens, qlens)


def fwbw_align_batch(score_mats, tlens, qlens, go=-10.0, ge=-2.0,
                     temp=1.0, mact=0.035):
    """Batched fwbw over same-bucket pairs; returns a list of dicts like
    fwbw_align. The P/MAC device work runs as ONE vmapped computation
    (bigger MXU batches, one compile per (T, Q) bucket)."""
    B = len(score_mats)
    T = _bucket(max(int(t) for t in tlens))
    Q = _bucket(max(int(q) for q in qlens))
    S = np.full((B, T, Q), FLT_MIN_EXP, np.float32)
    for b, m in enumerate(score_mats):
        S[b, :m.shape[0], :m.shape[1]] = m
    bts, bests, bis, bjs, maxps = _fwbw_batch(
        jnp.asarray(S), jnp.asarray(np.asarray(tlens, np.int32)),
        jnp.asarray(np.asarray(qlens, np.int32)),
        go=float(go), ge=float(ge), temp=float(temp), mact=float(mact))
    bts = np.asarray(bts)
    bests = np.asarray(bests)
    bis = np.asarray(bis)
    bjs = np.asarray(bjs)
    maxps = np.asarray(maxps)
    out = []
    for b in range(B):
        bt = bts[b]
        i, j = int(bis[b]), int(bjs[b])
        q_end, t_end = j - 1, i - 1
        cigar = []
        pairs = []
        q_start, t_start = q_end, t_end
        while i > 0 and j > 0:
            state = bt[i - 1, j - 1]
            if state == M:
                i -= 1
                j -= 1
                q_start, t_start = j, i
                cigar.append("M")
                pairs.append((i, j))
            elif state == I:
                j -= 1
                cigar.append("I")
            elif state == D:
                i -= 1
                cigar.append("D")
            else:
                break
        while cigar and cigar[-1] != "M":
            cigar.pop()
        cigar.reverse()
        out.append({
            "cigar": "".join(cigar),
            "q_start": q_start, "q_end": q_end,
            "t_start": t_start, "t_end": t_end,
            "score_mac": float(bests[b]), "max_p": float(maxps[b]),
            "match_pairs": pairs,
        })
    return out
