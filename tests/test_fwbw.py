"""fwbw (forward-backward MAC alignment) tests.

1. Device P matrix vs a brute-force f64 numpy oracle on random pairs.
2. Command output vs the reference golden (tests/golden/fwbw): all integer
   coordinate fields, cigars and seq-ids must match exactly; the MAC score
   (a sum of ~L posterior probabilities) may drift by a few units on long
   alignments because the reference uses a polynomial simdf32_exp and
   length-16 block rescaling (Fwbw.cpp:47-67,396) while we use exact exp
   with whole-row rescaling.
"""

import pathlib

import numpy as np
import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.ops.fwbw import fwbw_align, fwbw_oracle, _fwbw_p, _bucket

G = pathlib.Path(__file__).parent / "golden" / "fwbw"
TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def test_p_matrix_vs_oracle():
    rng = np.random.default_rng(7)
    for tlen, qlen in [(13, 17), (40, 33), (64, 64)]:
        S = rng.integers(-4, 8, size=(tlen, qlen)).astype(np.float32)
        want = fwbw_oracle(S, go=-10.0, ge=-2.0, temp=1.0)
        T, Q = _bucket(tlen), _bucket(qlen)
        import jax.numpy as jnp
        Sp = np.full((T, Q), -125.0, np.float32)
        Sp[:tlen, :qlen] = S
        got = np.asarray(_fwbw_p(jnp.asarray(Sp), tlen, qlen,
                                 go=-10.0, ge=-2.0, temp=1.0))
        np.testing.assert_allclose(got[:tlen, :qlen], want, rtol=2e-3,
                                   atol=1e-6)
        assert np.all(got[tlen:] == 0) and np.all(got[:, qlen:] == 0)


def test_mac_backtrace_identity():
    # a self-match must give a full-length M cigar starting at (0, 0)
    rng = np.random.default_rng(1)
    n = 50
    seq = rng.integers(0, 20, size=n)
    blosum = rng.integers(-4, 2, size=(20, 20)).astype(np.float32)
    blosum[np.arange(20), np.arange(20)] = 8.0
    S = blosum[seq[:, None], seq[None, :]]
    a = fwbw_align(S, n, n)
    assert a["cigar"] == "M" * n
    assert (a["q_start"], a["t_start"]) == (0, 0)
    assert (a["q_end"], a["t_end"]) == (n - 1, n - 1)


@pytest.mark.slow
def test_fwbw_command_near_parity(tmp_path):
    from mmseqs2_tpu.params import Params
    from mmseqs2_tpu.registry import get_command

    out = str(tmp_path / "fw")
    cmd = get_command("fwbw")
    par = Params().parse([str(TOY / "qdb"), str(TOY / "qdb"),
                          str(G / "alnsub"), out, "--threads", "1"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    with DBReader(out) as a, DBReader(str(G / "reffw")) as b:
        assert a.size == b.size
        for k in range(a.size):
            la = a.get_data(a.get_id(k)).decode().strip().split("\n")
            lb = b.get_data(b.get_id(k)).decode().strip().split("\n")
            assert len(la) == len(lb)
            for ra, rb in zip(la, lb):
                fa, fb = ra.split("\t"), rb.split("\t")
                # key, seqid, evalue, coords, lens, cigar exact
                assert fa[0] == fb[0] and fa[2:] == fb[2:], (ra, rb)
                # MAC score within a small drift window
                assert abs(int(fa[1]) - int(fb[1])) <= 3, (ra, rb)
