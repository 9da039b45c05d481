"""sequence2profile / CSProfile context-pseudocount tests.

No reference golden exists: the reference embeds K4000.crf via git-lfs and
this snapshot ships only a placeholder, so even a fresh reference build
cannot produce real context profiles. These tests pin the machinery:
CRF (de)serialization round-trip, the context-mix math against a direct
per-position oracle, and the command end-to-end producing a profile DB
that the profile reader accepts.
"""

import pathlib

import numpy as np

from mmseqs2_tpu.profile import cs
from mmseqs2_tpu.db.reader import DBReader

TOY = pathlib.Path(__file__).parent / "golden" / "toy"


def test_crf_roundtrip(tmp_path):
    lib = cs.synthetic_library()
    text = cs.dump_crf(lib)
    lib2 = cs.load_crf(text)
    np.testing.assert_allclose(lib2.weights, lib.weights, atol=1e-3)
    np.testing.assert_allclose(lib2.pc, lib.pc, atol=1e-3)
    assert lib2.size == lib.size and lib2.wlen == lib.wlen


def test_cs_scores_vs_direct():
    rng = np.random.default_rng(3)
    K, wlen = 7, 5
    weights = rng.normal(size=(K, wlen, 21)).astype(np.float32)
    weights[:, :, 20] = 0.0
    biases = rng.normal(size=K).astype(np.float32)
    pcw = rng.normal(size=(K, 20))
    lib = cs.ContextLibrary(weights, biases, pcw)
    seq = rng.integers(0, 21, size=30)
    prof = cs.compute_sequence_cs(seq, lib, tau=0.9, use_jax=False)
    # direct per-position computation (CSProfile.cpp:375-485 semantics)
    L, c = len(seq), lib.center
    for i in [0, 1, 15, 29]:
        sc = np.zeros(K)
        for k in range(K):
            s = biases[k]
            for j in range(wlen):
                p = i + j - c
                if 0 <= p < L:
                    s += weights[k, j, seq[p]]
            sc[k] = s
        ppi = np.exp(sc - sc.max())
        ppi /= ppi.sum()
        p = ppi @ lib.pc
        p /= p.sum()
        want = 0.9 * p
        if seq[i] < 20:
            want[seq[i]] += 0.1
        want /= want.sum()
        np.testing.assert_allclose(prof[i], want, rtol=1e-4, atol=1e-6)


def test_sequence2profile_command(tmp_path):
    from mmseqs2_tpu.params import Params
    from mmseqs2_tpu.registry import get_command
    from mmseqs2_tpu.profile import io as pio
    from mmseqs2_tpu.db import dbtype as dbt

    out = str(tmp_path / "prof")
    cmd = get_command("sequence2profile")
    par = Params().parse([str(TOY / "qdb"), out, "--pc-mode", "1"],
                         cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0
    with DBReader(out) as r, DBReader(str(TOY / "qdb")) as q:
        assert r.base_type == dbt.DBTYPE_HMM_PROFILE
        assert r.extended_type & dbt.DBTYPE_EXTENDED_CONTEXT_PSEUDO_COUNTS
        assert r.size == q.size
        for i in [0, 3, 7]:
            ent = pio.parse_profile(r.get_data(r.get_id(i)))
            qlen = q.get_seq_len(q.get_id(i))
            assert ent.scores.shape == (qlen, 20)
            # consensus column quirk: always X (=20)
            assert np.all(ent.consensus_num == 20)
