"""End-to-end parity tests against golden reference outputs (tests/golden/toy).

The golden DBs were produced by the reference binary (see tests/golden/README).
We run our commands on a subset of queries (full target set) and require
byte-identical per-query entries.
"""

import os
import pathlib
import shutil

import numpy as np
import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.db.writer import DBWriter
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

GOLDEN = pathlib.Path(__file__).parent / "golden" / "toy"
N_SUBSET = 12   # queries used for the expensive exhaustive-prefilter test


def run_cmd(name, args):
    cmd = get_command(name)
    par = Params().parse(args, cmd, cmd.min_db, cmd.max_db)
    fn = cmd.load()
    assert fn(par, cmd) == 0


def make_subset_db(tmp, keys):
    """Subset of the golden query DB (sequences + headers) for given keys."""
    sub = str(tmp / "qsub")
    with open(tmp / "subkeys", "w") as f:
        f.write("".join(f"{k}\n" for k in keys))
    run_cmd("createsubdb", [str(tmp / "subkeys"), str(GOLDEN / "qdb"), sub])
    run_cmd("createsubdb", [str(tmp / "subkeys"), str(GOLDEN / "qdb") + "_h",
                            sub + "_h"])
    # headers DB must keep the query DB's dbtype conventions; reference uses
    # GENERIC; createsubdb copied it already.
    return sub


def entries_by_key(db_path):
    out = {}
    with DBReader(db_path) as r:
        for i in range(r.size):
            out[r.get_db_key(i)] = r.get_data(i)
    return out


def test_createdb_byte_parity(tmp_path):
    out = str(tmp_path / "qdb")
    run_cmd("createdb", [str(GOLDEN / "QUERY.fasta"), out])
    for suffix in ("", ".index", "_h", "_h.index"):
        got = open(out + suffix, "rb").read()
        want = open(str(GOLDEN / "qdb") + suffix, "rb").read()
        assert got == want, f"mismatch in qdb{suffix}"


@pytest.mark.slow
def test_ungappedprefilter_parity(tmp_path):
    keys = list(range(N_SUBSET))
    sub = make_subset_db(tmp_path, keys)
    out = str(tmp_path / "upref")
    run_cmd("ungappedprefilter", [sub, str(GOLDEN / "qdb"), out])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / "upref"))
    for k in keys:
        assert got[k] == want[k], f"query {k}:\n{got[k]!r}\n!=\n{want[k]!r}"


def test_align_parity(tmp_path):
    """align on the golden (k-mer) prefilter results must match golden aln."""
    keys = list(range(40))
    # subset of the golden prefilter DB as input
    pref_sub = str(tmp_path / "prefsub")
    golden_pref = entries_by_key(str(GOLDEN / "pref"))
    from mmseqs2_tpu.db import dbtype as dbt
    with DBWriter(pref_sub, dbt.DBTYPE_PREFILTER_RES) as w:
        for k in keys:
            w.write(k, golden_pref[k])
    sub = make_subset_db(tmp_path, keys)
    out = str(tmp_path / "aln")
    run_cmd("align", [sub, str(GOLDEN / "qdb"), pref_sub, out, "-a"])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / "aln"))
    for k in keys:
        assert got[k] == want[k], f"query {k}:\n{got[k]!r}\n!=\n{want[k]!r}"


def test_convertalis_parity(tmp_path):
    out = str(tmp_path / "aln.m8")
    run_cmd("convertalis", [str(GOLDEN / "qdb"), str(GOLDEN / "qdb"),
                            str(GOLDEN / "aln"), out])
    got = open(out).read()
    want = open(GOLDEN / "aln.m8").read()
    assert got == want


@pytest.mark.slow
def test_kmer_prefilter_parity(tmp_path):
    """12 queries (distinct query DB) vs the full 500-seq target DB, default
    sensitivity 4.0 — golden `prefsub` was produced by the reference with the
    same inputs (see tests/golden/README.md)."""
    keys = list(range(N_SUBSET))
    sub = make_subset_db(tmp_path, keys)
    out = str(tmp_path / "pref")
    run_cmd("prefilter", [sub, str(GOLDEN / "qdb"), out])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / "prefsub"))
    for k in keys:
        assert got[k] == want[k], f"query {k}:\n{got[k]!r}\n!=\n{want[k]!r}"


def test_kmer_prefilter_self_parity(tmp_path):
    """Self-search (sameDB): identity hits injected with USHRT_MAX score."""
    keys = list(range(N_SUBSET))
    sub = make_subset_db(tmp_path, keys)
    out = str(tmp_path / "prefself")
    run_cmd("prefilter", [sub, sub, out])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / "prefself"))
    for k in keys:
        assert got[k] == want[k], f"query {k}:\n{got[k]!r}\n!=\n{want[k]!r}"


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_clust_parity(tmp_path, mode):
    out = str(tmp_path / f"clu{mode}")
    run_cmd("clust", [str(GOLDEN / "qdb"), str(GOLDEN / "aln"), out,
                      "--cluster-mode", str(mode)])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / f"clu{mode}"))
    assert set(got) == set(want), (sorted(got)[:5], sorted(want)[:5])
    for k in want:
        assert got[k] == want[k], f"cluster {k}:\n{got[k]!r}\n!=\n{want[k]!r}"


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_rescorediagonal_parity(tmp_path, mode):
    out = str(tmp_path / f"resc{mode}")
    run_cmd("rescorediagonal", [str(GOLDEN / "qdb"), str(GOLDEN / "qdb"),
                                str(GOLDEN / "pref"), out,
                                "--rescore-mode", str(mode)])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / f"resc{mode}"))
    for k in want:
        assert got[k] == want[k], f"query {k}:\n{got[k]!r}\n!=\n{want[k]!r}"


def test_kmermatcher_parity(tmp_path):
    # longest-center (linclust v1) path; golden generated with
    # --include-adjacency 0 --include-count-table 0
    out = str(tmp_path / "kmp")
    run_cmd("kmermatcher", [str(GOLDEN / "qdb"), out,
                            "--linclust-version", "1"])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / "kmpref"))
    assert got == want


@pytest.mark.parametrize("flags,golden", [
    ([], "km_default"),                            # adjacency + count-table
    (["--include-adjacency", "0"], "km_ct"),       # count-table only
    (["--include-count-table", "0"], "km_adj"),    # adjacency only
])
def test_kmermatcher_v2_parity(tmp_path, flags, golden):
    # linclust v2 center-swapping chain (reference default); goldens from
    # the reference binary with --threads 1
    out = str(tmp_path / "kmp2")
    run_cmd("kmermatcher", [str(GOLDEN / "qdb"), out] + flags)
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / golden))
    assert got == want


@pytest.mark.slow
def test_linclust_workflow_parity(tmp_path):
    # golden from the reference forced to --linclust-version 1 (the v2
    # align2clust path aborts in the patched reference build)
    out = str(tmp_path / "linclu")
    run_cmd("linclust", [str(GOLDEN / "qdb"), out, str(tmp_path / "tmp"),
                         "--linclust-version", "1"])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / "linclu"))
    assert got == want


@pytest.mark.slow
def test_cluster_workflow_parity(tmp_path):
    out = str(tmp_path / "casclu")
    run_cmd("cluster", [str(GOLDEN / "qdb"), out, str(tmp_path / "tmp"),
                        "--linclust-version", "1"])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / "casclu"))
    assert got == want


# -- iterative (PSI-BLAST-style) search stages --------------------------------
# goldens generated with: mmseqs search qdb qdb italn tmp --num-iterations 2
# --threads 1 (see golden/README.md); it_* are the blastpgp.sh intermediates.

def test_subtractdbs_parity(tmp_path):
    out = str(tmp_path / "pref_1")
    run_cmd("subtractdbs", [str(GOLDEN / "it_pref_tmp_1"),
                            str(GOLDEN / "it_aln_0"), out,
                            "-e", "0.001", "--e-profile", "0.1"])
    assert entries_by_key(out) == entries_by_key(str(GOLDEN / "it_pref_1"))


def test_mergedbs_parity(tmp_path):
    out = str(tmp_path / "italn")
    run_cmd("mergedbs", [str(GOLDEN / "it_profile_0"), out,
                         str(GOLDEN / "it_aln_0"),
                         str(GOLDEN / "it_aln_tmp_1")])
    assert open(out, "rb").read() == open(GOLDEN / "italn", "rb").read()
    assert (open(out + ".index", "rb").read()
            == open(GOLDEN / "italn.index", "rb").read())


@pytest.mark.slow
def test_realign_parity(tmp_path):
    """align --realign (blastpgp iteration 0): score-only first pass plus
    boundary recomputation with the -0.2-biased matrix."""
    out = str(tmp_path / "aln_0")
    run_cmd("align", [str(GOLDEN / "qdb"), str(GOLDEN / "qdb"),
                      str(GOLDEN / "it_pref_0"), out,
                      "-a", "1", "--realign", "1", "-e", "0.001"])
    assert entries_by_key(out) == entries_by_key(str(GOLDEN / "it_aln_0"))


@pytest.mark.slow
def test_result2profile_from_realign_parity(tmp_path):
    out = str(tmp_path / "profile_0")
    run_cmd("result2profile", [str(GOLDEN / "qdb"), str(GOLDEN / "qdb"),
                               str(GOLDEN / "it_aln_0"), out, "-e", "0.001"])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / "it_profile_0"))
    assert sorted(got) == sorted(want)
    bad = [k for k in want if got[k] != want[k]]
    assert not bad, f"{len(bad)} profiles differ: {bad[:5]}"


@pytest.mark.slow
def test_profile_query_prefilter_parity(tmp_path):
    out = str(tmp_path / "pref_tmp_1")
    run_cmd("prefilter", [str(GOLDEN / "it_profile_0"), str(GOLDEN / "qdb"),
                          out, "-s", "5.7"])
    assert entries_by_key(out) == entries_by_key(
        str(GOLDEN / "it_pref_tmp_1"))


@pytest.mark.slow
def test_profile_query_align_parity(tmp_path):
    out = str(tmp_path / "aln_tmp_1")
    run_cmd("align", [str(GOLDEN / "it_profile_0"), str(GOLDEN / "qdb"),
                      str(GOLDEN / "it_pref_1"), out, "-a", "1",
                      "-e", "0.001"])
    assert entries_by_key(out) == entries_by_key(
        str(GOLDEN / "it_aln_tmp_1"))


@pytest.mark.slow
def test_result2profile_profile_query_parity(tmp_path):
    """result2profile with a PROFILE query DB (blastpgp iteration >= 2).

    Golden: 3-iteration reference search; profile_1 is built from profile_0
    (profile query) + the merged iteration-1 alignments."""
    prof0 = str(tmp_path / "profile_0")
    run_cmd("result2profile", [str(GOLDEN / "qdb"), str(GOLDEN / "qdb"),
                               str(GOLDEN / "it_aln_0"), prof0,
                               "-e", "0.001"])
    out = str(tmp_path / "profile_1")
    run_cmd("result2profile", [prof0, str(GOLDEN / "qdb"),
                               str(GOLDEN / "it3_aln_1"), out, "-e", "0.001"])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / "it3_profile_1"))
    bad = [k for k in want if got.get(k) != want[k]]
    assert not bad, f"{len(bad)} profiles differ: {bad[:5]}"


# -- nucleotide search (blastn) -----------------------------------------------
NUCL = pathlib.Path(__file__).parent / "golden" / "nucl"


def test_nucl_createdb_parity(tmp_path):
    out = str(tmp_path / "ndb")
    run_cmd("createdb", [str(NUCL / "NUCL.fasta"), out])
    for suffix in ("", ".index", ".dbtype"):
        assert (open(out + suffix, "rb").read()
                == open(str(NUCL / "ndb") + suffix, "rb").read()), suffix


def test_extractframes_parity(tmp_path):
    out = str(tmp_path / "qf")
    run_cmd("extractframes", [str(NUCL / "ndb"), out,
                              "--forward-frames", "1",
                              "--reverse-frames", "1"])
    assert open(out, "rb").read() == open(NUCL / "n_query_seqs", "rb").read()
    assert (open(out + "_h", "rb").read()
            == open(NUCL / "n_query_seqs_h", "rb").read())


@pytest.mark.slow
def test_nucl_prefilter_parity(tmp_path):
    out = str(tmp_path / "pref")
    run_cmd("prefilter", [str(NUCL / "n_query_seqs"), str(NUCL / "ndb"), out,
                          "-k", "15", "--exact-kmer-matching", "1",
                          "--max-seq-len", "10000", "-s", "5.7"])
    assert entries_by_key(out) == entries_by_key(str(NUCL / "n_pref"))


@pytest.mark.slow
def test_nucl_align_parity(tmp_path):
    out = str(tmp_path / "aln")
    run_cmd("align", [str(NUCL / "n_query_seqs"), str(NUCL / "ndb"),
                      str(NUCL / "n_pref"), out, "--alignment-mode", "3",
                      "--max-seq-len", "10000"])
    assert entries_by_key(out) == entries_by_key(str(NUCL / "n_aln"))


def test_offsetalignment_parity(tmp_path):
    out = str(tmp_path / "naln")
    run_cmd("offsetalignment", [str(NUCL / "ndb"), str(NUCL / "n_query_seqs"),
                                str(NUCL / "ndb"), str(NUCL / "ndb"),
                                str(NUCL / "n_aln"), out,
                                "--search-type", "3"])
    assert entries_by_key(out) == entries_by_key(str(NUCL / "naln"))


def test_extractorfs_parity(tmp_path):
    out = str(tmp_path / "orfs")
    run_cmd("extractorfs", [str(NUCL / "ndb"), out, "--translate", "1"])
    assert open(out, "rb").read() == open(NUCL / "t_q_orfs_aa", "rb").read()
    assert (open(out + "_h", "rb").read()
            == open(NUCL / "t_q_orfs_aa_h", "rb").read())


@pytest.mark.slow
def test_translated_offsetalignment_parity(tmp_path):
    out = str(tmp_path / "taln")
    run_cmd("offsetalignment", [str(NUCL / "ndb"),
                                str(NUCL / "t_q_orfs_aa"),
                                str(NUCL / "ndb"),
                                str(NUCL / "t_q_orfs_aa"),
                                str(NUCL / "t_aln"), out,
                                "--search-type", "2"])
    assert entries_by_key(out) == entries_by_key(str(NUCL / "taln"))


# -- utility command parity ----------------------------------------------------
UTIL = pathlib.Path(__file__).parent / "golden" / "toy" / "util"


def _db_equal(a, b):
    assert open(a, "rb").read() == open(b, "rb").read()
    assert open(a + ".index", "rb").read() == open(b + ".index", "rb").read()


def test_convert2fasta_parity(tmp_path):
    out = str(tmp_path / "o.fasta")
    run_cmd("convert2fasta", [str(GOLDEN / "qdb"), out])
    assert open(out).read() == open(UTIL / "conv.fasta").read()


def test_result2flat_parity(tmp_path):
    out = str(tmp_path / "o.flat")
    run_cmd("result2flat", [str(GOLDEN / "qdb"), str(GOLDEN / "qdb"),
                            str(GOLDEN / "aln"), out])
    assert open(out).read() == open(UTIL / "aln.flat").read()


@pytest.mark.parametrize("cmd,inp,gold", [
    ("prefixid", "pref", "refpfx"),
    ("suffixid", "pref", "refsfx"),
    ("sortresult", "aln", "refsort"),
    ("summarizeresult", "aln", "refsumm"),
    ("swapdb", "aln", "refswap"),
    ("reverseseq", "qdb", "refrev"),
    ("masksequence", "qdb", "refmask"),
])
def test_util_two_arg_parity(tmp_path, cmd, inp, gold):
    out = str(tmp_path / "out")
    run_cmd(cmd, [str(GOLDEN / inp), out])
    _db_equal(out, str(UTIL / gold))


def test_splitdb_parity(tmp_path):
    out = str(tmp_path / "sp")
    run_cmd("splitdb", [str(GOLDEN / "qdb"), out, "--split", "3"])
    for i in range(3):
        _db_equal(f"{out}_{i}_3", str(UTIL / f"refsplit_{i}_3"))


def test_renamedbkeys_parity(tmp_path):
    out = str(tmp_path / "ren")
    run_cmd("renamedbkeys", [str(UTIL / "map.tsv"), str(GOLDEN / "pref"),
                             out])
    _db_equal(out, str(UTIL / "refren"))


def test_orftocontig_parity(tmp_path):
    out = str(tmp_path / "orf")
    run_cmd("orftocontig", [str(NUCL / "ndb"), str(NUCL / "t_q_orfs_aa"),
                            out])
    _db_equal(out, str(UTIL / "reforf"))


@pytest.mark.slow
def test_result2msa_parity(tmp_path):
    out = str(tmp_path / "msa")
    run_cmd("result2msa", [str(GOLDEN / "qdb"), str(GOLDEN / "qdb"),
                           str(GOLDEN / "it_aln_0"), out])
    _db_equal(out, str(UTIL / "refmsa"))


@pytest.mark.slow
def test_result2msa_a3m_parity(tmp_path):
    out = str(tmp_path / "a3m")
    run_cmd("result2msa", [str(GOLDEN / "qdb"), str(GOLDEN / "qdb"),
                           str(GOLDEN / "it_aln_0"), out,
                           "--msa-format-mode", "5"])
    _db_equal(out, str(UTIL / "refa3m"))


@pytest.mark.parametrize("mode,gold", [(0, "refm2p"), (1, "refm2p1")])
def test_msa2profile_parity(tmp_path, mode, gold):
    out = str(tmp_path / "prof")
    run_cmd("msa2profile", [str(UTIL / "refmsa"), out,
                            "--match-mode", str(mode)])
    _db_equal(out, str(UTIL / gold))


def test_profile2pssm_parity(tmp_path):
    out = str(tmp_path / "pssm.tsv")
    run_cmd("profile2pssm", [str(GOLDEN / "it_profile_0"), out])
    assert open(out).read() == open(UTIL / "refpssm.tsv").read()


@pytest.mark.parametrize("cmd,gold", [("profile2consensus", "refcons"),
                                      ("profile2repseq", "refrep")])
def test_profile2seq_parity(tmp_path, cmd, gold):
    out = str(tmp_path / "seq")
    run_cmd(cmd, [str(GOLDEN / "it_profile_0"), out])
    _db_equal(out, str(UTIL / gold))


@pytest.mark.parametrize("mat,go,ge", [
    ("blosum62", 13, 2), ("VTML80", 11, 1), ("PAM30", 9, 1)])
def test_align_nondefault_scoring_parity(tmp_path, mat, go, ge):
    """E-value/score parity for non-default (matrix, gap) combos: exercises
    the harvested ALP Gumbel parameter table (data/alp_params.py) against
    goldens from the reference binary running its live ALP simulation."""
    out = str(tmp_path / "aln")
    run_cmd("align", [str(GOLDEN / "qdb"), str(GOLDEN / "qdb"),
                      str(GOLDEN / "pref"), out,
                      "--sub-mat", f"{mat}.out", "--gap-open", str(go),
                      "--gap-extend", str(ge)])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / f"aln_{mat}_{go}_{ge}"))
    assert got == want


@pytest.mark.parametrize("mode,gold", [(0, "exp_aln"), (1, "exp_aln_rescore")])
def test_expandaln_parity(tmp_path, mode, gold):
    """expandaln (backtrace composition A->B->C) vs reference golden, both
    E-value-transfer and rescore-backtrace expansion modes."""
    out = str(tmp_path / "exp")
    run_cmd("expandaln", [str(GOLDEN / "qdb"), str(GOLDEN / "qdb"),
                          str(GOLDEN / "aln"), str(GOLDEN / "aln"), out,
                          "--expansion-mode", str(mode)])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / gold))
    assert got == want


def test_expandaln_filter_clusters(tmp_path):
    """--expand-filter-clusters: diversity-filter each B cluster against
    its representative before expansion (expandaln.cpp:276-315); golden
    differs from the unfiltered expansion."""
    out = str(tmp_path / "exp")
    run_cmd("expandaln", [str(GOLDEN / "qdb"), str(GOLDEN / "qdb"),
                          str(GOLDEN / "aln"), str(GOLDEN / "aln"), out,
                          "--expand-filter-clusters", "1"])
    got = entries_by_key(out)
    G2 = GOLDEN.parent / "efc"
    want = entries_by_key(str(G2 / "refefc"))
    assert got == want


def test_expand2profile_parity(tmp_path):
    out = str(tmp_path / "exprof")
    run_cmd("expand2profile", [str(GOLDEN / "qdb"), str(GOLDEN / "qdb"),
                               str(GOLDEN / "aln"), str(GOLDEN / "aln"),
                               out])
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / "exp_prof"))
    assert set(got) == set(want)
    bad = [k for k in want if got[k] != want[k]]
    assert not bad, (len(bad), bad[:5])


@pytest.mark.parametrize("args,gold", [
    (["--filter-column", "2", "--comparison-operator", "ge",
      "--comparison-value", "100"], "fdb_num"),
    (["--extract-lines", "5"], "fdb_lines"),
    (["--filter-column", "2", "--beats-first",
      "--comparison-operator", "le"], "fdb_beats"),
    (["--filter-column", "2", "--sort-entries", "1"], "fdb_sort"),
    (["--filter-column", "2", "--trim-to-one-column"], "fdb_trim"),
    (["--filter-column", "3", "--filter-regex", "^-[0-9]*$"], "fdb_regex"),
])
def test_filterdb_modes_parity(tmp_path, args, gold):
    src = "aln" if gold in ("fdb_beats", "fdb_trim") else "pref"
    out = str(tmp_path / "f")
    run_cmd("filterdb", [str(GOLDEN / src), out] + args)
    got = entries_by_key(out)
    want = entries_by_key(str(GOLDEN / gold))
    assert got == want
