"""`linclust` and `cluster` workflows.

Reference: data/workflow/linclust.sh (v1 path), cascaded_clustering.sh +
src/workflow/Linclust.cpp / Cluster.cpp parameter wiring:
  - linclust v1: kmermatcher -> hamming rescorediagonal (cov/seqid >= 0.5
    floor) -> clust (pre-cluster) -> subset reps both sides -> substitution
    rescorediagonal --filter-hits -> align -> clust -> mergeclusters
  - cluster (cascaded, cluster1): linclust redundancy pass (reduced alphabet)
    -> STEPS x [prefilter(-s 1 .. target) -> align -> clust] on shrinking rep
    sets -> mergeclusters; step 0 runs with --diag-score 0
    --comp-bias-corr 0 --min-ungapped-score 0 (Cluster.cpp:223-232)
  - auto sensitivity from --min-seq-id (Cluster.cpp:23-32), auto step count
"""

import os

import numpy as np

from ..db.reader import DBReader
from ..utils import log
from ..workflow import Workflow
from ..workflow.engine import not_exists


def _write_rep_order(clu_path, out_file):
    with open(clu_path + ".index") as f, open(out_file, "w") as o:
        for line in f:
            o.write(line.split("\t")[0] + "\n")


def linclust(par, command):
    seq_db, out_db, tmp = par.filenames[:4] if len(par.filenames) > 3 else \
        par.filenames[:3]
    wf = Workflow(tmp, par.force_reuse)

    # setLinclustWorkflowDefaults (Linclust.cpp:12-21): cov 0.8, seqid 0.9,
    # e 1e-3, mask off, no spaced k-mers, alignment mode 3
    if not par.was_set("cov_thr"):
        par.set("cov_thr", 0.8)
    if not par.was_set("min_seq_id"):
        par.set("min_seq_id", 0.9)
    if not par.was_set("alignment_mode"):
        par.set("alignment_mode", 3)
    if not par.was_set("evalue"):
        par.set("evalue", 1e-3)
    if not par.was_set("mask"):
        par.set("mask", 0)
    if not par.was_set("spaced_kmer_mode"):
        par.set("spaced_kmer_mode", 0)

    # the workflow serializes current values explicitly
    # (createParameterString), so the k-mer stage sees --kmer-per-seq 21
    # (the global default) rather than the standalone command's 20
    # our linclust implements the v1 (linclust1) module; pass the version
    # down so kmermatcher stays on the longest-center path (the v2
    # center-swapping chain belongs to the align2clust module)
    pref = wf.path("pref")
    wf.step(pref, "kmermatcher",
            [seq_db, pref, "--kmer-per-seq", par.kmer_per_seq,
             "--min-seq-id", par.min_seq_id, "-c", par.cov_thr,
             "--cov-mode", par.cov_mode, "--linclust-version", 1], par)

    # hamming pre-clustering with >= 0.5 floors (Linclust.cpp:137-144)
    resc1 = wf.path("pref_rescore1")
    wf.step(resc1, "rescorediagonal",
            [seq_db, seq_db, pref, resc1, "--rescore-mode", 0,
             "--min-seq-id", max(0.5, par.min_seq_id),
             "-c", max(0.5, par.cov_thr), "--cov-mode", par.cov_mode], par)
    pre_clust = wf.path("pre_clust")
    wf.step(pre_clust, "clust", [seq_db, resc1, pre_clust], par)

    order = wf.path("order_redundancy")
    if not os.path.exists(order):
        _write_rep_order(pre_clust, order)
    input_red = wf.path("input_step_redundancy")
    wf.step(input_red, "createsubdb", [order, seq_db, input_red], par)
    wf.step(input_red + "_h", "createsubdb",
            [order, seq_db + "_h", input_red + "_h"], par)
    pref_f1 = wf.path("pref_filter1")
    wf.step(pref_f1, "createsubdb", [order, pref, pref_f1], par)
    pref_f2 = wf.path("pref_filter2")
    wf.step(pref_f2, "filterdb",
            [pref_f1, pref_f2, "--filter-file", order], par)

    # ungapped substitution rescoring with precision filter (aa only)
    resc2 = wf.path("pref_rescore2")
    wf.step(resc2, "rescorediagonal",
            [input_red, input_red, pref_f2, resc2, "--rescore-mode", 1,
             "--filter-hits", 1, "--min-seq-id", par.min_seq_id,
             "-c", par.cov_thr, "--cov-mode", par.cov_mode,
             "-e", par.evalue], par)

    aln = wf.path("aln")
    wf.step(aln, "align",
            [input_red, input_red, resc2, aln, "--alignment-mode",
             par.alignment_mode, "-e", par.evalue, "--min-seq-id",
             par.min_seq_id, "-c", par.cov_thr, "--cov-mode",
             par.cov_mode], par)
    clust_db = wf.path("clust")
    wf.step(clust_db, "clust", [input_red, aln, clust_db], par)

    if not_exists(out_db):
        wf.step(out_db, "mergeclusters",
                [seq_db, out_db, pre_clust, clust_db], par)
    if par.remove_tmp_files:
        wf.cleanup(True)
    return 0


def _auto_sensitivity(seq_id_thr: float) -> float:
    if seq_id_thr <= 0.3:
        return 6.0
    if seq_id_thr > 0.8:
        return 1.0
    return 1.0 + (0.7 - seq_id_thr) * 10.0


def cluster(par, command):
    seq_db, out_db, tmp = par.filenames[:3]
    wf = Workflow(tmp, par.force_reuse)

    # setWorkflowDefaults (Cluster.cpp:13-20)
    if not par.was_set("cov_thr"):
        par.set("cov_thr", 0.8)
    if not par.was_set("evalue"):
        par.set("evalue", 1e-3)
    if not par.was_set("alignment_mode"):
        par.set("alignment_mode", 3)
    if not par.was_set("max_seqs"):
        par.set("max_seqs", 20)
    if not par.was_set("sensitivity"):
        par.set("sensitivity", _auto_sensitivity(par.min_seq_id))
        log.info(f"Set cluster sensitivity to -s {par.sensitivity}")
    steps = par.cluster_steps if par.was_set("cluster_steps") else (
        1 if par.sensitivity <= 2.0 else 3)
    log.info(f"Set cluster iterations to {steps}")

    if par.single_step_clustering:
        pref = wf.path("pref")
        wf.step(pref, "prefilter", [seq_db, seq_db, pref, "-s",
                                    par.sensitivity], par)
        aln = wf.path("aln")
        wf.step(aln, "align", [seq_db, seq_db, pref, aln], par)
        wf.step(out_db, "clust", [seq_db, aln, out_db], par)
        if par.remove_tmp_files:
            wf.cleanup(True)
        return 0

    # cascaded: linclust redundancy pass first. The reference serializes the
    # cluster-level values explicitly (Cluster.cpp LINCLUST_PAR), overriding
    # linclust's own defaults: --min-seq-id 0 (cluster default),
    # --spaced-kmer-mode 1, --mask 0, alph 13, k auto
    clu_red = wf.path("clu_redundancy")
    lin_tmp = wf.path("linclust")
    wf.step(clu_red, "linclust",
            [seq_db, clu_red, lin_tmp,
             "--min-seq-id", par.min_seq_id, "-c", par.cov_thr,
             "--cov-mode", par.cov_mode, "-e", par.evalue,
             "--alignment-mode", par.alignment_mode,
             "--spaced-kmer-mode", par.spaced_kmer_mode,
             "--kmer-per-seq", par.kmer_per_seq, "--mask", 0,
             "--cluster-mode", par.cluster_mode,
             "--remove-tmp-files", int(par.remove_tmp_files)], par)

    order = wf.path("order_redundancy")
    if not os.path.exists(order):
        _write_rep_order(clu_red, order)
    cur_input = wf.path("input_step_redundancy")
    wf.step(cur_input, "createsubdb", [order, seq_db, cur_input], par)
    wf.step(cur_input + "_h", "createsubdb",
            [order, seq_db + "_h", cur_input + "_h"], par)

    target_sens = par.sensitivity
    clu_steps = []
    for step in range(steps):
        if steps > 1:
            sens = 1.0 if step == 0 else \
                1.0 + (target_sens - 1.0) / (steps - 1) * step
        else:
            sens = target_sens
        pref = wf.path(f"pref_step{step}")
        common = ["-c", par.cov_thr, "--cov-mode", par.cov_mode,
                  "--max-seqs", par.max_seqs]
        aln_common = ["--alignment-mode", par.alignment_mode,
                      "-e", par.evalue, "--min-seq-id", par.min_seq_id,
                      "-c", par.cov_thr, "--cov-mode", par.cov_mode]
        extra = []
        if step == 0 and steps > 1:
            extra = ["--diag-score", 0, "--comp-bias-corr", 0,
                     "--min-ungapped-score", 0]
            aln_common += ["--comp-bias-corr", 0]
        wf.step(pref, "prefilter",
                [cur_input, cur_input, pref, "-s", round(sens, 3)]
                + common + extra, par)
        aln = wf.path(f"aln_step{step}")
        wf.step(aln, "align",
                [cur_input, cur_input, pref, aln] + aln_common, par)
        clu = wf.path(f"clu_step{step}")
        wf.step(clu, "clust", [cur_input, aln, clu], par)
        clu_steps.append(clu)
        if step < steps - 1:
            next_order = wf.path(f"order_step{step + 1}")
            if not os.path.exists(next_order):
                _write_rep_order(clu, next_order)
            next_input = wf.path(f"input_step{step + 1}")
            wf.step(next_input, "createsubdb",
                    [next_order, cur_input, next_input], par)
            wf.step(next_input + "_h", "createsubdb",
                    [next_order, cur_input + "_h", next_input + "_h"], par)
            cur_input = next_input

    if not_exists(out_db):
        wf.step(out_db, "mergeclusters",
                [seq_db, out_db, clu_red] + clu_steps, par)
    if par.remove_tmp_files:
        wf.cleanup(True)
    return 0
